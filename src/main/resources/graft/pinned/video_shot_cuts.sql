SELECT CAST(c0 AS BIGINT) AS "streamId",
       CAST(c1 AS BIGINT) AS "index",
       CAST(c2 AS BIGINT) AS "dist"
FROM (VALUES
(0, 100, 1174),
(0, 200, 1264),
(1, 100, 1112),
(1, 200, 1234)
) t(c0, c1, c2)