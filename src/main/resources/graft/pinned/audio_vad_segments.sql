SELECT CAST(c0 AS BIGINT) AS "streamId",
       CAST(c1 AS BIGINT) AS "seg_start",
       CAST(c2 AS BIGINT) AS "seg_end",
       CAST(c3 AS BIGINT) AS "n_chunks"
FROM (VALUES
(0, 5, 9, 5),
(0, 15, 19, 5),
(0, 25, 29, 5),
(0, 35, 39, 5),
(0, 45, 49, 5),
(0, 55, 59, 5),
(1, 2, 6, 5),
(1, 12, 16, 5),
(1, 22, 26, 5),
(1, 32, 36, 5),
(1, 42, 46, 5),
(1, 52, 56, 5)
) t(c0, c1, c2, c3)