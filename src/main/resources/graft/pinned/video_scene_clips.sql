SELECT CAST(c0 AS BIGINT) AS "streamId",
       CAST(c1 AS BIGINT) AS "clip",
       CAST(c2 AS BIGINT) AS "start_index",
       CAST(c3 AS BIGINT) AS "end_index",
       CAST(c4 AS BIGINT) AS "n_frames"
FROM (VALUES
(0, 0, 0, 99, 100),
(0, 1, 100, 199, 100),
(0, 2, 200, 299, 100),
(1, 0, 0, 99, 100),
(1, 1, 100, 199, 100),
(1, 2, 200, 299, 100)
) t(c0, c1, c2, c3, c4)