SELECT CAST(c0 AS BIGINT) AS "stream",
       CAST(c1 AS BIGINT) AS "n_frames",
       CAST(c2 AS BIGINT) AS "n_keyframes",
       CAST(c3 AS BIGINT) AS "total_bytes",
       CAST(c4 AS INTEGER) AS "max_slices",
       CAST(c5 AS DOUBLE) AS "mean_au_bytes"
FROM (VALUES
(0, 15, 3, 731, 2, '48.73'),
(1, 6, 2, 227, 1, '37.83')
) t(c0, c1, c2, c3, c4, c5)