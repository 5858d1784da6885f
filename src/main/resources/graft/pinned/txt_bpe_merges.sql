SELECT CAST(c0 AS BIGINT) AS "rank",
       CAST(c1 AS VARCHAR) AS "left",
       CAST(c2 AS VARCHAR) AS "right",
       CAST(c3 AS BIGINT) AS "cnt"
FROM (VALUES
(1, 'e', 'r', 4568),
(2, 'i', 'n', 2760),
(3, 'o', 'w', 2747),
(4, 'o', 'r', 2696),
(5, 's', 't', 2676),
(6, 'm', 'er', 1852),
(7, 'a', 't', 1845),
(8, 'l', 'u', 1831)
) t(c0, c1, c2, c3)