SELECT CAST(c0 AS BIGINT) AS "a",
       CAST(c1 AS BIGINT) AS "b",
       CAST(c2 AS DOUBLE) AS "jac"
FROM (VALUES
(0, 1, '1.0'),
(0, 2, '0.960159'),
(1, 2, '0.960159')
) t(c0, c1, c2)