SELECT CAST(c0 AS BIGINT) AS "streamId",
       CAST(c1 AS INTEGER) AS "grid_h",
       CAST(c2 AS INTEGER) AS "grid_w",
       CAST(c3 AS VARCHAR) AS "png_md5"
FROM (VALUES
(0, 24, 24, '03ad881ee3caad556ea71586907081d5'),
(1, 24, 24, 'b75f50dd5755fbc17589aaabe0cb0bda')
) t(c0, c1, c2, c3)