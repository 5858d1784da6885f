SELECT CAST(c0 AS BIGINT) AS "streamId",
       CAST(c1 AS BIGINT) AS "index",
       CAST(c2 AS INTEGER) AS "height",
       CAST(c3 AS INTEGER) AS "width",
       CAST(c4 AS VARCHAR) AS "frame_md5"
FROM (VALUES
(0, 3, 16, 24, 'c16afa7489176395e6bde2d46a0050ec'),
(0, 77, 16, 24, 'd927d28495b4b7768536516b5721d812'),
(0, 150, 16, 24, 'c5332a41e5d124f7bbde237eca7cea8c'),
(0, 299, 16, 24, '66833406e7ee2aa7d567106b8c554af6')
) t(c0, c1, c2, c3, c4)