package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextFunctions => TF}

/** Text-analysis + deduplication queries over `documents` — the
  * training-data-pipeline extensions (BASELINE.json north star), each with
  * a DuckDB oracle. Tokenization is the shared whitespace split; hashes are
  * md5 so both engines compute identical signatures.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  val STOPWORDS = Seq("the", "a", "of", "to", "and")

  /** marker-token sets for the language-ID heuristic (drawn from the corpus
    * vocabulary; the synthetic `lang` column is random noise, so the oracle
    * checks determinism of the heuristic, not label recovery)
    */
  val LANG_MARKERS: Map[String, Seq[String]] = Map(
    "de" -> Seq("customer", "hash", "row"),
    "en" -> Seq("the", "order", "group"),
    "es" -> Seq("slow", "agg", "merge"),
    "fr" -> Seq("scan", "data", "query"),
    "zh" -> Seq("join", "small", "column"))

  private val tokSql = """regexp_split_to_array(trim(text), '\s+')"""
  private val shSql =
    s"""list_transform(generate_series(1, len($tokSql)-1),
       |      i -> $tokSql[i] || ' ' || $tokSql[i+1])""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_stats" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.charCount(col("text")).as("n_chars"),
        TF.nonSpaceCount(col("text")).as("n_nonspace"),
        TF.stopwordCount(col("text"), STOPWORDS).as("n_stop"),
        TF.punctCount(col("text")).as("n_punct"))
        .orderBy("doc_id")),

    "txt_langid" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TF.langId(col("text"), LANG_MARKERS).as("lang_guess"))
        .orderBy("doc_id")),

    "txt_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    "txt_rollhash" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TF.rollingHash(col("text")).as("rh"))
        .orderBy("doc_id")),

    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir), "doc_id", "text").orderBy("fp")),

    "dedup_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(docs(s, dir), "doc_id", "text", 4)
        .orderBy("doc_id", "slot")),

    "dedup_lsh_pairs" -> ((s, dir) =>
      Dedup.lshCandidatePairs(docs(s, dir), "doc_id", "text", 8, 4)
        .orderBy("a", "b")),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir), "doc_id", "text").orderBy("doc_id")),

    "dedup_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text").orderBy("a", "b"))
  )

  private val simhashSums = (0 until 16).map { j =>
    val q = j / 4
    val d = 1 << (3 - j % 4)
    s"SUM(((n$q // $d) % 2)*2 - 1) AS s$j"
  }.mkString(",\n    ")

  private val simhashBits = (0 until 16).map { j =>
    s"(CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END)"
  }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "txt_stats" ->
      s"""SELECT doc_id,
         |  CAST(len($tokSql) AS BIGINT) AS n_tokens,
         |  CAST(len(text) AS BIGINT) AS n_chars,
         |  CAST(len(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS n_nonspace,
         |  CAST(len(list_filter($tokSql,
         |       t -> t IN ('the','a','of','to','and'))) AS BIGINT) AS n_stop,
         |  CAST(len(text) - len(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS BIGINT) AS n_punct
         |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_langid" ->
      s"""WITH s AS (SELECT doc_id,
         |    len(list_filter($tokSql, t -> t IN ('customer','hash','row'))) AS s_de,
         |    len(list_filter($tokSql, t -> t IN ('the','order','group'))) AS s_en,
         |    len(list_filter($tokSql, t -> t IN ('slow','agg','merge'))) AS s_es,
         |    len(list_filter($tokSql, t -> t IN ('scan','data','query'))) AS s_fr,
         |    len(list_filter($tokSql, t -> t IN ('join','small','column'))) AS s_zh
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN s_de = m THEN 'de' WHEN s_en = m THEN 'en' WHEN s_es = m THEN 'es'
         |       WHEN s_fr = m THEN 'fr' ELSE 'zh' END AS lang_guess
         |FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS m FROM s)
         |ORDER BY doc_id""".stripMargin,

    "txt_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_rollhash" ->
      """SELECT doc_id,
        |  CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
        |    list_transform(generate_series(1, len(text)), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS rh
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp, COUNT(*) AS n, MIN(doc_id) AS keep
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "dedup_minhash_sig" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest($shSql) AS s
         |  FROM documents WHERE len($tokSql) >= 2)
         |SELECT doc_id, CAST(k AS BIGINT) AS slot, MIN(md5(CAST(k AS VARCHAR) || '|' || s)) AS mh
         |FROM sh, (SELECT unnest([0,1,2,3]) AS k)
         |GROUP BY doc_id, k ORDER BY doc_id, slot""".stripMargin,

    "dedup_lsh_pairs" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest($shSql) AS s
         |  FROM documents WHERE len($tokSql) >= 2),
         |sig AS (
         |  SELECT doc_id, k, MIN(md5(CAST(k AS VARCHAR) || '|' || s)) AS mh
         |  FROM sh, (SELECT unnest([0,1,2,3,4,5,6,7]) AS k)
         |  GROUP BY doc_id, k),
         |p AS (
         |  SELECT doc_id,
         |    md5(MAX(CASE WHEN k=0 THEN mh END) || MAX(CASE WHEN k=1 THEN mh END)
         |     || MAX(CASE WHEN k=2 THEN mh END) || MAX(CASE WHEN k=3 THEN mh END)) AS bk0,
         |    md5(MAX(CASE WHEN k=4 THEN mh END) || MAX(CASE WHEN k=5 THEN mh END)
         |     || MAX(CASE WHEN k=6 THEN mh END) || MAX(CASE WHEN k=7 THEN mh END)) AS bk1
         |  FROM sig GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band, bk0 AS bk FROM p
         |  UNION ALL SELECT doc_id, 1, bk1 FROM p)
         |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id
         |ORDER BY a, b""".stripMargin,

    "dedup_simhash" ->
      s"""WITH tk AS (
         |  SELECT doc_id, md5(unnest($tokSql)) AS m FROM documents),
         |n AS (SELECT doc_id,
         |    strpos('0123456789abcdef', substr(m, 1, 1)) - 1 AS n0,
         |    strpos('0123456789abcdef', substr(m, 2, 1)) - 1 AS n1,
         |    strpos('0123456789abcdef', substr(m, 3, 1)) - 1 AS n2,
         |    strpos('0123456789abcdef', substr(m, 4, 1)) - 1 AS n3
         |  FROM tk),
         |g AS (SELECT doc_id,
         |    $simhashSums
         |  FROM n GROUP BY doc_id)
         |SELECT doc_id, CAST($simhashBits AS BIGINT) AS simhash
         |FROM g ORDER BY doc_id""".stripMargin,

    "dedup_jaccard" ->
      s"""WITH t AS (
         |  SELECT doc_id, $tokSql AS toks, list_distinct($shSql) AS sh
         |  FROM documents WHERE len($tokSql) >= 2),
         |k AS (SELECT doc_id, toks[1] || ' ' || toks[2] AS bucket, sh FROM t)
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |  CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
         |  CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS BIGINT) AS uni,
         |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(x.sh, y.sh))) AS jac
         |FROM k x JOIN k y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
         |ORDER BY a, b""".stripMargin
  )
}
