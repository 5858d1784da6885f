package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All are expression + shuffle plans (no
  * driver materialization, no UDFs):
  *
  *  - exact:      one hash aggregation on the fingerprint
  *  - minhash:    narrow per-row signature (array expr), then one
  *                band-key self-join — the classic shingle→minhash→band→
  *                bucket-join pipeline; at 100 TB the band join is the only
  *                shuffle and AQE handles bucket skew
  *  - simhash:    narrow per-row 16-bit signature; near-dup = same signature
  *  - jaccard:    candidate generation by cheap bucket key, then exact
  *                set-overlap on candidates only (never all-pairs)
  *
  * Hash choice: md5 (deterministic, available in every engine) — minhash
  * slot k uses md5("k|" + shingle); min over the hex strings is a uniform
  * min-hash. This keeps signatures reproducible across engines for the
  * correctness oracle.
  */
object Dedup {

  /** exact duplicate groups by normalized-text fingerprint */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep"))

  /** MinHash signature slot: min over shingles of md5(slot + "|" + shingle) */
  def minhashSlot(shinglesCol: Column, slot: Int): Column =
    array_min(transform(shinglesCol, s => md5(concat(lit(s"$slot|"), s))))

  /** (id, shingle-array) with tokens/shingles materialized as real columns:
    * CollapseProject keeps a non-cheap producer referenced more than once as
    * its own projection, so the token split runs once per row no matter how
    * many slot expressions consume it.
    */
  private def withShingles(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), TextFunctions.shinglesFromTokens(col("__toks"), 2).as("__sh"))

  /** long-format MinHash signatures: (id, slot, mh), k slots per doc */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val sig = array((0 until k).map(i =>
      struct(lit(i.toLong).as("slot"), minhashSlot(col("__sh"), i).as("mh"))): _*)
    withShingles(docs, idCol, textCol)
      .select(col(idCol), explode(sig).as("s"))
      .select(col(idCol), col("s.slot").as("slot"), col("s.mh").as("mh"))
  }

  /** LSH candidate pairs: docs sharing any band (band = `rows` consecutive
    * signature slots hashed together). Returns distinct (a, b), a < b.
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, rows: Int): DataFrame = {
    require(k % rows == 0, "slots must divide into equal bands")
    val slots = array((0 until k).map(minhashSlot(col("__sh"), _)): _*)
    val bands = (0 until k / rows).map { b =>
      struct(lit(b).as("band"),
        md5(array_join(slice(col("__slots"), b * rows + 1, rows), "")).as("bk"))
    }
    val keyed = withShingles(docs, idCol, textCol)
      .select(col(idCol), slots.as("__slots"))
      .select(col(idCol).as("id"), explode(array(bands: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    val l = keyed.select(col("band"), col("bk"), col("id").as("a"))
    val r = keyed.select(col("band"), col("bk"), col("id").as("b"))
    l.join(r, Seq("band", "bk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** 16-bit SimHash over whitespace tokens. Bit j of the signature is the
    * sign of the sum over tokens of (2*bit_j(md5(token)) - 1), where
    * bit_j comes from the first 4 hex chars of the token's md5
    * (nibble j/4, bit 3 - j%4). Near-dups share the signature (or differ
    * in <= d bits — compare via xor popcount downstream).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hexDigits = "0123456789abcdef"
    val exploded = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(col(idCol), md5(col("t")).as("m"))
    val nibbles = (0 until 4).map(q =>
      (instr(lit(hexDigits), col("m").substr(lit(q + 1), lit(1))) - 1).cast("int").as(s"n$q"))
    val withN = exploded.select(col(idCol) +: nibbles: _*)
    val sums = (0 until 16).map { j =>
      val bit = (shiftright(col(s"n${j / 4}"), 3 - j % 4) % 2).cast("long")
      sum(bit * 2 - 1).as(s"s$j")
    }
    val agg = withN.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val sig = (0 until 16).map(j =>
      when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    agg.select(col(idCol), sig.cast("long").as("simhash"))
  }

  /** Exact n-gram Jaccard on candidate pairs. Candidates = docs sharing the
    * cheap bucket key (default: first two tokens) — a scalable prefilter
    * standing in for the LSH pass when shingle sets are small. Returns
    * (a, b, inter, uni, jac).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = docs.withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 2)
      .select(
        col(idCol).as("id"),
        concat_ws(" ", element_at(col("__toks"), 1), element_at(col("__toks"), 2)).as("bucket"),
        array_distinct(TextFunctions.shinglesFromTokens(col("__toks"), 2)).as("sh"))
    val l = keyed.select(col("bucket"), col("id").as("a"), col("sh").as("sha"))
    val r = keyed.select(col("bucket"), col("id").as("b"), col("sh").as("shb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"),
        size(array_union(col("sha"), col("shb"))).cast("long").as("uni"))
      .withColumn("jac", col("inter").cast("double") / col("uni").cast("double"))
  }
}
