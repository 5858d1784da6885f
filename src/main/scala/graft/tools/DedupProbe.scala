package graft.tools

import org.apache.spark.sql.DataFrame
import graft.GraftSession
import graft.functions.Dedup

/** throwaway stage-decomposition probe for the MinHash pipeline timings */
object DedupProbe {
  private def mat(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "dedup-probe")
    val dir = "/root/testdata/sf0.1"
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.functions._
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "scan" -> (() => docs),
      "tokens" -> (() => docs.select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))),
      "shingles" -> (() => docs.select(col("doc_id"), graft.functions.TextFunctions.shingles(col("text"), 2).as("sh"))),
      "sig4" -> (() => Dedup.minhashSignatures(docs, "doc_id", "text", 4)),
      "sig8" -> (() => Dedup.minhashSignatures(docs, "doc_id", "text", 8)),
      "lsh" -> (() => Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4)),
      "jac" -> (() => Dedup.ngramJaccardPairs(docs, "doc_id", "text")))
    stages.foreach { case (name, fn) =>
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        mat(fn())
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-9s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
