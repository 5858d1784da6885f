package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver's BENCH_r{N}.json.
  *
  * - Results are fully materialized through the noop sink: `count()` would
  *   let Catalyst prune the projection, timing the scan instead of the
  *   operator under test.
  * - A warmup pass touches every input table, the write path, and the video
  *   ingest (so session/classloader/codegen startup and one-time ingest
  *   aren't attributed to whichever query runs first).
  * - A query that throws is reported with time -1 and listed in "failed" —
  *   never as a fast success.
  */
object Bench {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus, "graft-bench")

    val tables = Seq("lineitem", "orders", "customer", "nation", "region",
      "supplier", "part", "events", "documents", "embeddings")
    tables.foreach { t =>
      try materialize(spark.read.parquet(s"$sfDir/$t.parquet").limit(1000))
      catch { case _: Throwable => () }
    }
    try queries.VideoQueries.warmup(spark)
    catch { case e: Throwable => System.err.println(s"warmup(video) failed: $e") }

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { materialize(fn(spark, sfDir)); true }
        catch { case e: Throwable => System.err.println(s"bench query $name failed: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
