package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession

/** Ad-hoc repeat-timer for the bt_ BASELINE-target rows: times each query
  * `reps` times in one session so plan-compile (first run) and steady-state
  * cost are visible separately — Bench times cold single-shots, which at
  * sub-second scale are dominated by codegen/scheduling noise.
  *
  * {{{ sbt "runMain graft.tools.MicroBench [reps]" }}}
  */
object MicroBench {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val reps  = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-micro")
    def elems1m(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.functions._
      s.range(0, 1000000, 1, 32).select(
        (col("id") % 8).as("streamId"),
        (col("id") / 8).cast("long").as("index"),
        encode(conv(col("id").cast("string"), 10, 16), "UTF-8").as("payload"))
    }
    def stencilBase(s: SparkSession, n: Long): DataFrame = {
      import org.apache.spark.sql.functions._
      s.range(0, n, 1, 32).select((col("id") % 8).as("streamId"),
        expr("id div 8").as("index"), (col("id") * 37 % 1000).as("v"))
    }
    val wide = (-7 to 7).toSeq
    val targets: Seq[(String, SparkSession => DataFrame)] = Seq(
      "scan"   -> (s => elems1m(s)),
      "w7_explode3m" -> (s =>
        graft.operators.SequenceOps.stencilExplode(stencilBase(s, 3000000), (-3 to 3).toSeq, "v")),
      "w7_halo3m" -> (s =>
        graft.operators.SequenceOps.stencilHalo(stencilBase(s, 3000000), (-3 to 3).toSeq, "v")),
      "w15_halo3m" -> (s =>
        graft.operators.SequenceOps.stencilHalo(stencilBase(s, 3000000), wide, "v")),
      "w3_explode3m" -> (s =>
        graft.operators.SequenceOps.stencilExplode(stencilBase(s, 3000000), Seq(-1, 0, 1), "v")),
      "w3_halo3m" -> (s =>
        graft.operators.SequenceOps.stencilHalo(stencilBase(s, 3000000), Seq(-1, 0, 1), "v")),
      "stencil10m" -> (s => {
        import org.apache.spark.sql.functions._
        val base = s.range(0, 10000000, 1, 32).select((col("id") % 8).as("streamId"), expr("id div 8").as("index"), (col("id") * 37 % 1000).as("v"))
        graft.operators.SequenceOps.stencil(base, Seq(-1, 0, 1), "v").select(col("streamId"), col("index"), aggregate(col("window"), lit(0L), (acc, x) => acc + x).as("wsum"))
      }),
      "stride" -> (s => graft.operators.SequenceOps.stride(elems1m(s), 8)),
      "gather" -> (s => graft.operators.SequenceOps.gather(elems1m(s),
        (0L until 1000L).map(_ * 97))))
    targets.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        materialize(fn(spark))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] $name%-8s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
