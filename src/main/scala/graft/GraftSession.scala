package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: one place for the configs every entry point
  * (Verify, Bench, Smoke, tests) must share.
  *
  * - `nanosAsLong`: the driver-generated `events.parquet` stores
  *   TIMESTAMP(NANOS), which Spark 4 rejects unless read as long (nanos).
  * - shuffle partitions sized to local cores (not the 200 default), AQE on
  *   so the 100 TB plan shape (skew-join, partition coalescing) is what we
  *   test locally.
  */
object GraftSession {
  /** `maxTaskFailures > 1` enables task retries in local mode
    * (`local[N,F]`), matching cluster behavior where a task attempt can
    * fail and be re-run — required by the fault-tolerance specs.
    */
  def local(cores: String, appName: String = "graft", maxTaskFailures: Int = 1): SparkSession = {
    val master =
      if (maxTaskFailures > 1) s"local[$cores,$maxTaskFailures]" else s"local[$cores]"
    val s = SparkSession.builder()
      .master(master)
      .withExtensions(graft.plans.GraftExtensions)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** REAL multi-executor session: `local-cluster[workers, cores, memMb]`
    * spawns separate executor JVMs (Spark's standalone master/worker in
    * miniature), so closure/kernel serialization, broadcasts, shuffle
    * files, and block fetches all cross process boundaries exactly as on
    * a cluster — the execution-model evidence `local[N]` cannot give.
    * The executor classpath mirrors the driver's (same machine), which is
    * how our compiled classes reach the worker JVMs without packaging a
    * jar per run.
    */
  def localCluster(workers: Int, cores: Int, memMb: Int,
      appName: String = "graft-cluster"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local-cluster[$workers,$cores,$memMb]")
      .withExtensions(graft.plans.GraftExtensions)
      .appName(appName)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", (workers * cores).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Nanosecond-long → microsecond timestamp, for tables read with
    * nanosAsLong (events.ts).
    */
  def nanosToTimestamp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    timestamp_micros((c / 1000L).cast("long"))
  }
}
