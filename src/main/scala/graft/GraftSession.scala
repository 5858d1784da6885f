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
  def local(cores: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
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

  /** Nanosecond-long → microsecond timestamp, for tables read with
    * nanosAsLong (events.ts).
    */
  def nanosToTimestamp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    timestamp_micros((c / 1000L).cast("long"))
  }
}
