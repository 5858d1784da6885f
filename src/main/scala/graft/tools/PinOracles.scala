package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.{GraftSession, SparkEntry}
import graft.queries.PinnedOracles

/** Generator for the pinned VALUES-literal oracles of the generated-input
  * modality queries (video/image/audio/captions/jdbc).
  *
  * Those queries synthesize their own deterministic inputs (no shared
  * parquet table exists for the DuckDB oracle to read), so their oracle is
  * a regression pin: run the query once, freeze the result as a DuckDB
  * `VALUES` literal — the `seq_bounded_state` pattern — and the driver's
  * gate then checks rows+schema+hash instead of rows-only, making any
  * hash-regression in the decode/kernel pipelines visible.
  *
  * Doubles are written with Java's shortest round-trip representation,
  * QUOTED, so the outer CAST parses string->double (correctly rounded —
  * recovers the identical bits). A bare decimal literal would type the
  * VALUES column as DECIMAL(w,s) and DuckDB's decimal->double conversion
  * (int scaling + FP divide) double-rounds near-tie values: measured 9 of
  * 598 video_flow rows off by 1 ulp against the engine's exact output.
  *
  * Run after changing any pinned pipeline:
  * {{{ sbt "runMain graft.tools.PinOracles" }}}
  * then commit the regenerated .sql files under
  * `src/main/resources/graft/pinned`.
  */
object PinOracles {

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args.headOption.getOrElse("src/main/resources/graft/pinned"))
    Files.createDirectories(outDir)
    val spark = GraftSession.local("8", "graft-pin-oracles")
    try PinnedOracles.names.foreach { name =>
      val sf  = PinnedOracles.pinSf.getOrElse(name, "/root/testdata/sf0.001")
      val df  = SparkEntry.queries(name)(spark, sf)
      val sql = valuesSql(df)
      Files.write(outDir.resolve(s"$name.sql"), sql.getBytes(UTF_8))
      println(s"[pin] $name: ${sql.count(_ == '\n') + 1} lines")
      spark.catalog.clearCache()
    } finally spark.stop()
  }

  private def duckType(t: DataType): String = t match {
    case LongType    => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType   => "SMALLINT"
    case DoubleType  => "DOUBLE"
    case FloatType   => "REAL"
    case StringType  => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case other => sys.error(s"no pinned-oracle mapping for ${other.simpleString}")
  }

  private def literal(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    // ALL floating-point values quoted (not just NaN/Infinity, whose bare
    // tokens don't parse at all): the surrounding CAST(... AS DOUBLE/REAL)
    // then string-parses — correctly rounded — instead of routing the
    // value through a lossy DECIMAL VALUES column (see scaladoc)
    case d: Double => s"'$d'"
    case f: Float  => s"'$f'"
    case b: Boolean => b.toString.toUpperCase
    case n => n.toString
  }

  /** the whole result as `SELECT casts FROM (VALUES ...) t(c0..cN)` */
  def valuesSql(df: DataFrame): String = {
    val fields = df.schema.fields
    val rows = df.collect().map(r =>
      (0 until fields.length).map(i => literal(r.get(i))).mkString("(", ", ", ")"))
    require(rows.nonEmpty, "refusing to pin an empty result")
    val cols = fields.indices.map(i => s"c$i").mkString(", ")
    val casts = fields.zipWithIndex.map { case (f, i) =>
      s"""CAST(c$i AS ${duckType(f.dataType)}) AS "${f.name}""""
    }.mkString(",\n       ")
    s"""SELECT $casts
       |FROM (VALUES
       |${rows.mkString(",\n")}
       |) t($cols)""".stripMargin
  }
}
