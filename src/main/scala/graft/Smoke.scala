package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Elem
import graft.operators.{Kernels, SequenceOps, StdKernels}
import graft.operators.SequenceOps.Partitioner

/** End-to-end smoke driver: exercises the public operator API against the
  * driver-generated testdata (events as a single dense stream, synthetic
  * frames for the media kernels). Run:
  *   sbt "runMain graft.Smoke /root/testdata/sf0.001"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("4", "graft-smoke")
    import spark.implicits._

    // events table as one dense stream: index = event_id (dense 0..N-1)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val stream = events.select(
      lit(0L).as("streamId"),
      col("event_id").as("index"),
      encode(col("event_type"), "UTF-8").as("payload"))

    println(s"== input rows: ${stream.count()}")
    println(s"== stride(8) rows: ${SequenceOps.stride(stream, 8).count()}")
    println(s"== range(0,30) rows: ${SequenceOps.range(stream, 0, 30).count()}")
    val g = SequenceOps.gather(stream, Seq(0L, 150L, 377L, 500L))
      .orderBy("index")
      .collect()
      .map(r => new String(r.getAs[Array[Byte]]("payload")))
    println(s"== gather[0,150,377,500]: ${g.mkString(",")}")

    val st = SequenceOps.stencil(SequenceOps.range(stream, 0, 5), Seq(-1, 0, 1), "payload")
      .orderBy("index")
      .collect()
      .map(r => r.getSeq[Array[Byte]](r.fieldIndex("window")).map(new String(_)).mkString("|"))
    println(s"== stencil[-1,0,1] over first 5: ${st.mkString("  ")}")

    val sliced  = SequenceOps.slice(stream, Partitioner.All(250))
    val counted = Kernels.unboundedState(sliced, StdKernels.TestIncrement, sliced = true)
    val top = SequenceOps.unslice(counted)
      .orderBy("index")
      .limit(3)
      .collect()
      .map(r => StdKernels.decodeI64(r.getAs[Array[Byte]]("payload")))
    println(s"== slice(250)+unboundedCounter+unslice head: ${top.mkString(",")}")

    val frames = (0 until 8).map(i => StdKernels.syntheticFrame(0, i, 32, 32, 3)).toDS()
    val hist   = StdKernels.histogramOp(frames).collect()
    println(s"== histogram frames: ${hist.length}, payload bytes: ${hist.head.payload.length}")
    val png = StdKernels.encodePng(StdKernels.syntheticFrame(0, 0, 32, 32, 3))
    println(s"== png bytes: ${png.length} header ok: ${png(1) == 'P' && png(2) == 'N'}")

    spark.stop()
  }
}
