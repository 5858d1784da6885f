package graft

import graft.model.Elem
import graft.operators.{Kernels, StdKernels}

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile captures stages, tasks, and shuffle volume of a stateful job") {
    val df = (for (s <- 0 until 4; i <- 0 until 1000)
      yield Elem(s.toLong, i.toLong, Array[Byte](1))).toDF()
    val (count, prof) = Profiler.profile(spark) {
      Kernels.unboundedState(df, StdKernels.TestIncrement).count()
    }
    assert(count == 4000L)
    assert(prof.numStages >= 2)             // map + reduce of the one shuffle
    assert(prof.stages.map(_.numTasks).sum > 0)
    assert(prof.totalShuffleWrite > 0)      // the groupByKey exchange
    assert(prof.totalShuffleRead > 0)
    assert(prof.render.nonEmpty)
  }

  test("halo stencil shuffles a FRACTION of the explode plan's bytes (the design claim, pinned)") {
    import org.apache.spark.sql.functions._
    import graft.operators.SequenceOps
    // a realistic (fat) payload: the explode plan's shuffle carries every
    // payload |offsets| times (map-side combine collapses rows but keeps
    // one payload column PER SLOT), while halo ships each payload once —
    // with skinny 8-byte payloads the two nearly tie, so the pin uses the
    // shape the operator exists for
    val n = 100000L
    def base = spark.range(0, n, 1, 8).select(
      (col("id") % 4).as("streamId"), expr("id div 4").as("index"),
      encode(concat(lpad(col("id").cast("string"), 96, "x")), "UTF-8").as("v"))
    def shuffled(df: org.apache.spark.sql.DataFrame): Long = {
      val (_, p) = Profiler.profile(spark) {
        df.write.format("noop").mode("overwrite").save()
      }
      p.totalShuffleWrite
    }
    val offs    = (-3 to 3).toSeq // width 7
    val halo    = shuffled(SequenceOps.stencilHalo(base, offs, "v", bucketWidth = 4096))
    val explode = shuffled(SequenceOps.stencilExplode(base, offs, "v"))
    assert(halo > 0 && explode > 0, "both plans must actually shuffle")
    assert(halo * 2 < explode,
      s"halo must shuffle well under half the explode plan's bytes (halo=$halo explode=$explode)")
  }

  test("profile isolates the block: nothing recorded for an empty body") {
    val (_, prof) = Profiler.profile(spark) { () }
    assert(prof.numStages == 0)
  }
}
