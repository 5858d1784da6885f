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

  test("profile isolates the block: nothing recorded for an empty body") {
    val (_, prof) = Profiler.profile(spark) { () }
    assert(prof.numStages == 0)
  }
}
