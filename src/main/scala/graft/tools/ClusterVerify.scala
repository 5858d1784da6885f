package graft.tools

import graft.{GraftSession, SparkEntry, Verify}

/** The full driver-contract dump under REAL multi-executor execution:
  * `local-cluster[2, 8, 2048]` runs two separate executor JVMs, so every
  * query's closures, custom expressions, Aggregators, codec classes, and
  * broadcasts serialize across process boundaries — the distributed-
  * execution evidence plain `local[N]` cannot provide. Gate the output
  * with `tools/check_oracle.py`, exactly like the local Verify dump:
  *
  * {{{ sbt "runMain graft.tools.ClusterVerify <sfDir> <outDir> [q ...]" }}}
  */
object ClusterVerify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ClusterVerify <sfDir> <outDir> [query ...]")
    val sfDir  = args(0)
    val outDir = args(1)
    val names  = if (args.length > 2) args.drop(2).toSeq
                 else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.localCluster(workers = 2, cores = 8, memMb = 2048)
    try Verify.dump(spark, sfDir, outDir, names)
    finally spark.stop()
  }
}
