package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{Dedup, Similarity}

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c d e f g"), (2L, "x y a b c d e z"),
    (3L, "p q r s t"), (4L, "p q r s t u v w"))
    .toDF("doc_id", "text")

  test("library-op caches are registered and releasable; double pipeline run stays bounded") {
    CacheScope.release() // clean slate (other suites share the session)
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.keySet

    // the full dedup pipeline TWICE without any manual clearCache():
    // stats + removal + LSH pairs each persist internal relations
    (1 to 2).foreach { _ =>
      Dedup.duplicatedWindowStats(corpus, "doc_id", "text", 5).count()
      Dedup.removeDuplicatedWindows(corpus, "doc_id", "text", 5).count()
      Dedup.lshCandidatePairs(corpus, "doc_id", "text", 8, 4).count()
    }
    assert(CacheScope.liveCount > 0, "ops should have registered their caches")

    CacheScope.release()
    assert(CacheScope.liveCount == 0)
    // every graft-registered cache is gone from the executor store too
    val leaked = sc.getPersistentRDDs.keySet.diff(baseline)
    assert(leaked.isEmpty, s"unreleased cached RDDs: $leaked")
  }

  test("release() never touches caller-owned persisted data") {
    val mine = Seq((1L, "keep me")).toDF("id", "t").persist(StorageLevel.MEMORY_ONLY)
    mine.count()
    Similarity.kmeansCentroidVectors(
      Seq((0L, Seq(0f, 0f)), (1L, Seq(4f, 4f))).toDF("id", "v"),
      "id", "v", k = 2, iters = 1).count()
    CacheScope.release()
    assert(mine.storageLevel != StorageLevel.NONE,
      "caller-owned cache must survive CacheScope.release()")
    assert(mine.filter(col("t") === "keep me").count() == 1)
    mine.unpersist()
  }
}
