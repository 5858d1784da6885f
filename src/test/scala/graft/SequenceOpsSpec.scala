package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{Boundary, Elem}
import graft.operators.SequenceOps
import graft.operators.SequenceOps.Partitioner

/** Ports of the reference sampler tests (`tests/py_test.py:274-375`) and
  * sampler math (`scanner/engine/sampler.cpp`) to the Spark rebuild —
  * expected counts/values are engine-independent (FIXTURES.md §3).
  */
class SequenceOpsSpec extends SparkSpec {
  import spark.implicits._

  /** FIXTURES.md §4: elems(n) fixture — payload = index as string bytes. */
  def elems(n: Int, streams: Int = 1): DataFrame =
    (for (s <- 0 until streams; i <- 0 until n)
      yield Elem(s.toLong, i.toLong, i.toString.getBytes)).toDF()

  private def idxPay(df: DataFrame): Seq[(Long, String)] =
    df.orderBy("streamId", "index")
      .collect()
      .map(r => (r.getAs[Long]("index"), new String(r.getAs[Array[Byte]]("payload"))))
      .toSeq

  val N = 600

  test("stride 8 keeps ceil(N/8) densely re-indexed rows (py_test.py:285-287)") {
    val out = idxPay(SequenceOps.stride(elems(N), 8))
    assert(out.size == (N + 7) / 8)
    assert(out.map(_._1) == (0L until out.size.toLong))
    assert(out.forall { case (i, p) => p.toLong == i * 8 })
  }

  test("range(0,30) keeps 30 rows (py_test.py:289)") {
    val out = idxPay(SequenceOps.range(elems(N), 0, 30))
    assert(out.size == 30)
    assert(out.map(_._1) == (0L until 30L))
  }

  test("range(200,260) re-bases to dense 0..59") {
    val out = idxPay(SequenceOps.range(elems(N), 200, 260))
    assert(out.size == 60)
    assert(out.map(_._1) == (0L until 60L))
    assert(out.forall { case (i, p) => p.toLong == i + 200 })
  }

  test("stridedRange(0,300,10) keeps 30 rows (py_test.py:291-295)") {
    val out = idxPay(SequenceOps.stridedRange(elems(N), 0, 300, 10))
    assert(out.size == 30)
    assert(out.forall { case (i, p) => p.toLong == i * 10 })
  }

  test("stridedRanges concatenates intervals with dense cross-interval index (sampler.cpp:140-264)") {
    // [0,10) stride 3 -> src 0,3,6,9 ; [100,107) stride 3 -> src 100,103,106
    val out = idxPay(SequenceOps.stridedRanges(elems(N), Seq((0L, 10L), (100L, 107L)), 3))
    assert(out.map(_._1) == (0L until 7L))
    assert(out.map(_._2.toLong) == Seq(0L, 3L, 6L, 9L, 100L, 103L, 106L))
  }

  test("stridedRanges duplicates rows covered by overlapping intervals (sampler.cpp get_upstream_rows)") {
    // [0,10) stride 2 -> src 0,2,4,6,8 at out 0..4 ;
    // [4,12) stride 2 -> src 4,6,8,10 at out 5..8 — 4,6,8 appear twice
    val out = idxPay(SequenceOps.stridedRanges(elems(N), Seq((0L, 10L), (4L, 12L)), 2))
    assert(out.map(_._1) == (0L until 9L))
    assert(out.map(_._2.toLong) == Seq(0L, 2L, 4L, 6L, 8L, 4L, 6L, 8L, 10L))
  }

  test("stridedRangePerStream binds per-stream sampling args (client.py:1434-1527)") {
    val out = SequenceOps.stridedRangePerStream(elems(40, streams = 3),
      Map(0L -> ((0L, 40L, 4L)), 1L -> ((10L, 20L, 5L)))) // stream 2 unbound -> dropped
      .orderBy("streamId", "index").collect()
      .map(r => (r.getAs[Long]("streamId"), r.getAs[Long]("index"),
        new String(r.getAs[Array[Byte]]("payload")).toLong))
    assert(out.count(_._1 == 0L) == 10)
    assert(out.count(_._1 == 1L) == 2)
    assert(out.count(_._1 == 2L) == 0)
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 10L), (1L, 1L, 15L)))
  }

  test("asofJoin attaches latest right row at-or-before each left index, per stream") {
    val left = elems(10, streams = 2).withColumnRenamed("payload", "lp")
    val right = (for ((s, i, v) <- Seq((0L, 0L, "a"), (0L, 4L, "b"), (1L, 3L, "c")))
      yield (s, i, v)).toDF("streamId", "index", "rv")
    val out = SequenceOps.asofJoin(left, right)
      .orderBy("streamId", "index").collect()
      .map(r => (r.getAs[Long]("streamId"), r.getAs[Long]("index"), r.getAs[String]("rv")))
    // stream 0: idx 0..3 -> "a", 4..9 -> "b"; stream 1: idx 0..2 -> null, 3.. -> "c"
    assert(out.filter(_._1 == 0L).map(_._3).toSeq ==
      Seq.fill(4)("a") ++ Seq.fill(6)("b"))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq ==
      Seq.fill(3)(null) ++ Seq.fill(7)("c"))
  }

  test("asofJoinForward attaches earliest right row at-or-after each left index") {
    val left = elems(10, streams = 2).withColumnRenamed("payload", "lp")
    val right = (for ((s, i, v) <- Seq((0L, 0L, "a"), (0L, 4L, "b"), (1L, 3L, "c")))
      yield (s, i, v)).toDF("streamId", "index", "rv")
    val out = SequenceOps.asofJoinForward(left, right)
      .orderBy("streamId", "index").collect()
      .map(r => (r.getAs[Long]("streamId"), r.getAs[Long]("index"), r.getAs[String]("rv")))
    // stream 0: idx 0 -> "a" (inclusive at equality), 1..4 -> "b",
    // 5..9 -> null (nothing follows); stream 1: 0..3 -> "c", 4.. -> null
    assert(out.filter(_._1 == 0L).map(_._3).toSeq ==
      Seq("a") ++ Seq.fill(4)("b") ++ Seq.fill(5)(null))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq ==
      Seq.fill(4)("c") ++ Seq.fill(6)(null))
  }

  test("gather keeps listed rows in list order (py_test.py:297)") {
    val out = idxPay(SequenceOps.gather(elems(N), Seq(0L, 150L, 377L, 500L)))
    assert(out.size == 4)
    assert(out.map(_._1) == (0L until 4L))
    assert(out.map(_._2.toLong) == Seq(0L, 150L, 377L, 500L))
  }

  test("asofJoin bucketed matches the single-window fallback; carry crosses right-empty buckets") {
    val left  = elems(1000).withColumnRenamed("payload", "lp")
    val right = Seq((0L, 5L, "a"), (0L, 17L, "b"), (0L, 450L, "c"))
      .toDF("streamId", "index", "rv")
    def vals(bucketWidth: Long): Seq[(Long, Long, String)] =
      SequenceOps.asofJoin(left, right, bucketWidth)
        .orderBy("streamId", "index").collect()
        .map(r => (r.getAs[Long]("streamId"), r.getAs[Long]("index"), r.getAs[String]("rv")))
        .toSeq
    val bucketed = vals(64)
    assert(bucketed == vals(0), "bucketed plan must agree with the single-window fallback")
    // rights live in buckets 0 and 7 only; rows in buckets 1..6 and 8..15
    // read their value through the bucket-carry pass
    assert(bucketed(4)._3 == null && bucketed(5)._3 == "a")
    assert(bucketed(449)._3 == "b" && bucketed(450)._3 == "c" && bucketed(999)._3 == "c")
  }

  test("bucketed asofJoin spreads ONE stream over many tasks; fill window keys on (stream, bucket)") {
    val left  = elems(1000).withColumnRenamed("payload", "lp")
    val right = Seq((0L, 5L, "a")).toDF("streamId", "index", "rv")
    val out   = SequenceOps.asofJoin(left, right, bucketWidth = 64)
    // the big-side fill window (the one ordering on __side) must partition
    // on the bucket too — a refactor back to partitionBy(streamId) alone
    // would re-serialize a 100 TB stream into one task
    val fillWindows = out.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("windowspecdefinition") && l.contains("__side"))
      .toSeq
    assert(fillWindows.nonEmpty, "expected the fill window in the plan")
    assert(fillWindows.forall(_.contains("__bkt")),
      "fill window must partition on (stream, bucket)")
    // AQE rightly coalesces this tiny test shuffle into one partition;
    // switch coalescing off to observe the partitioning the plan declares
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val tasksWithRows = SequenceOps.asofJoin(left, right, bucketWidth = 64).rdd
        .mapPartitions(it => Iterator.single(if (it.hasNext) 1 else 0)).sum()
      assert(tasksWithRows > 1, "a single stream should spread over multiple tasks")
    } finally spark.conf.set(key, old)
  }

  test("gather constant-list fast path plans join-free (BASELINE target 2)") {
    // 500 distinct indices (97 coprime to 600): a big-but-constant list
    val df = SequenceOps.gather(elems(N), (0L until 500L).map(_ * 97 % N))
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      "a duplicate-free constant gather list must plan as filter+re-index, not a join")
    // unsorted list: output position is LIST position, not sorted order
    val out = idxPay(SequenceOps.gather(elems(N), Seq(500L, 3L, 150L)))
    assert(out.map(_._1) == (0L until 3L))
    assert(out.map(_._2.toLong) == Seq(500L, 3L, 150L))
  }

  test("gather with duplicate sources still emits one row per list position") {
    // 7 gathered twice -> falls back to the join path, list order preserved
    val out = idxPay(SequenceOps.gather(elems(N), Seq(7L, 7L, 3L)))
    assert(out.map(_._1) == (0L until 3L))
    assert(out.map(_._2.toLong) == Seq(7L, 7L, 3L))
  }

  test("repeat x8: N*8 rows, block i holds value i/8 (py_test.py:310-322)") {
    val out = idxPay(SequenceOps.repeat(elems(96), 8))
    assert(out.size == 96 * 8)
    assert(out.map(_._1) == (0L until 96L * 8))
    assert(out.forall { case (i, p) => p.toLong == i / 8 })
  }

  test("repeatNull x8: i%8==0 real, else null element (py_test.py:324-336)") {
    val out = SequenceOps.repeatNull(elems(24), 8)
      .orderBy("index")
      .collect()
      .map(r => (r.getAs[Long]("index"), Option(r.getAs[Array[Byte]]("payload"))))
    assert(out.length == 24 * 8)
    out.foreach { case (i, p) =>
      if (i % 8 == 0) assert(p.exists(b => new String(b).toLong == i / 8))
      else assert(p.isEmpty, s"index $i should be a null element")
    }
  }

  test("slice(all(50)) then unslice is the identity (py_test.py:350-358)") {
    val out = idxPay(SequenceOps.unslice(SequenceOps.slice(elems(N), Partitioner.All(50))))
    assert(out.size == N)
    assert(out.map(_._1) == (0L until N.toLong))
    assert(out.forall { case (i, p) => p.toLong == i })
  }

  test("overlapping slice partitions + per-slice range -> 30 rows (py_test.py:361-375)") {
    val sliced = SequenceOps.slice(elems(N),
      Partitioner.Ranges(Seq((0L, 15L), (5L, 25L), (15L, 35L))))
    val perSliceRange = sliced.filter(col(SequenceOps.INDEX) < 10) // Range(0,10) per slice
    val out = SequenceOps.unslice(perSliceRange)
      .orderBy("index").collect()
      .map(r => (r.getAs[Long]("index"), new String(r.getAs[Array[Byte]]("payload")).toLong))
    assert(out.length == 30)
    assert(out.map(_._1).toSeq == (0L until 30L))
    // group 0 local 0..9 = src 0..9 ; group 1 = src 5..14 ; group 2 = src 15..24
    assert(out.map(_._2).toSeq == ((0L until 10L) ++ (5L until 15L) ++ (15L until 25L)))
  }

  test("slice Strided partitions the strided domain into groups") {
    val out = SequenceOps.slice(elems(40), Partitioner.Strided(2, 5))
      .orderBy("sliceId", "index").collect()
      .map(r => (r.getAs[Long]("sliceId"), r.getAs[Long]("index"),
        new String(r.getAs[Array[Byte]]("payload")).toLong))
    assert(out.length == 20)
    assert(out.take(5).toSeq == Seq((0L, 0L, 0L), (0L, 1L, 2L), (0L, 2L, 4L), (0L, 3L, 6L), (0L, 4L, 8L)))
    assert(out(5) == ((1L, 0L, 10L)))
  }

  test("stencil [-1,0,1] repeat-edge (op.h:78-82, dag_analysis.cpp:1446-1469)") {
    val out = SequenceOps.stencil(elems(5), Seq(-1, 0, 1), "payload")
      .orderBy("index").collect()
      .map(r => (r.getAs[Long]("index"),
        r.getSeq[Array[Byte]](r.fieldIndex("window")).map(b => new String(b).toLong)))
    assert(out.length == 5)
    assert(out(0)._2 == Seq(0L, 0L, 1L)) // edge repeat at front
    assert(out(2)._2 == Seq(1L, 2L, 3L))
    assert(out(4)._2 == Seq(3L, 4L, 4L)) // edge repeat at back
  }

  test("stencil null-fill boundary yields nulls out of domain") {
    val out = SequenceOps.stencil(elems(3), Seq(-2, 0), "payload", Boundary.NullFill)
      .orderBy("index").collect()
      .map { r =>
        val w = r.getSeq[Array[Byte]](r.fieldIndex("window"))
        (r.getAs[Long]("index"), w.map(Option(_).map(b => new String(b).toLong)))
      }
    assert(out(0)._2 == Seq(None, Some(0L)))
    assert(out(1)._2 == Seq(None, Some(1L)))
    assert(out(2)._2 == Seq(Some(0L), Some(2L)))
  }

  test("stencil one-sided offsets under null-fill keep the edge rows (all-null windows)") {
    // offsets={+2}: rows 3 and 4 have NO in-domain neighbor — the 1→1
    // contract still emits them, window = [null] (both physical plans)
    for (plan <- Seq(
        SequenceOps.stencil(elems(5), Seq(2), "payload", Boundary.NullFill),
        SequenceOps.stencilExplode(elems(5), Seq(2), "payload", Boundary.NullFill))) {
      val out = plan.orderBy("index").collect()
        .map { r =>
          val w = r.getSeq[Array[Byte]](r.fieldIndex("window"))
          (r.getAs[Long]("index"), w.map(Option(_).map(b => new String(b).toLong)))
        }
      assert(out.map(_._1).toSeq == (0L until 5L).toSeq, "every input row is a target")
      assert(out(2)._2 == Seq(Some(4L)))
      assert(out(3)._2 == Seq(None))
      assert(out(4)._2 == Seq(None))
    }
  }

  test("stencil Error boundary raises on out-of-domain reads (rpc.proto:254-259)") {
    val ok = SequenceOps.stencil(elems(5), Seq(0, 1), "payload", Boundary.Error)
      .filter(col(SequenceOps.INDEX) < 4) // all in-domain windows
    // collect (not count) so the window column — and with it the checked
    // boundary expression — is actually evaluated
    assert(ok.collect().length == 4)
    val bad = SequenceOps.stencil(elems(5), Seq(0, 1), "payload", Boundary.Error)
    val e = intercept[Exception] { bad.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("stencil boundary violation")))
  }

  test("stencilHalo matches the explode plan on every boundary mode, edges, gaps, buckets") {
    def canon(df: DataFrame): Seq[(Long, Long, Seq[Option[Long]])] =
      df.orderBy("streamId", "index").collect().map { r =>
        val w = r.getSeq[Array[Byte]](r.fieldIndex("window"))
        (r.getAs[Long]("streamId"), r.getAs[Long]("index"),
          w.map(Option(_).map(b => new String(b).toLong)))
      }.toSeq
    val base = elems(300, streams = 2)
    // a gap: indices 40..49 of stream 0 removed (non-dense input)
    val gappy = base.filter(!(col("streamId") === 0 && col("index") >= 40 && col("index") < 50))
    for {
      offsets  <- Seq(Seq(-1, 0, 1), Seq(-3, 2), Seq(-2, 0, 2, 5))
      boundary <- Seq(Boundary.RepeatEdge, Boundary.NullFill)
      input    <- Seq(base, gappy)
    } {
      val expect = canon(SequenceOps.stencilExplode(input, offsets, "payload", boundary))
      // bucketWidth 64 forces multi-bucket streams and real halo traffic
      val got = canon(SequenceOps.stencilHalo(input, offsets, "payload", boundary,
        bucketWidth = 64))
      assert(got == expect, s"halo mismatch: offsets=$offsets boundary=$boundary")
    }
    // Error boundary: clean in-domain slice passes, full domain raises
    val okH = SequenceOps.stencilHalo(elems(100), Seq(0, 1), "payload", Boundary.Error,
      bucketWidth = 64).filter(col(SequenceOps.INDEX) < 99)
    assert(okH.collect().length == 99)
    val e = intercept[Exception] {
      SequenceOps.stencilHalo(elems(100), Seq(0, 1), "payload", Boundary.Error,
        bucketWidth = 64).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("stencil boundary violation")))
  }

  test("stencil {0,1} row counts match reference ranges (py_test.py:459-520)") {
    // Range(0,1) with stencil [0,1] -> 1 row; Range(0,2) -> 2 rows
    val st = SequenceOps.stencil(elems(30), Seq(0, 1), "payload")
    assert(SequenceOps.range(st.withColumnRenamed("window", "payload"), 0, 1).count() == 1)
    assert(SequenceOps.range(st.withColumnRenamed("window", "payload"), 0, 2).count() == 2)
  }

  test("positional join binds aligned sequences by (streamId, index) (op.py:174-186)") {
    val a = elems(10).withColumnRenamed("payload", "a")
    val b = elems(10).withColumnRenamed("payload", "b")
    val j = SequenceOps.positionalJoin(Seq(a, b))
    assert(j.count() == 10)
    assert(j.columns.sorted.toSeq == Seq("a", "b", "index", "streamId"))
  }

  test("sampler algebra: Stride(a)∘Stride(b) ≡ Stride(a*b) (SURVEY §5 property plan)") {
    for ((a, b) <- Seq((2L, 3L), (4L, 5L), (7L, 2L))) {
      val composed = idxPay(SequenceOps.stride(SequenceOps.stride(elems(N), a), b))
      val direct   = idxPay(SequenceOps.stride(elems(N), a * b))
      assert(composed == direct, s"stride $a∘$b != stride ${a * b}")
    }
  }

  test("sampler algebra: Stride(n)∘Range(s,e) ≡ StridedRange(s,e,n)") {
    for ((s0, e0, n) <- Seq((0L, 120L, 4L), (37L, 200L, 7L), (100L, 101L, 3L))) {
      val composed = idxPay(SequenceOps.stride(SequenceOps.range(elems(N), s0, e0), n))
      val direct   = idxPay(SequenceOps.stridedRange(elems(N), s0, e0, n))
      assert(composed == direct, s"stride($n)∘range($s0,$e0) != stridedRange")
    }
  }

  test("sampler algebra: Stride(k)∘Repeat(k) ≡ identity") {
    for (k <- Seq(2L, 5L, 9L)) {
      val roundTrip = idxPay(SequenceOps.stride(SequenceOps.repeat(elems(90), k), k))
      assert(roundTrip == idxPay(elems(90)), s"stride∘repeat at k=$k not identity")
    }
  }

  test("multi-stream: samplers operate per stream independently") {
    val out = SequenceOps.stride(elems(100, streams = 3), 10)
    assert(out.count() == 30)
    assert(out.groupBy("streamId").count().collect().forall(_.getLong(1) == 10))
  }
}
