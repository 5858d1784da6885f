package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational surface — what the Spark rebuild gets "for free" once the
  * element model is a DataFrame (SURVEY.md §2.5: the reference has NO joins/
  * aggregations/windows; multi-input kernels are positional joins). These
  * queries prove the full surface on the TPC-H-ish tables and double as the
  * scale benchmarks.
  *
  * FP discipline for the DuckDB oracle: every aggregated double goes through
  * DECIMAL(38,6) (exact, order-independent) and back to DOUBLE, so Spark and
  * DuckDB agree bit-for-bit regardless of aggregation order. Direct column
  * reads / single-row arithmetic stay double (IEEE ops are deterministic).
  */
object RelQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` normalized to nano-long whatever the parquet
    * encoding (see [[graft.GraftSession.tsToNanos]]) — every event-time
    * query reads through here so a driver-side re-encode of the fact
    * table cannot break the suite again.
    */
  private def ev(s: SparkSession, dir: String): DataFrame =
    graft.GraftSession.tsToNanos(t(s, dir, "events"))

  /** exact (order-independent) sum of a double expression, as double */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(38,6)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: the canonical wide aggregation
    "q1_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate").cast("date") <= lit("1998-09-02").cast("date"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3-style: 3-way join, aggregate, top-10 — join-order and
    // broadcast decisions left to Catalyst/AQE (customer is the small side)
    "q3_top_revenue" -> ((s, dir) => {
      val cust   = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val li     = t(s, dir, "lineitem")
      cust.join(orders, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate").cast("date") < lit("1998-01-01").cast("date"))
        .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-style: 5-way star join; dims (supplier/nation/region) are
    // broadcast explicitly — at 100 TB only lineitem/orders are big
    "q5_nation_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders")
      val c  = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n  = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("n_name"))
    }),

    // TPC-H Q6-style: selective predicate + scalar aggregate — the
    // pure scan-pushdown query (filters reach the parquet reader; one
    // partial-aggregated scalar comes back)
    "q6_forecast_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate").cast("date") < lit("1998-01-01").cast("date") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
          col("l_quantity") < 24.0)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))),

    // sort + limit with deterministic tiebreak
    "q_topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // ranking window: top-3 orders per customer
    "q_group_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
        .orderBy("o_custkey", "rk")
    }),

    // anti join: customers with no orders
    "q_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    // semi join: customers that have at least one order over 100k
    "q_semi_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 100000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    // bloom-prefiltered semi-join (JoinStrategies.bloomSemiJoin): lineitem
    // of high-value orders, fact rows dropped at the scan by broadcast
    // bloom bits before the exact semi-join clears false positives —
    // result identical to the plain semi-join the oracle runs
    "q_bloom_semi_join" -> ((s, dir) => {
      val hi = t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
      graft.operators.JoinStrategies
        .bloomSemiJoin(t(s, dir, "lineitem"), hi, "l_orderkey", "o_orderkey",
          expectedKeys = 100000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // semi-structured surface: parse the events' JSON props with a
    // declared schema (from_json — codegen'd Jackson parse at the scan,
    // no UDF) and aggregate an extracted field
    "q_events_props_json" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_parsed"),
          sum(col("k").cast("long")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // explicit GROUPING SETS (the general form of rollup/cube): per-flag,
    // per-status, and grand-total aggregates in ONE pass (Expand operator)
    "q_grouping_sets" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // pivot: status categories become columns (one wide agg pass; the
    // pivot values are declared, so the schema is static at plan time)
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_extendedprice")))
        .withColumnRenamed("F", "price_f").withColumnRenamed("O", "price_o")
        .orderBy("l_returnflag")),

    // z-order (Morton) clustering key — the multi-column data-skipping
    // layout (Layout.zorderLayout); the query pins the interleaved key's
    // bit math by showing each coarse z-bucket covers a tight
    // hyper-rectangle of BOTH key columns
    "layout_zorder" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select((col("l_partkey") % 1024).as("p"), (col("l_suppkey") * 37 % 1024).as("q"))
        .withColumn("zk",
          graft.operators.Layout.zorderKey(Seq(col("p"), col("q")), 10))
        .groupBy(shiftright(col("zk"), 16).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("p")).as("min_p"), max(col("p")).as("max_p"),
          min(col("q")).as("min_q"), max(col("q")).as("max_q"))
        .orderBy("zbucket")),

    // HLL++ sketch count-distinct — the mergeable, fixed-memory 100 TB
    // path (exact countDistinct expands every value through the shuffle;
    // the sketch ships kilobyte registers). The oracle can't reproduce
    // another engine's sketch, so the pin is the exact count plus the
    // sketch landing within 3x its rsd — deterministic: HLL register
    // merge is a max, order-independent.
    "q_sketch_distinct" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"),
          approx_count_distinct(col("o_custkey"), 0.05).as("__approx"),
          count(lit(1)).as("n_orders"))
        .select(col("o_orderpriority"), col("n_exact"), col("n_orders"),
          (abs(col("__approx") - col("n_exact")).cast("double") / col("n_exact")
            <= 0.15).as("hll_ok"))
        .orderBy("o_orderpriority")),

    // t-digest-style quantile sketch vs the exact percentile: same
    // tolerance-pin scheme as q_sketch_distinct (rank error <= n/accuracy)
    "q_sketch_quantile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_exact"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("__p50a"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("p50_exact"), col("n"),
          (abs(col("__p50a") - col("p50_exact")) <= lit(2.0)).as("sketch_ok"))
        .orderBy("l_returnflag")),

    // exact distinct aggregation (expand + two-phase agg under the hood)
    "q_count_distinct" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")),

    "q_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // set op: union of two order slices, re-aggregated
    "q_union_priorities" -> ((s, dir) => {
      val o    = t(s, dir, "orders")
      val high = o.filter(col("o_totalprice") >= 150000.0)
        .select(col("o_orderpriority"), lit("high").as("band"))
      val low = o.filter(col("o_totalprice") < 150000.0)
        .select(col("o_orderpriority"), lit("low").as("band"))
      high.union(low)
        .groupBy(col("o_orderpriority"), col("band"))
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority", "band")
    }),

    // exact interpolated percentiles per group (sort-based aggregate —
    // approx sketches can't face a hash-compare oracle). Rounded to 6 dp:
    // both engines interpolate linearly but with independently ordered
    // arithmetic, so raw doubles could differ by an ulp
    "q_events_median" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // gap-based sessionization over the event stream (lag + running sum) —
    // the batch twin of the Structured Streaming session window
    "q_events_sessionize" -> ((s, dir) => {
      val events = ev(s, dir) // ts normalized to long nanos
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > lit(1800L * 1000000000L), 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // hierarchical aggregation: ROLLUP produces the (flag, status),
    // (flag), () grouping sets in one pass
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // set algebra beyond UNION: (urgent ∩ high-priority customers) minus
    // low-priority customers — INTERSECT/EXCEPT distinct semantics match
    // across engines
    "q_set_ops" -> ((s, dir) => {
      def custs(prio: String) = t(s, dir, "orders")
        .filter(col("o_orderpriority") === prio)
        .select(col("o_custkey"))
      custs("1-URGENT").intersect(custs("2-HIGH"))
        .except(custs("5-LOW"))
        .orderBy("o_custkey")
    }),

    // full CUBE with a grouping-id column distinguishing the aggregation
    // level (NULL data values vs NULL subtotal markers)
    "q_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // running window frame: per-customer cumulative order spend in date
    // order — decimal accumulation so frame-order arithmetic is exact in
    // both engines
    "q_running_spend" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(38,6)")).over(w)
            .cast("double").as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // tumbling 1-hour windowed aggregation — identical plan under
    // Structured Streaming (readStream + window())
    "q_events_hourly" -> ((s, dir) => {
      // integral `div`, not `/`: long `/` evaluates in double and ts is
      // ~1.7e18 ns (> 2^53), so double rounding could shift boundary events
      // into the wrong bucket vs DuckDB's exact `//`
      ev(s, dir).withColumn("bucket", expr("ts div 3600000000000"))
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("bucket", "event_type")
    }),

    // Interval (range) join through the bucketed equi-join rewrite
    // (JoinStrategies.bucketedRangeJoin): 20 overlapping 12-hour analysis
    // windows (6-hour step from the corpus min ts — derived by a 1-row
    // agg that broadcasts) x the event stream, half-open containment.
    // The naive formulation is a theta join Spark plans nested-loop; the
    // rewrite shuffles hash-partitioned on the 6-hour bucket with
    // fan-out <= 3 buckets per window, the shape that holds when BOTH
    // sides are large.
    "q_events_range_join" -> ((s, dir) => {
      val sixH = 21600000000000L // 6h in ns
      val e  = ev(s, dir)
      val t0 = e.agg(min(col("ts")).as("t0"))
      val wins = t0.select(explode(sequence(lit(0L), lit(19L))).as("win_id"), col("t0"))
        .select(col("win_id"),
          (col("t0") + col("win_id") * sixH).as("ws"),
          (col("t0") + col("win_id") * sixH + 2 * sixH).as("we"))
      graft.operators.JoinStrategies.bucketedRangeJoin(
        e.select(col("ts"), col("value")), wins, "ts", "ws", "we", sixH)
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("win_id")
    }),

    // Ordered funnel (view -> click -> purchase): per user, the earliest
    // qualifying event of each step STRICTLY AFTER the previous step's
    // time — the event-analytics staple. Shape: one filtered min-agg per
    // step chained by a user-keyed join (each join co-partitions on the
    // user hash; no per-user window sort anywhere), then three tiny
    // counts. At 100 TB each step's relation is |users| rows max.
    "q_events_funnel" -> ((s, dir) => {
      val e = ev(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      val s1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = e.filter(col("event_type") === "click").join(s1, Seq("user_id"))
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = e.filter(col("event_type") === "purchase").join(s2, Seq("user_id"))
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.agg(count(lit(1)).as("n")).select(lit(1L).as("step"), col("n"))
        .unionByName(s2.agg(count(lit(1)).as("n")).select(lit(2L).as("step"), col("n")))
        .unionByName(s3.agg(count(lit(1)).as("n")).select(lit(3L).as("step"), col("n")))
        .orderBy("step")
    }),

    // Retention cohorts: users grouped by first-seen day, distinct-user
    // activity counted per (cohort_day, day_offset) for the first week.
    // One min-agg for the cohort + one distinct (user, day) relation +
    // one user-keyed join — the cohort table is |users| rows, activity
    // shuffles as (user, day) pairs, never raw events.
    "q_events_retention" -> ((s, dir) => {
      val d0 = to_date(graft.GraftSession.nanosToTimestamp(col("ts")))
      val e = ev(s, dir).select(col("user_id"), d0.as("d")).distinct()
      val cohort = e.groupBy(col("user_id")).agg(min(col("d")).as("c0"))
      e.join(cohort, Seq("user_id"))
        .select(col("c0").as("cohort_day"), datediff(col("d"), col("c0")).cast("long").as("day_offset"))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // calendar functions over the nano timestamps: ISO weekday (0=Monday,
    // aligned across engines' differing dayofweek conventions) + DATE-typed
    // aggregation — the scalar date surface of the gap map
    "q_events_weekday" -> ((s, dir) => {
      val tts = graft.GraftSession.nanosToTimestamp(col("ts"))
      ev(s, dir)
        .select(((dayofweek(tts) + 5) % 7).cast("long").as("dow"),
          col("event_type"), to_date(tts).as("d"))
        .groupBy(col("dow"), col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("d")).as("first_day"))
        .orderBy("dow", "event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_revenue" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.05
        |  AND l_quantity < 24.0""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_group_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_bloom_semi_join" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l_orderkey AND o_totalprice > 400000.0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_events_props_json" ->
      """SELECT event_type,
        |  COUNT(k) AS n_parsed,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MAX(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
        |    FILTER (l_linestatus = 'F') AS DOUBLE) AS price_f,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
        |    FILTER (l_linestatus = 'O') AS DOUBLE) AS price_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "layout_zorder" -> {
      val terms = (0 until 10).flatMap(b =>
        Seq(s"(((p >> $b) & 1) << ${2 * b})", s"(((q >> $b) & 1) << ${2 * b + 1})"))
        .mkString(" + ")
      s"""WITH z AS (SELECT l_partkey % 1024 AS p, l_suppkey * 37 % 1024 AS q FROM lineitem),
         |k AS (SELECT p, q, $terms AS zk FROM z)
         |SELECT zk >> 16 AS zbucket, COUNT(*) AS n,
         |  MIN(p) AS min_p, MAX(p) AS max_p, MIN(q) AS min_q, MAX(q) AS max_q
         |FROM k GROUP BY zbucket ORDER BY zbucket""".stripMargin
    },

    "q_sketch_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_exact,
        |  COUNT(*) AS n_orders, TRUE AS hll_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_sketch_quantile" ->
      """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 6) AS p50_exact,
        |  COUNT(*) AS n, TRUE AS sketch_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_count_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_union_priorities" ->
      """SELECT o_orderpriority, band, COUNT(*) AS n FROM (
        |  SELECT o_orderpriority, 'high' AS band FROM orders WHERE o_totalprice >= 150000.0
        |  UNION ALL
        |  SELECT o_orderpriority, 'low' AS band FROM orders WHERE o_totalprice < 150000.0)
        |GROUP BY o_orderpriority, band ORDER BY o_orderpriority, band""".stripMargin,

    "q_events_median" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_events_sessionize" ->
      """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL OR ts_ns - prev_ts > 1800000000000 THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, epoch_ns(ts) AS ts_ns,
        |          lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_ts
        |        FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // funnel replay: identical min-chain, strict-after joins
    "q_events_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_ns(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(epoch_ns(ts)) AS t2 FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND epoch_ns(ts) > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(epoch_ns(ts)) AS t3 FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND epoch_ns(ts) > t2 GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS step, COUNT(*) AS n FROM s1
        |UNION ALL SELECT CAST(2 AS BIGINT), COUNT(*) FROM s2
        |UNION ALL SELECT CAST(3 AS BIGINT), COUNT(*) FROM s3
        |ORDER BY step""".stripMargin,

    // retention replay: distinct (user, day), min-day cohort, day offsets
    "q_events_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, MIN(d) AS c0 FROM e GROUP BY user_id)
        |SELECT c0 AS cohort_day, CAST(d - c0 AS BIGINT) AS day_offset,
        |  COUNT(*) AS n_users
        |FROM e JOIN c USING (user_id)
        |WHERE d - c0 <= 7
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "q_events_weekday" ->
      """SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow, event_type,
        |  COUNT(*) AS n, MIN(CAST(ts AS DATE)) AS first_day
        |FROM events GROUP BY 1, 2 ORDER BY dow, event_type""".stripMargin,

    "q_set_ops" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_running_spend" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    // range-join replay: the plain theta join — correct by definition at
    // oracle scale; the engine's bucketed rewrite must be value-identical
    "q_events_range_join" ->
      """WITH t0 AS (SELECT MIN(epoch_ns(ts)) AS t0 FROM events),
        |w AS (SELECT i AS win_id,
        |    t0 + i * 21600000000000 AS ws,
        |    t0 + i * 21600000000000 + 43200000000000 AS we
        |  FROM generate_series(0, 19) AS g(i) CROSS JOIN t0),
        |j AS (SELECT win_id, value FROM events e JOIN w
        |  ON epoch_ns(e.ts) >= w.ws AND epoch_ns(e.ts) < w.we)
        |SELECT win_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM j GROUP BY win_id ORDER BY win_id""".stripMargin,

    "q_events_hourly" ->
      """SELECT epoch_ns(ts) // (3600000000000) AS bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin
  )
}
