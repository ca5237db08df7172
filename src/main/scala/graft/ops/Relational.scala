package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Batch re-expressions of the reference warehouse's operator inventory
  * (SURVEY.md §2) over the driver's test tables.
  *
  * Each method mirrors one operator family of
  * seedoilz/realtime-data-warehouse (file:line cites below refer to
  * /root/reference) as an idiomatic Catalyst-planned DataFrame query.
  * Streaming variants with identical semantics live in graft.streaming.
  *
  * Oracle-exactness conventions (driver hash-compares vs DuckDB):
  *  - money/value aggregates use integer cents via floor(x*100) — double
  *    sums are addition-order-dependent, integer sums are exact;
  *  - timestamps/dates in outputs are formatted strings;
  *  - ratios are single int/int IEEE divisions (deterministic), never
  *    accumulated doubles.
  */
object Relational {

  private def cents(c: Column): Column = floor(c * 100).cast("long")
  private def day(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** P1 — JSON parse + validity-filter ETL.
    * Reference: DimApp.etl (DimApp.java:179-195), DwdBaseLog.etl
    * (DwdBaseLog.java:225-246): parse string payload, drop structurally
    * invalid records, project typed fields. get_json_object is
    * codegen'd; the filter + projection push into the parquet scan.
    */
  def p1JsonEtl(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull && col("event_type").isin("click", "view") && col("k") >= 50)

  /** P2/P4 — envelope filter + field projection.
    * Reference: DwdTradeOrderDetail.filterOdTable
    * (DwdTradeOrderDetail.java:133-151): WHERE table='x' AND
    * type='insert' then `data`['col'] projections.
    */
  def p2EnvelopeFilter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value").as("amount"))

  /** P3/P6 — update-transition predicate + conditional delta.
    * Reference: DwdTradeCartAdd.java:34,44-49 — emit only rows where the
    * new value exceeds the previous one, with delta = new - old.
    * Batch analog of the old/new CDC comparison via lag() per key.
    */
  def p3TransitionDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNotNull && col("value") > col("prev"))
      .select(col("event_id"), col("user_id"), (col("value") - col("prev")).as("delta"))
  }

  /** A1 — tumbling-window count with window start/end stamps.
    * Reference: DwsTrafficSourceKeywordPageViewWindow.getWindowAggTable
    * (:50-61): TUMBLE(row_time, 10s) GROUP BY key → count, stt, edt.
    * 1-hour windows here (test data spans a year). Spark's window() is
    * epoch-aligned, matching DuckDB's time_bucket.
    */
  def a1WindowCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("ct"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("event_type"), col("ct"))

  /** Multi-granularity DWS in ONE pass — ROLLUP (event_type, day):
    * per-(type, day) cells, per-type subtotals, and the grand total
    * from a single shuffle with map-side partial aggregation. The
    * reference materializes each granularity as its own window job
    * (one DWS app per grain feeding a Doris rollup); at 100 TB the
    * single-pass rollup reads the facts once instead of once per
    * grain. Rolled-up slots surface as 'ALL' so the result is
    * null-free (stable cross-engine ordering/hashing).
    */
  def aRollupMultiGrain(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("day"),
        cents(col("value")).as("v"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("ct"), sum(col("v")).as("sum_cents"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit("ALL")).as("day"),
        col("ct"), col("sum_cents"))

  /** Top-N per group — the standard DWS leaderboard ask ("top 3 days
    * by revenue per event type"): aggregate FIRST (the only fact-table
    * shuffle), then rank the small per-group aggregate with a window.
    * Ties break on the group-ordering column, so the result is
    * deterministic on any cluster topology.
    */
  def aTopNPerGroup(spark: SparkSession, sfDir: String, n: Int = 3): DataFrame =
    topNPerGroupDf(
      Tables.events(spark, sfDir)
        .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("day"))
        .agg(sum(cents(col("value"))).as("day_cents")),
      n)

  /** The ranking step of [[aTopNPerGroup]] over an arbitrary
    * (event_type, day, day_cents) aggregate — shared with the
    * STREAMING leaderboard ([[graft.streaming.Leaderboard]]), so the
    * served top-N is the same code whether the day aggregate came from
    * a batch scan or from incrementally folded window finals.
    */
  def topNPerGroupDf(dayAgg: DataFrame, n: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("day_cents").desc, col("day"))
    dayAgg.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= n)
  }

  /** Analytic window functions over a partitioned fact stream — the
    * per-entity sequence analytics a DWS layer serves (order history
    * with rank, running spend, gap-to-previous-order). One shuffle on
    * the partition key and ONE partition-local sort feed ALL four
    * window functions: their frames differ (row frame for
    * row_number/lag, range frame for the running sum) so Catalyst
    * chains separate Window operators, but they pipeline over the same
    * sorted output — no re-shuffle, no re-sort (PlanSpec pins this).
    * Ordering ties break on the unique order key, so every value is
    * deterministic on any cluster topology.
    */
  def aWindowAnalytics(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("order_seq", row_number().over(w).cast("long"))
      .withColumn("running_cents",
        sum(cents(col("o_totalprice"))).over(w))
      .withColumn("prev_cents",
        lag(cents(col("o_totalprice")), 1).over(w))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("order_seq"), col("running_cents"), col("prev_cents"),
        col("days_since_prev"))
  }

  /** CUBE grouping sets with grouping_id — every (returnflag ×
    * linestatus) grain including both partial margins and the grand
    * total, from ONE shuffle (Expand duplicates each input row per
    * grain BEFORE the partial aggregate, so the fact scan and the
    * exchange happen once — same property PlanSpec pins for ROLLUP).
    * `grain_id` disambiguates "NULL because aggregated away" from a
    * NULL data value — the standard cube-consumer contract.
    */
  def aCubeMetrics(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("line_ct"),
        sum(cents(col("l_extendedprice"))).as("sum_cents"),
        grouping_id().cast("long").as("grain_id"))

  /** Pivot — wide-format daily metrics, one column per event type (the
    * reporting shape every BI layer asks of a DWS table), written as
    * DIRECT conditional aggregates: one scan, one shuffle. Spark's
    * built-in `RelationalGroupedDataset.pivot` — even with an explicit
    * value list — plans TWO aggregation phases (inner (day, type) agg,
    * then a pivot agg), i.e. two exchanges; the conditional-agg form is
    * the plan you want at 100 TB and PlanSpec pins it to a single
    * exchange with no Expand. An implicit pivot would additionally run
    * a driver-side distinct job to discover values. Oracle: the
    * equivalent FILTERed aggregates in DuckDB.
    */
  def aPivotDaily(spark: SparkSession, sfDir: String): DataFrame = {
    def ct(v: String) =
      sum(when(col("event_type") === v, 1L).otherwise(0L)).as(v)
    Tables.events(spark, sfDir)
      .groupBy(day(col("ts")).as("day"))
      .agg(ct("click"), ct("view"), ct("purchase"), ct("signup"), ct("error"))
  }

  /** Exact per-group percentiles by RANK SELECTION: the value whose
    * row_number equals ceil(p·n) in the group's cents order — a
    * formulation both engines evaluate bit-identically (no
    * interpolation arithmetic to diverge in the last ulp, which rules
    * out percentile_cont for a hash compare). One window sort per
    * group feeds all three percentiles plus the count. Exact
    * percentiles inherently sort each group; at 100 TB the approximate
    * path ([[aPercentileApproxBound]] — percentile_approx sketches,
    * error-gated) is the first choice and this head is the audit tool
    * you run on a slice.
    */
  def aPercentileExact(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), cents(col("value")).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
    val ranked = ev
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    def pick(p: Double, name: String) =
      max(when(col("rn") === ceil(col("n") * p).cast("long"), col("c"))).as(name)
    ranked.groupBy(col("event_type"))
      .agg(pick(0.5, "p50_cents"), pick(0.9, "p90_cents"), pick(0.99, "p99_cents"),
        max(col("n")).as("n"))
  }

  /** Approx-percentile bound gate — the path [[aPercentileExact]]'s
    * scaladoc defers to at 100 TB (one mergeable sketch per group, no
    * per-group sort), made graded the a5_approx_bound way: the head
    * outputs the EXACT rank-selection percentiles (DuckDB-oracled)
    * plus a `within_bound` boolean that validates every approx answer
    * against the sketch's own guarantee. `percentile_approx` (Greenwald
    * -Khanna) promises the value returned for probe p has rank within
    * ε·n of ⌈p·n⌉, ε = 1/accuracy; the gate ranks each approx answer
    * by counting c < v and c ≤ v in one conditional-sum pass (the 15
    * probe rows broadcast back over the fact — bounded build side by
    * construction) and checks that [rk_lo, rk_hi] intersects the
    * allowed rank band. The same sketch is what the STREAMING leg
    * folds ([[graft.streaming.DailyServing.percentileFinals]]), so a
    * green row gates both paths.
    */
  def aPercentileApproxBound(spark: SparkSession, sfDir: String,
                             accuracy: Int = 1000): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), cents(col("value")).as("c"))
    val approx = ev.groupBy(col("event_type")).agg(
      percentile_approx(col("c"), array(lit(0.5), lit(0.9), lit(0.99)),
        lit(accuracy)).as("ap"),
      count(lit(1)).as("n0"))
    val probes = approx.select(col("event_type").as("et"), col("n0"),
        posexplode(col("ap")))
      .withColumnRenamed("pos", "pi").withColumnRenamed("col", "av")
      .withColumn("p", element_at(array(lit(0.5), lit(0.9), lit(0.99)), col("pi") + 1))
    val eps = 1.0 / accuracy
    val gated = ev.join(broadcast(probes), col("event_type") === col("et"))
      .groupBy(col("et"), col("pi"), col("p"), col("n0"), col("av"))
      .agg(sum(when(col("c") < col("av"), 1L).otherwise(0L)).as("rk_lo"),
        sum(when(col("c") <= col("av"), 1L).otherwise(0L)).as("rk_hi"))
      .withColumn("target", ceil(col("p") * col("n0")).cast("long"))
      .withColumn("ok",
        col("rk_hi").cast("double") >= col("target").cast("double") - col("n0") * eps - 1 &&
        col("rk_lo").cast("double") <= col("target").cast("double") + col("n0") * eps)
      .groupBy(col("et")).agg(bool_and(col("ok")).as("within_bound"))
    val exact = aPercentileExact(spark, sfDir)
    exact.join(gated, exact("event_type") === gated("et")).drop("et")
  }

  /** A2 — keyed tumbling-window multi-metric aggregate.
    * Reference: DwsTrafficVcChArIsNewPageViewWindow.getReduceFullStream
    * (:70-97): per-key window sums (uv/sv/pv/durSum). Partial+final
    * HashAggregate is automatic (map-side combine before the shuffle).
    */
  def a2KeyedWindowAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("pv_ct"),
        countDistinct(col("user_id")).as("uv_ct"),
        sum(cents(col("value"))).as("sum_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("event_type"), col("pv_ct"), col("uv_ct"), col("sum_cents"))

  /** A3 — global (un-keyed) tumbling-window reduce.
    * Reference: windowAll apps, e.g. DwsTradeCartAddUuWindow.java:91-111.
    * Flink collapses to parallelism 1; Spark still computes partial
    * aggregates on all partitions and only merges finals — the shape
    * that survives a 1000-executor scale-up.
    */
  def a3GlobalWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("ct"),
        countDistinct(col("user_id")).as("uv_ct"),
        sum(cents(col("value"))).as("sum_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("ct"), col("uv_ct"), col("sum_cents"))

  /** A4 — keyed tumbling-window reduce over decimal amounts.
    * Reference: DwsTradeSkuOrderWindow.reduceBeanStream (:124-156):
    * per-sku window sums of BigDecimal original/activity/coupon/order
    * amounts. DecimalType(18,2) arithmetic is exact (no float
    * accumulation-order issues), matching the reference's BigDecimal.
    */
  def a4DecimalWindowAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("sum_amount_cents"),
        (max(col("value").cast("decimal(18,2)")) * 100).cast("long").as("max_amount_cents"),
        count(lit(1)).as("order_ct"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("event_type"), col("sum_amount_cents"), col("max_amount_cents"), col("order_ct"))

  /** A5 — keyed aggregate with exact distinct-entity count.
    * Reference: DwsTradeProvinceOrderWindow.java:117-145 accumulates a
    * Set<String> orderIdSet and emits set.size. countDistinct is the
    * set-oriented equivalent (exact, matching reference semantics);
    * approx_count_distinct is the documented 100 TB fallback.
    */
  def a5DistinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("user_ct"),
        count(lit(1)).as("ct"),
        sum(cents(col("value"))).as("sum_cents"))

  /** A6 — "first event per key per day" (UV derivation), batch analog.
    * Reference: DwsTrafficVcChArIsNewPageViewWindow.mapUvBean (:120-179)
    * keeps ValueState<lastSeenDate> and emits 1 on date change. The
    * batch-equivalent semantics: distinct (user, day). Streaming
    * implementation with real per-key state: graft.streaming.FirstSeenPerDay.
    */
  def a6FirstSeenUv(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(day(col("ts")).as("cur_date"), col("user_id"))
      .distinct()
      .groupBy(col("cur_date"))
      .agg(count(lit(1)).as("uv_ct"))

  /** A6 variant — activity-gap back-flow count.
    * Reference: DwsUserUserLoginWindow.mapUserLoginBeanStream (:83-126):
    * a user is "back" when the gap since their previous active day
    * exceeds a threshold (7 days in the reference; 2 here because the
    * synthetic events span 30 dense days with max gap 4).
    */
  def a6Backflow(spark: SparkSession, sfDir: String, gapDays: Int = 2): DataFrame = {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    days
      .withColumn("pd", lag(col("d"), 1).over(w))
      .filter(col("pd").isNotNull && datediff(col("d"), col("pd")) > gapDays)
      .groupBy(date_format(col("d"), "yyyy-MM-dd").as("cur_date"))
      .agg(count(lit(1)).as("back_ct"))
  }

  /** A7 — upsert correction: latest version per key wins.
    * Reference: DwsTradeSkuOrderWindow.processBeanStream (:158-201)
    * subtracts the previously-seen amounts so re-emitted upserts don't
    * double-count. Batch equivalent: rank versions per key, keep the
    * newest, aggregate over the deduplicated set.
    */
  def a7LatestValue(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ct"), sum(cents(col("value"))).as("sum_cents"))
  }

  /** A8 — is_new repair: classify activity as new vs returning using
    * first-ever-seen day per key.
    * Reference: DwdBaseLog.isNewFix (DwdBaseLog.java:143-186).
    * The first-day table is tiny relative to events → broadcast-joined.
    */
  def a8IsNewFix(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val firstDay = ev.groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("fd"))
    val daily = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    daily.join(firstDay, "user_id")
      .groupBy(date_format(col("d"), "yyyy-MM-dd").as("cur_date"))
      .agg(
        sum(when(col("d") === col("fd"), 1).otherwise(0)).as("new_ct"),
        sum(when(col("d") > col("fd"), 1).otherwise(0)).as("returning_ct"))
  }

  /** Session windows (beyond the reference — Spark-native
    * `session_window`): per-user sessions closed by a 30-minute
    * inactivity gap; batch-equivalent of streaming sessionization
    * (the oracle expresses the same thing as gaps-and-islands).
    */
  def a9SessionWindow(spark: SparkSession, sfDir: String, gap: String = "30 minutes"): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("ct"), sum(cents(col("value"))).as("sum_cents"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("user_id"), col("ct"), col("sum_cents"))

  /** A5 at 100 TB — sketch-based distinct (HyperLogLog++): same plan
    * shape as the exact variant but mergeable partial sketches instead
    * of exact sets. No oracle (approximate); DedupSpec bounds the error
    * against the exact count.
    */
  def a5ApproxDistinct(spark: SparkSession, sfDir: String, rsd: Double = 0.02): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_user_ct"),
        count(lit(1)).as("ct"))

  /** Driver-checkable consequence gate for the HLL++ sketch (VERDICT
    * r2 #6 family): per group, the approximate distinct must sit
    * within a rel-error bound of the exact distinct (2.5× the
    * configured rsd — generous vs the estimator's guarantee, tight
    * enough that a broken sketch fails). The oracle computes the exact
    * side and asserts the bound as a constant; the Spark side carries
    * the real |approx − exact| comparison, so the sketch is gated by
    * the driver instead of only by DedupSpec.
    */
  def a5ApproxBound(spark: SparkSession, sfDir: String, rsd: Double = 0.02): DataFrame =
    // dedup-then-aggregate (r15): countDistinct mixed with a regular
    // aggregate plans through an Expand that doubles every input row
    // across a two-phase distinct pipeline (4 exchanges). Deduping
    // (event_type, user_id) first makes the exact count a plain
    // count(user_id) — and the HLL sketch is DUPLICATE-INSENSITIVE
    // (register updates are a max), so approx_count_distinct over the
    // deduped pairs builds the identical sketch and returns the
    // identical estimate. Both aggregates ignore NULL user_ids on both
    // shapes. Two partial-aggregated exchanges, no Expand.
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(count(col("user_id")).as("exact_user_ct"),
        approx_count_distinct(col("user_id"), rsd).as("approx"))
      .select(col("event_type"), col("exact_user_ct"),
        (abs(col("approx") - col("exact_user_ct")).cast("double") /
          col("exact_user_ct").cast("double") <= rsd * 2.5).as("within_bound"))

  /** J1 — multi-way fact join: 1 inner + 2 left outer on keys.
    * Reference: DwdTradeOrderDetail.getJoinTable (:68-93): order_detail
    * ⋈ order_info ⟕ activity ⟕ coupon. Here: lineitem ⋈ orders ⟕ part
    * ⟕ supplier. orders co-shuffles with lineitem on the order key;
    * part/supplier qualify for broadcast at dim scale (AQE decides from
    * runtime stats — at 100 TB the fact-fact side stays a shuffle join
    * partitioned on the join key, dims broadcast).
    */
  def j1MultiwayJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(p, li("l_partkey") === p("p_partkey"), "left_outer")
      .join(s, li("l_suppkey") === s("s_suppkey"), "left_outer")
      .select(
        col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("o_orderstatus"), col("p_name"), col("s_name"))
  }

  /** J2 — two-stream inner equi-join (same-day co-occurrence).
    * Reference: DwdTradeOrderCancelDetail.java:61-81 joins the detail
    * stream with the cancel stream on order_id within a short TTL.
    */
  def j2StreamInnerJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pay_id"), col("user_id"), to_date(col("ts")).as("d"))
    val sg = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), to_date(col("ts")).as("d"))
    p.join(sg, Seq("user_id", "d"))
      .select(col("pay_id"), col("signup_id"), col("user_id"))
  }

  /** J3 — interval join: payment ⋈ detail within an event-time range.
    * Reference: DwdTradeOrderPaySucDetail.intervalJoin (:123-148):
    * p.row_time BETWEEN od.row_time - 15 min AND od.row_time + 5 s.
    * Here: click within [purchase.ts - 15 min, purchase.ts], same user.
    * Equi-key on user_id keeps it a shuffled hash/SMJ join with a range
    * residual — not a cross product — so it scales with key cardinality.
    */
  def j3IntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pay_id"), col("user_id"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    p.join(c, p("user_id") === c("user_id") &&
        col("cts") >= col("pts") - expr("INTERVAL 15 MINUTES") &&
        col("cts") <= col("pts"))
      .select(col("pay_id"), col("click_id"))
  }

  /** J3 at scale — the BUCKETIZED band join. [[j3IntervalJoin]] equi-joins
    * on user_id with the 15-minute band as a residual: per-key work is
    * O(purchases_u × clicks_u), which detonates on heavy-hitter keys
    * (a bot user with 10M clicks makes one task do 10M× the work). This
    * variant adds the TIME BUCKET to the join key: each click is valid
    * for purchases in its own 15-min bucket or the next one, so the
    * click side emits exactly two (user, bucket) keys and the join is a
    * plain equi-join on (user_id, bucket) with the exact band as a
    * cheap post-filter. Per-task work is bounded by per-(user, 15-min)
    * occupancy — time-uniform even for bot keys — and each qualifying
    * pair appears EXACTLY once (the two click copies carry distinct
    * bucket values; a purchase has one bucket), so no dedup shuffle.
    * Same oracle as j3: the rewrite must be invisible to results.
    */
  def j3IntervalBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketSec = 900L // = the band width; candidate buckets are b and b+1
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pay_id"), col("user_id"), col("ts").as("pts"),
        floor(unix_timestamp(col("ts")) / bucketSec).as("bk"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("ts").as("cts"), floor(unix_timestamp(col("ts")) / bucketSec).as("cbk"))
      .withColumn("bk", explode(array(col("cbk"), col("cbk") + 1)))
    p.join(c, p("user_id") === c("c_user_id") && p("bk") === c("bk") &&
        col("cts") >= col("pts") - expr("INTERVAL 15 MINUTES") &&
        col("cts") <= col("pts"))
      .select(col("pay_id"), col("click_id"))
  }

  /** As-of join (beyond the reference; standard temporal enrichment in
    * training-data pipelines): each purchase picks the user's latest
    * click AT OR BEFORE it. Implemented as union + partitioned
    * last-value-ignore-nulls — ONE shuffle on (user) and a per-key sort,
    * instead of a range join that degenerates to per-key cross products.
    * This shape is why no custom SparkStrategy is needed: the windowed
    * formulation is already the scalable physical plan.
    */
  def asOfJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        lit(null).cast("long").as("pay_id"), lit(0).as("tag"))
    val pays = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("click_id"),
        col("event_id").as("pay_id"), lit(1).as("tag"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(pays)
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("pay_id"), col("user_id"), col("asof_click_id"))
  }

  /** [[asOfJoin]] through the custom WHOLE-OPERATOR path
    * ([[graft.plans.AsOfJoin]]): logical node → planner strategy →
    * partitioned-merge physical operator (VERDICT r5 #8). Same output,
    * same DuckDB oracle as `j_asof_join` — the strongest gate a custom
    * SparkPlan can get. AsOfJoinExecSpec additionally pins the plan
    * (AsOfJoinExec present, one exchange per side, no SMJ/BNLJ) and
    * the tie/no-match edge semantics.
    */
  def asOfJoinExec(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val pays = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pay_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    graft.plans.AsOfJoin.asOf(pays, clicks, key = "user_id",
        probeTs = "ts", historyTs = "ts", tieBreak = Seq("click_id"))
      .toDF("pay_id", "user_id", "ts", "click_id", "h_user_id", "h_ts")
      .select(col("pay_id"), col("user_id"), col("click_id").as("asof_click_id"))
  }

  /** J4 — dim lookup join (left) against slowly-changing dimensions.
    * Reference: DwdInteractionCommentInfo.lookUpJoin (:53-69),
    * FOR SYSTEM_TIME AS OF proc_time against HBase base_dic. Dim side
    * explicitly broadcast — the Flink per-record RPC + Redis cache
    * (J6/J7) collapses into one BroadcastHashJoin.
    */
  def j4DimLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = broadcast(Tables.nation(spark, sfDir))
    val r = broadcast(Tables.region(spark, sfDir))
    c.join(n, c("c_nationkey") === n("n_nationkey"), "left_outer")
      .join(r, n("n_regionkey") === r("r_regionkey"), "left_outer")
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
  }

  /** J5/J7 — post-aggregation chained dim enrichment.
    * Reference: DwsTradeSkuOrderWindow.associateDim (:72-122): after the
    * window agg, enrich sku→spu→c3→c2→c1→tm with sequential HBase Gets
    * (sync/async/cached variants). Spark shape: aggregate first (small
    * output), then chained broadcast joins — no RPC, no cache layer.
    */
  def j5DimChain(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val agg = li.groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("total_cents"),
        count(lit(1)).as("line_ct"))
    // supplier is SF-proportional: no hint (AQE/size stats broadcast it
    // at dim scale; at 1B suppliers the agg side is the same size and
    // SMJ is the right plan). nation/region are genuinely bounded.
    val s = Tables.supplier(spark, sfDir)
    val n = broadcast(Tables.nation(spark, sfDir))
    val r = broadcast(Tables.region(spark, sfDir))
    agg.join(s, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .select(col("s_name"), col("n_name"), col("r_name"),
        col("total_cents"), col("line_ct"))
  }

  /** J5 at reference fidelity — the actual SIX-hop dim chain.
    * Reference: DwsTradeSkuOrderWindow.associateDim
    * (DwsTradeSkuOrderWindow.java:72-122): after the window agg each
    * bean is enriched sku_info → spu_info → category3 → category2 →
    * category1 → base_trademark with six sequential HBase lookups.
    *
    * The six dim tables are derived deterministically from `part`
    * (sku=partkey, spu=brand, c3=full type, c2=first two type words,
    * c1=first word, trademark=mfgr) — a real snowflake: each hop's
    * table contributes a column unobtainable from the previous hop.
    * Spark shape: aggregate FIRST (output is |sku| rows), then six
    * chained broadcast hash joins — zero extra shuffles, the exact
    * plan you want at 100 TB where the fact table is huge and every
    * dim is tiny. The Flink per-record RPC chain with its async/cache
    * variants collapses into these six BHJs.
    */
  def j5SkuChain(spark: SparkSession, sfDir: String): DataFrame =
    skuChain(spark, sfDir, broadcast)

  /** [[j5SkuChain]] with ZERO per-query hints: `part` is declared
    * dim-scale once in [[graft.core.DimRegistry]] and
    * [[graft.core.DimBroadcastRule]] broadcasts every join against a
    * part-derived subtree — the BaseSQLApp.java:63-66 "every dim_*
    * table is cacheable" declaration as a planner rule. Same oracle as
    * j5_sku_chain; PlanSpec proves 6 BHJ survive
    * autoBroadcastJoinThreshold=-1 with AQE off.
    */
  def j5SkuChainAuto(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/part.parquet"
    graft.core.DimRegistry.register(spark, path)
    graft.core.DimBroadcast.ensureInjected(spark)
    try {
      val df = skuChain(spark, sfDir, identity)
      // Force logical optimization NOW, while `part` is registered: the
      // rule's broadcast hints are baked into this Dataset's (cached)
      // optimizedPlan, and the registration is released before return —
      // later hint-free queries against part-only subtrees in the same
      // session do NOT inherit a broadcast hint, so plan SHAs stay
      // independent of query execution order (ADVICE r5).
      df.queryExecution.optimizedPlan
      df
    } finally graft.core.DimRegistry.unregister(spark, path)
  }

  private def skuChain(spark: SparkSession, sfDir: String,
                       dim: DataFrame => DataFrame): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    // trademark = the brand's manufacturer prefix ('Brand#42' → 'Brand#4')
    val sku = p.select(col("p_partkey").as("sku_id"), col("p_name").as("sku_name"),
      col("p_brand").as("spu_id"), col("p_type").as("c3_id"),
      substring(col("p_brand"), 1, 7).as("tm_id"))
    val spu = sku.select(col("spu_id")).distinct()
      .withColumn("spu_name", concat(lit("spu:"), col("spu_id")))
    // first two words, clipped when the type has fewer (substring_index
    // returns the whole string below the requested word count)
    val c3 = p.select(col("p_type").as("c3_id")).distinct()
      .withColumn("c2_id", substring_index(col("c3_id"), " ", 2))
    val c2 = c3.select(col("c2_id")).distinct()
      .withColumn("c2_name", concat(lit("c2:"), col("c2_id")))
      .withColumn("c1_id", substring_index(col("c2_id"), " ", 1))
    val c1 = c2.select(col("c1_id")).distinct()
      .withColumn("c1_name", concat(lit("c1:"), col("c1_id")))
    val tm = sku.select(col("tm_id")).distinct()
      .withColumn("tm_name", concat(lit("tm:"), col("tm_id")))
    val agg = li.groupBy(col("l_partkey").as("sku_id"))
      .agg(sum(cents(col("l_extendedprice"))).as("amount_cents"),
        count(lit(1)).as("order_ct"))
    agg.join(dim(sku), "sku_id")
      .join(dim(spu), "spu_id")
      .join(dim(c3), "c3_id")
      .join(dim(c2), "c2_id")
      .join(dim(c1), "c1_id")
      .join(dim(tm), "tm_id")
      .select(col("sku_id"), col("sku_name"), col("spu_name"), col("c3_id"),
        col("c2_name"), col("c1_name"), col("tm_name"),
        col("amount_cents"), col("order_ct"))
  }

  /** J8/P5/K2 — config-driven routing: the routing table is DATA.
    * Reference: DimBroadcastFunction.java:17-93 + DwdBaseDb.java:79-129:
    * a broadcast config stream routes CDC rows to sink tables and
    * prunes columns per config. Spark shape: broadcast-join the fact
    * stream with the (tiny, re-readable) config table; `sink_table`
    * becomes an output column (the dynamic-topic Kafka sink reads it).
    */
  def j8ConfigRouting(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val config = Seq(
      ("purchase", "dwd_trade_purchase"),
      ("click", "dwd_traffic_click"),
      ("signup", "dwd_user_signup")).toDF("event_type", "sink_table")
    Tables.events(spark, sfDir)
      .join(broadcast(config), "event_type")
      .select(col("event_id"), col("event_type"), col("user_id"), col("sink_table"))
  }

  /** J9 — UDTF lateral join: tokenizer + explode.
    * Reference: DwsTrafficSourceKeywordPageViewWindow.kwSplit (:63-69):
    * LEFT JOIN LATERAL TABLE(KwSplit(keywords)). The IK analyzer
    * (IkUtil.java:12-28) becomes whitespace tokenization (same operator
    * shape: Generate over a split expression, fully codegen'd — no UDF).
    */
  def j9ExplodeTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("ct"))

  /** J9 with the reference's real concern — CJK keyword segmentation.
    * Reference: the IK analyzer (IkUtil.java:12-28, KwSplit.java,
    * DwsTrafficSourceKeywordPageViewWindow.java:63-69) exists to split
    * CHINESE search keywords, which have no spaces. graft's stand-in is
    * dictionary-free character-bigram segmentation (the classical CJK
    * fallback IK itself uses for out-of-dictionary runs), implemented
    * as the native CjkTokens expression: whitespace split + bigrams
    * over maximal CJK runs, single pass per row, codegen'd.
    *
    * The test corpus has no CJK text, so the query derives a
    * deterministic mixed-script keyword per doc (lang prefix + md5 hex
    * transliterated to CJK via translate()) — both engines compute the
    * identical string, making the bigram segmentation itself
    * oracle-checkable, including the intra-token latin→CJK boundary.
    */
  def j9CjkTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.functions.cjk_tokens
    val mixed = concat(col("lang"),
      translate(substring(md5(col("text")), 1, 12),
        "0123456789abcdef", "零一二三四五六七八九十百千万亿兆"))
    Tables.documents(spark, sfDir)
      .select(explode(cjk_tokens(mixed)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("ct"))
  }

  /** Flagship composite (SURVEY §7.2 slice 2): filter → tokenize/explode
    * → grouped count, the DwsTrafficSourceKeywordPageViewWindow analog:
    * source→filter→UDTF→agg→sink in one declarative plan.
    */
  def keywordPageView(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("lang") === "en")
      .select(col("source"), explode(split(col("text"), " ")).as("keyword"))
      .groupBy(col("source"), col("keyword"))
      .agg(count(lit(1)).as("keyword_ct"))

  /** Transparent MV rollup serving (core.MvRewrite) — the Doris-rollup
    * query path the reference's DWS tables exist for (each DWS app
    * pre-aggregates a grain; ad-hoc queries hit the rollup, not the
    * facts). Here the rollup is DECLARED once and Catalyst re-targets
    * any matching aggregate automatically: this query groups the
    * documents fact by source only, and the optimizer answers it from
    * the (source, lang) MV — at 100 TB that is a few-thousand-row scan
    * instead of the corpus. The ORACLE aggregates the raw fact table in
    * DuckDB, so a green row proves the rewrite is semantics-preserving,
    * not just plan-pretty. MV is built once per sf dir (source-keyed
    * on the fact files' metadata, so a regenerated source rebuilds);
    * registry cleared in finally so no other query's plan can inherit
    * the rewrite (plan-sha order independence, the ADVICE r5 j5 rule).
    */
  def mvRollupRewrite(spark: SparkSession, sfDir: String): DataFrame = {
    val key = sfDir.replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+", "")
    val mv = graft.core.MvDef(
      name = "documents_rollup",
      sourcePath = s"$sfDir/documents.parquet",
      mvPath = s"target/mv/documents_rollup_$key",
      dims = Seq("source", "lang"),
      aggs = Seq(
        graft.core.MvAgg("sum", "n_chars", "sum_chars_mv"),
        graft.core.MvAgg("count", "*", "cnt_mv"),
        graft.core.MvAgg("min", "n_chars", "min_chars_mv"),
        graft.core.MvAgg("max", "n_chars", "max_chars_mv")))
    graft.core.Mv.ensure(spark, mv)
    graft.core.MvRegistry.register(spark, mv)
    graft.core.MvRewrite.ensureInjected(spark)
    try {
      val df = Tables.documents(spark, sfDir)
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).as("sum_chars"),
          count(lit(1)).as("doc_ct"),
          max(col("n_chars")).as("max_chars"))
      // force optimization NOW, while the MV is registered (the j5 trick)
      df.queryExecution.optimizedPlan
      df
    } finally graft.core.MvRegistry.unregister(spark, mv.name)
  }

  /** Build-once (source-keyed on the events files' metadata, like
    * Mv.ensure) ts-clustered zones-enabled [[graft.io.Upsert]] snapshot
    * of the events table — the serving layout behind [[zonesDateRange]].
    * Returns the table root.
    */
  def zonesEventsEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/zones/events_ts_", sfDir,
        recipe = "zones(ts) cluster(ts) files=40 v1") { root =>
      graft.io.Upsert.overwriteSnapshot(spark, root,
        Tables.events(spark, sfDir),
        zoneCols = Seq("ts"), clusterBy = Seq("ts"), filesTarget = 40)
    }

  /** Build-once zones copy of events clustered by event_id, for the
    * METADATA-ONLY aggregate head (its own root: [[zonesEventsEnsure]]
    * keys zones on ts, whose type drifts across testdata
    * regenerations — long/string zones are always supported).
    */
  def metaAggEnsure(spark: SparkSession, sfDir: String): String =
    // the `recipe` token now guards recipe drift (edit it when the
    // closure changes); the _v2 root is the pre-token rename kept for
    // plan-sha stability
    Tables.ensureBuilt(spark, "target/zones/events_meta_v2_", sfDir,
        recipe = "zones(event_id,event_type,user_id) cluster(event_id) files=24 v1") { root =>
      graft.io.Upsert.overwriteSnapshot(spark, root,
        Tables.events(spark, sfDir),
        zoneCols = Seq("event_id", "event_type", "user_id"),
        clusterBy = Seq("event_id"), filesTarget = 24)
    }

  /** Metadata-only aggregates: `count(*)`, `min`/`max`, `sum` and
    * `count(col)` over zone columns answer from the manifest's footer
    * counts and the zone sidecars' exact values (per-file non-null
    * counts + exact integral sums folded in BigInt) — the DSv2
    * complete aggregate pushdown plans a driver
    * [[org.apache.spark.sql.connector.read.LocalScan]]: ZERO tasks,
    * ZERO file opens (the canonical plan shows LocalTableScan, no
    * UpsertBucketScan). At 100 TB this is a catalog lookup instead of
    * a full-table scan — the Iceberg/Delta metadata-count shape. The
    * ORACLE recomputes the same aggregates over the RAW events table
    * in DuckDB — a green row proves the metadata answers are exact,
    * not bounds.
    */
  def aMetaAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = metaAggEnsure(spark, sfDir)
    graft.sources.UpsertBucketSource.read(spark, root).agg(
      count(lit(1)).as("row_ct"),
      min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"),
      min(col("event_type")).as("min_type"),
      max(col("event_type")).as("max_type"),
      sum(col("user_id")).as("sum_uid"),
      count(col("user_id")).as("ct_uid"))
  }

  /** Build-once events copy whose FILES align exactly to event_id
    * ranges of width 500 (an explicit partitioner, preserved by
    * overwriteSnapshot's clusterBy=Nil passthrough) with zone sidecars
    * — the layout where a range predicate's endpoints can land ON file
    * boundaries, so file-granular containment (VERDICT r9 #6) has
    * something to absorb. Returns the table root.
    */
  def metaAggRangedEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/zones/events_ranged_", sfDir,
        recipe = "range-aligned files W=500 zones(event_id,event_type,value_cents) v1") { root =>
      val base = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"))
      val w = 500L
      val maxId = base.agg(max("event_id")).head.getLong(0)
      val n = (maxId / w).toInt + 1
      val schema = base.schema
      val rdd = base.rdd.map(r => ((r.getLong(0) / w).toInt, r))
        .partitionBy(new org.apache.spark.Partitioner {
          override def numPartitions: Int = n
          override def getPartition(key: Any): Int = key.asInstanceOf[Int]
        }).values
      graft.io.Upsert.overwriteSnapshot(spark, root,
        spark.createDataFrame(rdd, schema),
        zoneCols = Seq("event_id", "event_type", "value_cents"))
    }

  /** Metadata aggregates UNDER A CONTAINED RANGE FILTER (VERDICT r9
    * #6): `WHERE event_id >= 500 AND event_id < 3000` over the
    * range-aligned table — every kept file's zone range lies fully
    * inside the predicate (and the dropped ones fully outside), so the
    * filter is absorbed by file pruning and count/sum/min/max still
    * answer from the manifest + sidecars: a LocalTableScan, ZERO
    * tasks, zero file opens, exactly like the unfiltered
    * [[aMetaAgg]]. A file straddling the range would refuse back to a
    * normal scan (spec-pinned) — exactness or refusal. The ORACLE
    * recomputes the same filtered aggregates over the raw events
    * table.
    */
  def aMetaAggFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    val root = metaAggRangedEnsure(spark, sfDir)
    graft.sources.UpsertBucketSource.read(spark, root)
      .filter(col("event_id") >= 500 && col("event_id") < 3000)
      .agg(
        count(lit(1)).as("row_ct"),
        sum(col("value_cents")).as("sum_cents"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        count(col("event_type")).as("type_ct"))
  }

  /** Build-once STANDARD `valueClusterBy(event_type)` table (VERDICT
    * r10 #2 — a production layout, not a bespoke one-file-per-type
    * copy): an initial [[graft.io.Upsert.merge]] records the cluster
    * property, a second correcting merge rewrites touched buckets, and
    * a file-count compaction folds them — every write route stages
    * files single-valued in `event_type` (one `__cv` leaf dir per
    * value), so the grouped metadata answer applies to the table as it
    * LIVES through merges and maintenance.
    */
  def metaAggGroupedEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/zones/events_bytype_", sfDir,
        recipe = "valueClusterBy(event_type) merge+merge+compact v2") { root =>
      val ev = Tables.events(spark, sfDir)
        .select(col("event_type"), col("event_id"),
          cents(col("value")).as("value_cents"))
        .withColumn("__v", lit(1L))
      graft.io.Upsert.merge(spark, root, ev.filter(col("event_id") % 5 =!= 0),
        pk = Seq("event_id"), versionCol = "__v",
        zoneCols = Seq("event_type", "event_id", "value_cents"),
        valueClusterBy = Seq("event_type"))
      graft.io.Upsert.merge(spark, root,
        ev.filter(col("event_id") % 5 === 0).withColumn("__v", lit(2L)),
        pk = Seq("event_id"), versionCol = "__v")
      graft.io.Upsert.compactBuckets(spark, root, pk = Seq("event_id"),
        maxFilesPerBucket = 1, bloom = false)
    }

  /** GROUPED metadata aggregates: `GROUP BY event_type` over a
    * STANDARD value-clustered table (merge + merge + compaction, not a
    * bespoke copy) — every file is single-valued and null-free in the
    * group column by the write-route invariant, so the per-group
    * count/sum/min/max fold straight from the manifest counts +
    * sidecars: a LocalTableScan, ZERO tasks, one FINAL row per group. The Iceberg/Delta metadata-count shape
    * extended to grouped rollups — at 100 TB, a per-partition-key
    * summary is a catalog lookup instead of a full scan + shuffle. The
    * ORACLE recomputes the grouped aggregates over the raw table;
    * interleaved/multi-valued/null-group layouts refuse back to the
    * scan (MetaAggSpec).
    */
  def aMetaAggGrouped(spark: SparkSession, sfDir: String): DataFrame = {
    val root = metaAggGroupedEnsure(spark, sfDir)
    graft.sources.UpsertBucketSource.read(spark, root)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("row_ct"),
        sum(col("value_cents")).as("sum_cents"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
  }

  /** Top-N scan pushdown over the clustered zones table: `ORDER BY
    * event_id DESC LIMIT 50` keeps only the files whose zone range can
    * intersect the true top 50 (a counting bound over the sidecars'
    * non-null counts — sound superset, Spark's own TopN re-sorts the
    * kept rows). The canonical plan pins the pushed shape
    * (`topn=event_id DESC … files=a/b` with a < b). At 100 TB "the
    * newest 50 rows of a time-clustered table" reads one file instead
    * of scheduling the fleet. The ORACLE recomputes the same top-50
    * over the raw events table in DuckDB — event_id is unique, so the
    * row SET is deterministic.
    */
  def aZonesTopn(spark: SparkSession, sfDir: String): DataFrame = {
    val root = metaAggEnsure(spark, sfDir)
    graft.sources.UpsertBucketSource.read(spark, root)
      .orderBy(col("event_id").desc).limit(50)
      .select(col("event_id"), col("event_type"), col("user_id"))
  }

  /** Build-once (source-keyed on the events files' metadata) bucketed+
    * bloomed [[graft.io.Upsert]] copy of the events table keyed by
    * event_id — the serving layout behind [[bloomPointLookup]]. Returns
    * the table root.
    */
  def bloomEventsEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/blooms/events_pk_", sfDir,
        recipe = "merge pk(event_id) bloom v1") { root =>
      graft.io.Upsert.merge(spark, root,
        Tables.events(spark, sfDir).withColumn("__v", lit(1L)),
        pk = Seq("event_id"), versionCol = "__v", bloom = true)
    }

  /** Build-once (source-keyed) two-generation [[graft.io.Upsert]] copy
    * of events for [[jSnapshotDiff]]: gen A = the raw table; gen B = A
    * merged with a deterministic correction batch (every event_id
    * divisible by 97 gets value+1). Returns (root, genA, genB).
    */
  def snapshotDiffEnsure(spark: SparkSession, sfDir: String): (String, Long, Long) = {
    val root = Tables.ensureBuilt(spark, "target/spj/events_diff_", sfDir,
        recipe = "two-gen merge pk(event_id) corrections%97 v1") { root =>
      val ev = Tables.events(spark, sfDir)
      graft.io.Upsert.merge(spark, root, ev.withColumn("__v", lit(1L)),
        pk = Seq("event_id"), versionCol = "__v")
      val batch = ev.filter(col("event_id") % 97 === 0)
        .withColumn("value", col("value") + lit(1.0))
        .withColumn("__v", lit(2L))
      graft.io.Upsert.merge(spark, root, batch,
        pk = Seq("event_id"), versionCol = "__v")
    }
    val gens = graft.io.Upsert.manifestGens(spark, root)
    (root, gens.head, gens.last)
  }

  /** Snapshot diff between two MVCC generations of the SAME Upsert
    * table as a storage-partitioned join: both sides are read through
    * [[graft.sources.UpsertBucketSource]], which reports the bucket
    * placement to the planner, so the full-outer PK join that computes
    * the diff plans with ZERO exchange — neither snapshot is shuffled
    * (UpsertSpjSpec pins the plan). This is the "what changed between
    * yesterday's and today's table" primitive (Delta CDF / Iceberg
    * changelog role): at 100 TB the diff of two table versions costs
    * one co-located pass, not two table-wide shuffles. The null-safe
    * value comparison also surfaces inserts/deletes (absent here by
    * construction); the ORACLE recomputes the correction batch
    * definition over the raw table, so a green row proves the merge
    * touched exactly the intended keys and the diff lost none.
    */
  def jSnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val (root, genOld, genNew) = snapshotDiffEnsure(spark, sfDir)
    val a = graft.sources.UpsertBucketSource.read(spark, root, Some(genOld)).as("a")
    val b = graft.sources.UpsertBucketSource.read(spark, root, Some(genNew)).as("b")
    a.join(b,
        col("a.event_id") === col("b.event_id") &&
          col("a.__bucket") === col("b.__bucket"), "fullouter")
      .filter(!(col("a.value") <=> col("b.value")))
      .select(
        coalesce(col("a.event_id"), col("b.event_id")).as("event_id"),
        cents(col("a.value")).as("old_value_cents"),
        cents(col("b.value")).as("new_value_cents"))
  }

  /** Point lookup served by the full skipping stack — the HBase-Get
    * shape of the reference's dim reads (DimHBaseSinkFunction) on bare
    * parquet: keys hash to buckets DRIVER-side (no job), the manifest
    * narrows to those buckets' files, Bloom sidecars narrow to the
    * files that might hold a key, and only that explicit file list
    * enters the plan. At 100 TB a 4-key Get reads a handful of files
    * out of hundreds of thousands (UpsertSpec pins zero bloom false
    * negatives; the companion spec pins candidate files ≪ total for
    * THIS table). The ORACLE runs the same IN-list over the raw events
    * table, so a green row proves the narrowed read loses nothing.
    * Keys are chosen < 1000 so they exist at every scale factor.
    */
  def bloomPointLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val root = bloomEventsEnsure(spark, sfDir)
    graft.io.Upsert.lookup(spark, root, "event_id",
        Seq("17", "257", "601", "911"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        cents(col("value")).as("value_cents"))
  }

  /** Zone-map range serving — a one-day slice of the 30-day events span
    * answered from a ts-clustered zones-enabled Upsert snapshot via
    * [[graft.io.Upsert.readRange]]: the driver prunes the manifest's
    * FILE LIST by the `_zones.tsv` sidecars before any task launches
    * (~1/30th of files survive; ZonesSpec pins files_kept ≪ files_total
    * for this exact table). At 100 TB this is the difference between
    * opening hundreds of thousands of footers and a driver-side
    * metadata prune — the Delta/Iceberg column-stats role on bare
    * parquet. The ORACLE runs the same closed-range predicate over the
    * RAW events table in DuckDB, so a green row proves the pruned read
    * is exact, never a superset/subset.
    */
  def zonesDateRange(spark: SparkSession, sfDir: String): DataFrame = {
    val root = zonesEventsEnsure(spark, sfDir)
    // Instants, not Timestamp.valueOf: the latter parses in the JVM
    // default tz, which the driver does not pin (sessions pin UTC).
    val lo = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-08T00:00:00Z"))
    val hi = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-09T00:00:00Z"))
    graft.io.Upsert.readRange(spark, root, "ts", Some(lo), Some(hi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ev_ct"),
        sum(cents(col("value"))).as("value_cents"),
        countDistinct(col("user_id")).as("users"))
  }

  /** Build-once serving copy of events mutated by ONE SQL `MERGE INTO`
    * through the catalog (deterministic three-action statement:
    * matched evens of `event_id % 89 == 0` update `value + 2`, matched
    * odds DELETE, and a synthetic not-matched set INSERTs under
    * `event_id + 10^12`). Marker-gated so repeated runs serve the
    * already-mutated table. Returns the table root.
    */
  def sqlMergeDmlEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/events_merge_", sfDir,
        recipe = "sql-merge evens-update odds-delete inserts+1e12 v1") { root =>
      val ev = Tables.events(spark, sfDir)
      graft.io.Upsert.merge(spark, root, ev.withColumn("__v", lit(1L)),
        pk = Seq("event_id"), versionCol = "__v")
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      val src = ev.filter(col("event_id") % 89 === 0)
        .select(col("event_id").as("s_id"),
          (col("event_id") % 2 === 1).as("s_del"))
        .unionByName(
          ev.filter(col("event_id") % 1013 === 0)
            .select((col("event_id") + lit(1000000000000L)).as("s_id"),
              lit(false).as("s_del")))
      val view = "dml_src_" + root.replaceAll("[^A-Za-z0-9]+", "_")
      src.createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING $view s ON t.event_id = s.s_id
            WHEN MATCHED AND s.s_del THEN DELETE
            WHEN MATCHED THEN UPDATE SET value = t.value + 2
            WHEN NOT MATCHED THEN INSERT (event_id, user_id, ts, event_type, value, __v)
              VALUES (s.s_id, 0, TIMESTAMP '2024-01-01 00:00:00', 'synthetic', 42.0, 1)""")
    }

  /** The affected slice of the SQL-MERGE-mutated table: updated evens
    * (`value + 2`), surviving proof that odds were deleted (absent
    * rows), and the inserted synthetic keys. The ORACLE recomputes the
    * three actions' definitions over the RAW events table in DuckDB —
    * a green row proves the SQL row-level write (executor-staged delta
    * + bucket-pruned apply) changed exactly the intended rows.
    */
  def jSqlMergeDml(spark: SparkSession, sfDir: String): DataFrame = {
    val root = sqlMergeDmlEnsure(spark, sfDir)
    graft.io.Upsert.read(spark, root)
      .filter(col("event_id") % 89 === 0 || col("event_id") >= 1000000000000L)
      .select(col("event_id"), col("event_type"), cents(col("value")).as("value_cents"))
  }

  /** Build-once table mutated by ONE three-clause SQL MERGE (VERDICT
    * r12 #3 — `WHEN NOT MATCHED BY SOURCE`, the full MERGE matrix a SQL
    * user reaches after INSERT/UPDATE/DELETE): matched evens update,
    * matched odds delete, unmatched source rows insert, and the target
    * rows the SOURCE DOESN'T COVER are swept in the same statement —
    * %91 orphans deleted, %97 orphans re-labelled 'dormant'. Clause
    * order is load-bearing (first match wins), so the oracle encodes
    * the same precedence explicitly.
    */
  def sqlMerge3wayEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/events_merge3_", sfDir,
        recipe = "sql-merge 3way upd%89even del%89odd ins%1013 bysrc-del%91 bysrc-dormant%97 v1") { root =>
      val ev = Tables.events(spark, sfDir)
      graft.io.Upsert.merge(spark, root, ev.withColumn("__v", lit(1L)),
        pk = Seq("event_id"), versionCol = "__v")
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      val src = ev.filter(col("event_id") % 89 === 0)
        .select(col("event_id").as("s_id"),
          (col("event_id") % 2 === 1).as("s_del"))
        .unionByName(
          ev.filter(col("event_id") % 1013 === 0)
            .select((col("event_id") + lit(1000000000000L)).as("s_id"),
              lit(false).as("s_del")))
      val view = "dml3_src_" + root.replaceAll("[^A-Za-z0-9]+", "_")
      src.createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING $view s ON t.event_id = s.s_id
            WHEN MATCHED AND s.s_del THEN DELETE
            WHEN MATCHED THEN UPDATE SET value = t.value + 2
            WHEN NOT MATCHED THEN INSERT (event_id, user_id, ts, event_type, value, __v)
              VALUES (s.s_id, 0, TIMESTAMP '2024-01-01 00:00:00', 'synthetic', 42.0, 1)
            WHEN NOT MATCHED BY SOURCE AND t.event_id % 91 = 0 THEN DELETE
            WHEN NOT MATCHED BY SOURCE AND t.event_id % 97 = 0 THEN
              UPDATE SET event_type = 'dormant'""")
    }

  /** The affected slice of the three-clause MERGE: updated matched
    * evens, the source-absent sweep's survivors ('dormant' %97 rows,
    * %91 rows gone), and the inserted synthetics. The ORACLE recomputes
    * all five clauses' definitions (with their precedence) over the raw
    * events table in DuckDB.
    */
  def jSqlMerge3way(spark: SparkSession, sfDir: String): DataFrame = {
    val root = sqlMerge3wayEnsure(spark, sfDir)
    graft.io.Upsert.read(spark, root)
      .filter(col("event_id") % 89 === 0 || col("event_id") % 91 === 0 ||
        col("event_id") % 97 === 0 || col("event_id") >= 1000000000000L)
      .select(col("event_id"), col("event_type"), cents(col("value")).as("value_cents"))
  }

  /** Build-once STREAMED DWS aggregate: the fact table publishes three
    * change-feed waves (insert-all, correction, deletes) through
    * [[graft.io.Upsert.merge]] with `changeLog = true`, and the
    * aggregate is maintained by SUBSCRIBING to the feed —
    * `readStream.format(ChangeFeedSource)` folded by
    * [[graft.rtdw.IncrementalDws.streaming]] (Trigger.AvailableNow,
    * awaited). Returns the dws dir.
    */
  def dwsStreamEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/stream_dws_", sfDir,
        recipe = "stream-dws three-wave fold v1") { base =>
      val fact = s"$base/fact"
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"), col("value"))
      def wave(df: DataFrame, v: Long): Unit =
        graft.io.Upsert.merge(spark, fact,
          df.withColumn("__v", lit(v)),
          pk = Seq("event_id"), versionCol = "__v",
          deleteFlagCol = Some("op"), changeLog = true)
      wave(ev.withColumn("op", lit("insert")), 1L)
      wave(ev.filter(col("event_id") % 97 === 0)
        .withColumn("value_cents", cents(col("value") + 1))
        .withColumn("op", lit("update")), 2L)
      wave(ev.filter(col("event_id") % 101 === 0)
        .withColumn("op", lit("delete")), 3L)
      val q = graft.rtdw.IncrementalDws.streaming(spark, fact, s"$base/dws",
        groupCols = Seq("event_type"), sumCols = Seq("value_cents"),
        checkpointDir = s"$base/ckpt")
      q.awaitTermination(300000)
    } + "/dws"

  /** The streamed DWS aggregate, graded: per-type Σ cents + row count
    * after the three retract-stream waves. The ORACLE recomputes the
    * waves' NET effect over the raw events table (corrections replace,
    * deletes vanish) — a green row proves the subscription fold
    * (retract −1 / add +1 telescoping across restarts and replays)
    * equals a full recompute.
    */
  def dwsStreamFold(spark: SparkSession, sfDir: String): DataFrame = {
    val dws = dwsStreamEnsure(spark, sfDir)
    graft.rtdw.IncrementalDws.current(spark, dws).get
      .select(col("event_type"), col("value_cents"), col("row_ct"))
  }

  /** Build-once STREAMED DWS aggregate over a MERGE-ON-READ fact
    * (VERDICT r10 #5): the same three waves land as O(batch) delta
    * appends — the fact never produces a second feed, its delta
    * batches ARE the change log — and the aggregate subscribes through
    * [[graft.sources.MorChangeFeedSource]], each micro-batch's upsert
    * rows turned into retract/add pairs against the pinned snapshots
    * at its batch boundaries ([[graft.rtdw.MorChangeFeed]]) and folded
    * by [[graft.rtdw.IncrementalDws.streamingMor]]. A compaction lands
    * mid-subscription. Returns the dws dir.
    */
  def dwsMorStreamEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/stream_dws_mor_", sfDir,
        // v2: rebuilt through the r12 single-pass boundary images +
        // touched-bucket pruning so the driver's oracle gate exercises
        // the CURRENT derivation, not a cached r11 fold
        recipe = "mor-feed dws three-wave fold + midstream compact v2") { base =>
      val fact = s"$base/fact"
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"), col("value"))
      def wave(df: DataFrame, v: Long, op: String): Unit =
        graft.io.MergeOnRead.merge(spark, fact,
          df.withColumn("__v", lit(v)).withColumn("op", lit(op))
            .drop("value"))
      wave(ev, 1L, "insert")
      graft.io.MergeOnRead.recordContract(spark, fact, Seq("event_id"), "__v",
        Some("op"), graft.io.Upsert.DefaultNumBuckets)
      def drain(): Unit = {
        val q = graft.rtdw.IncrementalDws.streamingMor(spark, fact, s"$base/dws",
          groupCols = Seq("event_type"), sumCols = Seq("value_cents"),
          checkpointDir = s"$base/ckpt", maxBatchesPerTrigger = Some(1))
        q.awaitTermination(300000); ()
      }
      drain() // bootstrap fold of batch 0
      wave(ev.filter(col("event_id") % 97 === 0)
        .withColumn("value_cents", cents(col("value") + 1)), 2L, "update")
      // compaction between the correction landing and its consumption:
      // the subscriber's pre/post images must resolve through the
      // retained snapshots, not the live delta list
      graft.io.MergeOnRead.compact(spark, fact, Seq("event_id"), "__v",
        deleteFlagCol = Some("op"))
      wave(ev.filter(col("event_id") % 101 === 0), 3L, "delete")
      drain()
    } + "/dws"

  /** The MOR-subscribed DWS aggregate, graded: same oracle as
    * `dws_stream_fold` (same net waves) — green proves the delta-log
    * subscription (batch-id offsets, pinned pre/post image resolution,
    * signed fold, watermark-gated replay, mid-stream compaction)
    * equals a full recompute.
    */
  def dwsMorStreamFold(spark: SparkSession, sfDir: String): DataFrame = {
    val dws = dwsMorStreamEnsure(spark, sfDir)
    graft.rtdw.IncrementalDws.current(spark, dws).get
      .select(col("event_type"), col("value_cents"), col("row_ct"))
  }

  /** Build-once DEEP-BACKLOG drain fixture (VERDICT r13 #6): a MOR
    * fact with a 21-batch delta backlog (insert-all + 20 single-residue
    * correction waves, each its own batch) drained by ONE bounded
    * AvailableNow subscription — cap=5 batches per trigger WITH
    * drain-aware compaction every 2 triggers, so the driver's DuckDB
    * gate pins drain == one-shot == full recompute THROUGH the r14
    * consumed-prefix folding, not just the spec. Waves w ∈ [2, 21]
    * touch exactly the keys `event_id % 23 == w` (disjoint residues —
    * each key corrected at most once, so the final state is closed-form
    * in SQL). Returns the DWS dir.
    */
  def dwsMorDrainEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/stream_dws_mordrain_", sfDir,
        recipe = "mor-feed bounded drain cap5 compactEvery2 21-batch backlog v1") { base =>
      val fact = s"$base/fact"
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"), col("value"))
      def wave(df: DataFrame, v: Long, op: String): Unit =
        graft.io.MergeOnRead.merge(spark, fact,
          df.withColumn("__v", lit(v)).withColumn("op", lit(op))
            .drop("value"))
      wave(ev, 1L, "insert")
      graft.io.MergeOnRead.recordContract(spark, fact, Seq("event_id"), "__v",
        Some("op"), graft.io.Upsert.DefaultNumBuckets)
      (2L to 21L).foreach { w =>
        wave(ev.filter(col("event_id") % 23 === lit(w))
          .withColumn("value_cents", cents(col("value")) + lit(w)), w, "update")
      }
      val q = graft.rtdw.IncrementalDws.streamingMor(spark, fact, s"$base/dws",
        groupCols = Seq("event_type"), sumCols = Seq("value_cents"),
        checkpointDir = s"$base/ckpt", maxBatchesPerTrigger = Some(5),
        compactEveryTriggers = Some(2))
      q.awaitTermination(300000)
      // the pairing runs on the shared maintenance thread (r15): wait
      // for the signaled folds before asserting on the watermark
      require(graft.rtdw.IncrementalDws.awaitPairedCompacts(fact),
        "paired compactions did not drain in time")
      // the pairing must have folded the consumed prefix as it drained
      // — a fixture-time invariant so a regression fails the BUILD, not
      // just a slow probe
      val upto = graft.io.MergeOnRead.compactedUpto(spark, fact)
      require(upto >= 15L,
        s"drain-aware compaction did not advance with the drain (upto=$upto)")
      ()
    } + "/dws"

  /** The bounded-drain DWS aggregate, graded against a closed-form
    * recompute of the waves' net effect over raw events.
    */
  def dwsMorDrainFold(spark: SparkSession, sfDir: String): DataFrame = {
    val dws = dwsMorDrainEnsure(spark, sfDir)
    graft.rtdw.IncrementalDws.current(spark, dws).get
      .select(col("event_type"), col("value_cents"), col("row_ct"))
  }

  /** Build-once MERGE-ON-READ table over events: insert-all lands as
    * delta 0 and compacts into the base (recording the contract),
    * then corrections for %97 keys and deletes of %101 keys stay as
    * LIVE deltas — so the read must resolve base ∪ deltas, not just
    * scan a folded table. Returns the MOR root.
    */
  def morSqlEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/mor_sql_", sfDir,
        recipe = "mor three-wave lww+delete v1") { root =>
      val dir = s"$root/t"
      val ev = Tables.events(spark, sfDir)
      def wave(df: DataFrame, cts: Column, v: Long, op: String) =
        graft.io.MergeOnRead.merge(spark, dir,
          df.select(col("event_id"), col("event_type"),
            cts.as("value_cents"), lit(v).as("__v"), lit(op).as("op")))
      wave(ev, cents(col("value")), 1L, "insert")
      graft.io.MergeOnRead.compact(spark, dir, Seq("event_id"), "__v",
        deleteFlagCol = Some("op"), numBuckets = 16)
      wave(ev.filter(col("event_id") % 97 === 0),
        cents(col("value") + 1), 2L, "update")
      wave(ev.filter(col("event_id") % 101 === 0),
        cents(col("value")), 3L, "delete")
    } + "/t"

  /** SQL aggregate straight over the MOR root through the catalog —
    * the MorReadRule substitution resolves base ∪ live deltas inside
    * the query plan. The ORACLE recomputes the waves' net effect over
    * the raw events table (corrections replace, deletes vanish): a
    * green row proves the SQL-visible read-time resolution equals a
    * full recompute.
    */
  def morSqlAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morSqlEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(
      s"""SELECT event_type, SUM(value_cents) AS value_cents,
                 COUNT(*) AS row_ct
          FROM graft.`$dir` GROUP BY event_type""")
  }

  /** Build-once MOR table mutated entirely through SQL row-level DML
    * (VERDICT r9 #3): insert-all compacts into the base recording the
    * contract, then UPDATE (+100 cents on %97 keys), DELETE (%101-not-
    * %97 keys), and a MERGE INTO (SET cents+7 on %103-not-%101 keys;
    * INSERT a +10^12-keyed synthetic set for %251 keys) each land as
    * ONE O(batch) delta append — batch ids 1, 2, 3; the base is never
    * rewritten. Returns the MOR root.
    */
  def morDmlEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/mor_dml_", sfDir,
        recipe = "mor sql-dml update%97 delete%101 merge%103+%251 v1") { root =>
      val dir = s"$root/t"
      val ev = Tables.events(spark, sfDir)
      graft.io.MergeOnRead.merge(spark, dir,
        ev.select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"),
          lit(1L).as("__v"), lit("insert").as("op")))
      graft.io.MergeOnRead.compact(spark, dir, Seq("event_id"), "__v",
        deleteFlagCol = Some("op"), numBuckets = 16)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.sql(s"""UPDATE graft.`$dir` SET value_cents = value_cents + 100
                    WHERE event_id % 97 = 0""")
      spark.sql(s"""DELETE FROM graft.`$dir`
                    WHERE event_id % 101 = 0 AND event_id % 97 != 0""")
      val view = "mor_dml_src_" + dir.replaceAll("[^A-Za-z0-9]+", "_")
      ev.filter(col("event_id") % 103 === 0 && col("event_id") % 101 =!= 0)
        .select(col("event_id").as("sid"), col("event_type").as("stype"),
          (cents(col("value")) + 7).as("amt"))
        .unionByName(ev.filter(col("event_id") % 251 === 0)
          .select((col("event_id") + lit(1000000000000L)).as("sid"),
            col("event_type").as("stype"),
            (cents(col("value")) + 11).as("amt")))
        .createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO graft.`$dir` t USING $view s ON t.event_id = s.sid
            WHEN MATCHED THEN UPDATE SET value_cents = s.amt
            WHEN NOT MATCHED THEN
              INSERT (event_id, event_type, value_cents, __v, op)
              VALUES (s.sid, s.stype, s.amt, 1, 'insert')""")
    } + "/t"

  /** Build-once MOR table fed by plain SQL `INSERT INTO` (VERDICT r11
    * #2 — the first statement a SQL user writes, oracled end-to-end):
    * insert-all compacts into the base recording the contract, then ONE
    * INSERT statement lands ver-2 corrections (+100 cents on %7 keys)
    * and brand-new synthetic keys (+10^12-keyed, %31) as a single
    * O(batch) delta append — and the SAME statement is then REPLAYED
    * VERBATIM. INSERT here is the recorded LWW merge, not an
    * append: the replay's rows tie on (pk, version) with identical
    * content, so the resolved table is unchanged — the oracle's green
    * hash proves the idempotence, not just a spec assertion.
    */
  def morInsertEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/mor_insert_", sfDir,
        recipe = "mor sql-insert %7-correct +%31-synthetic, replayed v1") { root =>
      val dir = s"$root/t"
      val ev = Tables.events(spark, sfDir)
      graft.io.MergeOnRead.merge(spark, dir,
        ev.select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"),
          lit(1L).as("__v"), lit("insert").as("op")))
      graft.io.MergeOnRead.compact(spark, dir, Seq("event_id"), "__v",
        deleteFlagCol = Some("op"), numBuckets = 16)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      val view = "mor_ins_src_" + dir.replaceAll("[^A-Za-z0-9]+", "_")
      ev.createOrReplaceTempView(view)
      val insert =
        s"""INSERT INTO graft.`$dir` (event_id, event_type, value_cents, __v, op)
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 100) AS BIGINT) + 100,
                   CAST(2 AS BIGINT), 'insert'
            FROM $view WHERE event_id % 7 = 0
            UNION ALL
            SELECT event_id + 1000000000000, event_type,
                   CAST(FLOOR(value * 100) AS BIGINT) + 13,
                   CAST(1 AS BIGINT), 'insert'
            FROM $view WHERE event_id % 31 = 0"""
      spark.sql(insert)
      spark.sql(insert) // replayed verbatim: an LWW tie with equal content
    } + "/t"

  /** Aggregate over the SQL-INSERT-fed MOR root; the ORACLE recomputes
    * the net state from raw events — a green row proves the INSERT
    * upserted the %7 keys at the higher version, added the synthetic
    * keys exactly once, and that the verbatim replay changed nothing.
    */
  def morSqlInsert(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morInsertEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(
      s"""SELECT event_type, SUM(value_cents) AS value_cents,
                 COUNT(*) AS row_ct
          FROM graft.`$dir` GROUP BY event_type""")
  }

  /** Build-once MOR table evolved entirely through SQL ALTER TABLE
    * (round-12: MOR ALTER parity): insert-all (with a throwaway `src`
    * column) compacts into the base recording the contract; `ALTER
    * TABLE ADD COLUMNS (note STRING)` widens the DECLARED schema
    * metadata-only (no file touched); an INSERT then lands ver-2
    * corrections carrying the new column for %13 keys as one O(batch)
    * delta append; `ALTER TABLE DROP COLUMN src` tombstones the column
    * — every batch on disk still holds it, reads reconcile it away.
    */
  def morAlterEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/mor_alter_", sfDir,
        recipe = "mor sql-alter add-note %13-correct+50 drop-src v1") { root =>
      val dir = s"$root/t"
      val ev = Tables.events(spark, sfDir)
      graft.io.MergeOnRead.merge(spark, dir,
        ev.select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"), lit("raw").as("src"),
          lit(1L).as("__v"), lit("insert").as("op")))
      graft.io.MergeOnRead.compact(spark, dir, Seq("event_id"), "__v",
        deleteFlagCol = Some("op"), numBuckets = 16)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (note STRING)")
      val view = "mor_alter_src_" + dir.replaceAll("[^A-Za-z0-9]+", "_")
      ev.createOrReplaceTempView(view)
      spark.sql(
        s"""INSERT INTO graft.`$dir`
              (event_id, event_type, value_cents, src, __v, op, note)
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 100) AS BIGINT) + 50,
                   'raw', CAST(2 AS BIGINT), 'insert', 'adj'
            FROM $view WHERE event_id % 13 = 0""")
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN src")
    } + "/t"

  /** Build-once CoW table evolved through `ALTER TABLE ... RENAME
    * COLUMN` (VERDICT r12 #2 — column mapping via stable parquet field
    * ids): insert-all records the table, the SQL RENAME flips `value`
    * to `amount` in ONE metadata commit (no file rewritten — reads
    * resolve the old files' column by its field id), and an INSERT
    * then lands ver-2 corrections for %11 keys UNDER THE NEW NAME as a
    * normal LWW merge — old-name and new-name files serve one column.
    */
  def sqlRenameEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/events_rename_", sfDir,
        recipe = "cow sql-rename value->amount correct%11+5 v1") { root =>
      val ev = Tables.events(spark, sfDir)
      graft.io.Upsert.merge(spark, root, ev.withColumn("__v", lit(1L)),
        pk = Seq("event_id"), versionCol = "__v")
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN value TO amount")
      // the post-rename INSERT resolves the touched buckets' current
      // rows by id, so it needs the matching conf: runtime-scoped flip
      // (the write is eager; the restore happens after it commits)
      val prior = spark.conf.getOption("spark.sql.parquet.fieldId.read.enabled")
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      try {
        val view = "rename_src_" + root.replaceAll("[^A-Za-z0-9]+", "_")
        ev.createOrReplaceTempView(view)
        spark.sql(
          s"""INSERT INTO graft.`$root` (event_id, user_id, ts, event_type, amount, __v)
              SELECT event_id, user_id, ts, event_type, value + 5, CAST(2 AS BIGINT)
              FROM $view WHERE event_id % 11 = 0""")
      } finally {
        prior match {
          case Some(v) => spark.conf.set("spark.sql.parquet.fieldId.read.enabled", v)
          case None => spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
        }
      }
    }

  /** Build-once CoW CHANGELOG table renamed mid-history (VERDICT r14
    * #4's CoW twin): wave 1 inserts all events under `value_cents`
    * (feed batch 0 lands in the PRE-rename generation, its feed files
    * physically carrying the old name), the RENAME flips the contract,
    * and wave 2 corrects %11 keys under `amount_cents` (feed batch 1).
    * Consumers reading the whole feed therefore cross an era boundary.
    */
  def renameFeedEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/events_rename_feed_", sfDir,
        recipe = "cow changeLog rename value_cents->amount_cents correct%11+5 v1") { root =>
      val ev = Tables.events(spark, sfDir)
      graft.io.Upsert.merge(spark, root,
        ev.select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"))
          .withColumn("__v", lit(1L)),
        pk = Seq("event_id"), versionCol = "__v", changeLog = true)
      graft.io.Upsert.renameColumn(spark, root, "value_cents", "amount_cents")
      // the post-rename merge resolves the touched buckets' current
      // rows by field id — runtime-scoped conf flip, like
      // sqlRenameEnsure (the merge is eager; restore after it commits)
      val prior = spark.conf.getOption("spark.sql.parquet.fieldId.read.enabled")
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      try
        graft.io.Upsert.merge(spark, root,
          ev.filter(col("event_id") % 11 === 0)
            .select(col("event_id"), col("event_type"),
              (cents(col("value")) + 5).as("amount_cents"))
            .withColumn("__v", lit(2L)),
          pk = Seq("event_id"), versionCol = "__v", changeLog = true)
      finally prior match {
        case Some(v) => spark.conf.set("spark.sql.parquet.fieldId.read.enabled", v)
        case None => spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
      }
    }

  /** Signed fold of the WHOLE change feed across the rename boundary
    * (VERDICT r14 #4): batch 0's feed files live in the PRE-rename
    * generation under the old physical name and are served through the
    * feed's per-era read supports translated to `amount_cents`; batch
    * 1's retract/add pairs correct the %11 keys. The fold telescopes
    * to the net current state, which the ORACLE recomputes from raw
    * events — green proves pre-rename feed generations are readable
    * and EXACT through the era path, with no conf tax on the consumer.
    */
  def jRenameFeedFold(spark: SparkSession, sfDir: String): DataFrame = {
    val root = renameFeedEnsure(spark, sfDir)
    val (changes, _) = graft.io.ChangeFeed.since(spark, root, -1L).get
    val sign = when(col(graft.io.ChangeFeed.ChangeCol) === "add", lit(1L))
      .otherwise(lit(-1L))
    changes.groupBy(col("event_type"))
      .agg(sum(col("amount_cents") * sign).as("amount_cents"),
        sum(sign).as("row_ct"))
  }

  /** The renamed table's slice: %11 keys corrected post-rename (new
    * files carry `amount` physically) and %13 keys untouched (their
    * files still carry `value` physically — the field id resolves
    * them). The ORACLE recomputes both over raw events; a green hash
    * proves the rename is pure metadata with no value drift.
    */
  private val renameSessions =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()

  def jSqlRename(spark: SparkSession, sfDir: String): DataFrame = {
    val root = sqlRenameEnsure(spark, sfDir)
    // SCOPED-CONF head (the CBO-head pattern): field-id matching is a
    // session conf Spark propagates into every parquet reader, and it
    // taxes every scan ~20%, so GraftSession leaves it off — the
    // renamed table is read through a CHILD session that opts in,
    // paying the cost exactly where the feature is used
    val s2 = renameSessions.computeIfAbsent(sfDir, _ => {
      val s = spark.newSession()
      Seq("spark.sql.session.timeZone", "spark.sql.shuffle.partitions",
        "spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "spark.sql.requireAllClusterKeysForCoPartition")
        .foreach(k => spark.conf.getOption(k).foreach(s.conf.set(k, _)))
      s.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      s
    })
    s2.sql(
      s"""SELECT event_id, event_type,
                 CAST(FLOOR(amount * 100) AS BIGINT) AS amount_cents
          FROM graft.`$root`
          WHERE event_id % 11 = 0 OR event_id % 13 = 0""")
  }

  /** Build-once MOR root renamed through SQL ALTER (the contract's
    * physical→logical mapping): `value_cents` becomes `amount_cents`
    * metadata-only; an INSERT lands ver-2 corrections for %17 keys
    * under the NEW name (translated to the physical column at the
    * single write door), and old + new delta batches resolve as one
    * column.
    */
  def morRenameEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/mor_rename_", sfDir,
        // v2: rebuilt under r14 so the contract carries the rename's
        // schemaHistory entry (per-era time travel needs it)
        recipe = "mor sql-rename value_cents->amount_cents correct%17+9 v2") { root =>
      val dir = s"$root/t"
      val ev = Tables.events(spark, sfDir)
      graft.io.MergeOnRead.merge(spark, dir,
        ev.select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"),
          lit(1L).as("__v"), lit("insert").as("op")))
      graft.io.MergeOnRead.compact(spark, dir, Seq("event_id"), "__v",
        deleteFlagCol = Some("op"), numBuckets = 16)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN value_cents TO amount_cents")
      val view = "mor_rename_src_" + dir.replaceAll("[^A-Za-z0-9]+", "_")
      ev.createOrReplaceTempView(view)
      spark.sql(
        s"""INSERT INTO graft.`$dir`
              (event_id, event_type, amount_cents, __v, op)
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 100) AS BIGINT) + 9,
                   CAST(2 AS BIGINT), 'insert'
            FROM $view WHERE event_id % 17 = 0""")
    } + "/t"

  /** Aggregate over the renamed MOR root under the logical name; the
    * ORACLE recomputes the net state from raw events — green proves
    * pre-rename batches, the renamed declared schema, and post-rename
    * corrections resolve as one column with no value drift.
    */
  def morSqlRename(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morRenameEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(
      s"""SELECT event_type, SUM(amount_cents) AS amount_cents,
                 COUNT(*) AS row_ct
          FROM graft.`$dir` GROUP BY event_type""")
  }

  /** `VERSION AS OF 0` on the renamed MOR root — the PRE-rename era.
    * Per-version schema history (r14, VERDICT r13 #4) serves the
    * snapshot under its own era's name (`value_cents`, not the current
    * `amount_cents`) with the pre-correction content; the ORACLE
    * recomputes that state from raw events UNDER THE OLD NAME — green
    * proves MOR time travel is schema-versioned, CoW-parity.
    */
  def morRenameTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morRenameEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(
      s"""SELECT event_type, SUM(value_cents) AS value_cents,
                 COUNT(*) AS row_ct
          FROM graft.`$dir` VERSION AS OF 0 GROUP BY event_type""")
  }

  /** Build-once MOR root evolved through a THREE-step chain with a
    * delta batch between each step — ADD note (then %13 corrections at
    * v2 filling it), RENAME value_cents→amount_cents (then %19
    * corrections at v3), DROP note (then %23 corrections at v4) — so
    * every MID-chain version is a distinct (names, shape, content)
    * triple the per-version schema history (r14, VERDICT r13 #4) must
    * reproduce. Batch axis: 0 = insert-all (compacted), 1/2/3 = the
    * three correction batches; the history entries pin era boundaries
    * at watermarks 0, 1 and 2.
    */
  def morChainEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/mor_chain_", sfDir,
        recipe = "mor evolution chain add-note %13+3v2 rename-amount %19+5v3 drop-note %23+7v4 v1") { root =>
      val dir = s"$root/t"
      val ev = Tables.events(spark, sfDir)
      graft.io.MergeOnRead.merge(spark, dir,
        ev.select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"),
          lit(1L).as("__v"), lit("insert").as("op")))
      graft.io.MergeOnRead.compact(spark, dir, Seq("event_id"), "__v",
        deleteFlagCol = Some("op"), numBuckets = 16)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      val view = "mor_chain_src_" + dir.replaceAll("[^A-Za-z0-9]+", "_")
      ev.createOrReplaceTempView(view)
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (note STRING)")
      spark.sql(
        s"""INSERT INTO graft.`$dir`
              (event_id, event_type, value_cents, __v, op, note)
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 100) AS BIGINT) + 3,
                   CAST(2 AS BIGINT), 'insert', 'a2'
            FROM $view WHERE event_id % 13 = 0""")
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN value_cents TO amount_cents")
      spark.sql(
        s"""INSERT INTO graft.`$dir`
              (event_id, event_type, amount_cents, __v, op, note)
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 100) AS BIGINT) + 5,
                   CAST(3 AS BIGINT), 'insert', 'a3'
            FROM $view WHERE event_id % 19 = 0""")
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN note")
      spark.sql(
        s"""INSERT INTO graft.`$dir`
              (event_id, event_type, amount_cents, __v, op)
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 100) AS BIGINT) + 7,
                   CAST(4 AS BIGINT), 'insert'
            FROM $view WHERE event_id % 23 = 0""")
    } + "/t"

  /** MID-chain time travel on the three-evolution root (VERDICT r14
    * #4): `VERSION AS OF 1` must serve the era between ADD and RENAME
    * (old name `value_cents`, `note` present, content through batch 1)
    * and `VERSION AS OF 2` the era between RENAME and DROP (new name
    * `amount_cents`, `note` STILL present, content through batch 2) —
    * each under its own era's names and shape, never the current
    * contract's. The ORACLE recomputes both historical states from raw
    * events; green proves mid-chain eras are first-class, not just the
    * endpoints.
    */
  def morChainMidTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morChainEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(
      s"""SELECT 'v1' AS era, event_type,
                 SUM(value_cents) AS amount_cents,
                 COUNT(*) AS row_ct, COUNT(note) AS note_ct
          FROM graft.`$dir` VERSION AS OF 1 GROUP BY event_type
          UNION ALL
          SELECT 'v2' AS era, event_type,
                 SUM(amount_cents) AS amount_cents,
                 COUNT(*) AS row_ct, COUNT(note) AS note_ct
          FROM graft.`$dir` VERSION AS OF 2 GROUP BY event_type""")
  }

  /** Aggregate over the SQL-ALTERed MOR root, including `COUNT(note)`
    * of the column that exists only through ALTER ADD + the evolved
    * INSERT; the ORACLE recomputes the net state from raw events — a
    * green row proves the declared-schema reconciliation serves the
    * added column's values and the LWW corrections exactly.
    */
  def morSqlAlter(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morAlterEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(
      s"""SELECT event_type, SUM(value_cents) AS value_cents,
                 COUNT(*) AS row_ct, COUNT(note) AS note_ct
          FROM graft.`$dir` GROUP BY event_type""")
  }

  /** Build-once MOR root mutated by ONE three-clause SQL MERGE
    * (VERDICT r12 #3 — `WHEN NOT MATCHED BY SOURCE` over the delta
    * log): matched evens take the source amount, matched odds delete,
    * unmatched source rows insert synthetics, and target rows the
    * source doesn't cover sweep in the same statement — %107 orphans
    * delete (retraction rows carrying the matched version), %109
    * orphans get +1000 cents. Everything lands as ONE O(changes) delta
    * batch; the base is never rewritten.
    */
  def morMerge3wayEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/mor_merge3_", sfDir,
        recipe = "mor sql-merge 3way amt%103even del%103odd ins%251 bysrc-del%107 bysrc+1000%109 v1") { root =>
      val dir = s"$root/t"
      val ev = Tables.events(spark, sfDir)
      graft.io.MergeOnRead.merge(spark, dir,
        ev.select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"),
          lit(1L).as("__v"), lit("insert").as("op")))
      graft.io.MergeOnRead.compact(spark, dir, Seq("event_id"), "__v",
        deleteFlagCol = Some("op"), numBuckets = 16)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      val view = "mor_merge3_src_" + dir.replaceAll("[^A-Za-z0-9]+", "_")
      ev.filter(col("event_id") % 103 === 0)
        .select(col("event_id").as("sid"), col("event_type").as("stype"),
          (cents(col("value")) + 7).as("amt"))
        .unionByName(ev.filter(col("event_id") % 251 === 0)
          .select((col("event_id") + lit(1000000000000L)).as("sid"),
            col("event_type").as("stype"),
            (cents(col("value")) + 11).as("amt")))
        .createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO graft.`$dir` t USING $view s ON t.event_id = s.sid
            WHEN MATCHED AND s.sid % 2 = 1 THEN DELETE
            WHEN MATCHED THEN UPDATE SET value_cents = s.amt
            WHEN NOT MATCHED THEN
              INSERT (event_id, event_type, value_cents, __v, op)
              VALUES (s.sid, s.stype, s.amt, 1, 'insert')
            WHEN NOT MATCHED BY SOURCE AND t.event_id % 107 = 0 THEN DELETE
            WHEN NOT MATCHED BY SOURCE AND t.event_id % 109 = 0 THEN
              UPDATE SET value_cents = t.value_cents + 1000""")
    } + "/t"

  /** Aggregate over the three-clause-MERGEd MOR root; the ORACLE
    * recomputes all five clauses' net effect (with their first-match
    * precedence) over raw events in DuckDB — a green row proves the
    * source-absent sweep's deletes and updates landed through the same
    * O(changes) delta append as the matched clauses.
    */
  def morSqlMerge3way(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morMerge3wayEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(
      s"""SELECT event_type, SUM(value_cents) AS value_cents,
                 COUNT(*) AS row_ct
          FROM graft.`$dir` GROUP BY event_type""")
  }

  /** Aggregate over the SQL-DML-mutated MOR root; the ORACLE recomputes
    * the three statements' net effect over the raw events table — a
    * green row proves SQL UPDATE/DELETE/MERGE over the delta log equals
    * an imperative recompute.
    */
  def morSqlDml(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morDmlEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(
      s"""SELECT event_type, SUM(value_cents) AS value_cents,
                 COUNT(*) AS row_ct
          FROM graft.`$dir` GROUP BY event_type""")
  }

  /** BATCH CDC over the DML-mutated MOR root (round-12:
    * [[graft.rtdw.MorChangeFeed.changes]], the `table_changes` batch
    * form): the retract/add rows of delta range (1, 3] — the DELETE
    * and MERGE statements' net effect — folded as SIGNED per-type
    * deltas plus the raw change-row count. The ORACLE recomputes
    * `state@3 − state@1` from raw events: a green hash proves the
    * batch feed's signed fold equals the snapshot diff exactly
    * (inserts add-only, deletes retract-only, updates both).
    */
  def morChangesBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morDmlEnsure(spark, sfDir)
    val ch = graft.rtdw.MorChangeFeed.changes(spark, dir, 1L, 3L)
    val signed = when(col(graft.io.ChangeFeed.ChangeCol) === "add", lit(1L))
      .otherwise(lit(-1L))
    ch.groupBy("event_type").agg(
      sum(signed * col("value_cents")).as("d_cents"),
      sum(signed).as("d_rows"),
      count(lit(1)).as("change_rows"))
  }

  /** `VERSION AS OF 1` on the DML-mutated MOR root — the pinned
    * post-UPDATE, pre-DELETE snapshot, reconstructed from the
    * compaction watermark (upto=0) plus retained delta batch 1. The
    * ORACLE recomputes that intermediate state from raw events: a green
    * row proves MOR time travel serves the exact historical content,
    * not the current one.
    */
  def morTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = morDmlEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(
      s"""SELECT event_type, SUM(value_cents) AS value_cents,
                 COUNT(*) AS row_ct
          FROM graft.`$dir` VERSION AS OF 1 GROUP BY event_type""")
  }

  /** Build-once STREAMED-SINK table: three waves of command files
    * (insert-all ver 1, corrections for %97 keys ver 2, deletes of
    * %101-but-not-%97 keys ver 3) land in a staging dir, and a
    * `readStream.parquet` over it writes through
    * [[graft.sources.UpsertStreamSink]] — every micro-batch an LWW
    * merge with retract-capable `deleteFlagCol`, the epoch watermark
    * riding each manifest commit. The correction and delete key sets
    * are DISJOINT so convergence never depends on which epoch a file
    * lands in. Returns the sink table dir.
    */
  def streamSinkEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/stream_sink_", sfDir,
        recipe = "stream-sink three-wave upsert v1") { base =>
      val src = s"$base/src"
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"), col("value"))
      def wave(df: DataFrame, v: Long, op: String): Unit = {
        df.withColumn("__v", lit(v)).withColumn("op", lit(op))
          .coalesce(1).write.mode("append").parquet(src)
        Thread.sleep(50) // distinct file mod-times: waves stream in order
      }
      wave(ev, 1L, "upsert")
      wave(ev.filter(col("event_id") % 97 === 0)
        .withColumn("value_cents", cents(col("value") + 1)), 2L, "upsert")
      wave(ev.filter(col("event_id") % 101 === 0 && col("event_id") % 97 =!= 0),
        3L, "delete")
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // one epoch per wave file
        .parquet(src)
      val q = graft.sources.UpsertStreamSink.writer(stream.drop("value"),
        s"$base/t", pk = Seq("event_id"), versionCol = "__v",
        deleteFlagCol = Some("op"))
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(300000)
    } + "/t"

  /** The streamed-SINK table, graded: per-type Σ cents + row count
    * after the three command waves landed through
    * `writeStream.format(UpsertStreamSink)`. The ORACLE recomputes the
    * waves' net effect over the raw events table — green proves the
    * sink's epoch-merge machinery (executor-staged parquet, LWW +
    * delete resolution, epoch watermark in the manifest) equals a
    * batch recompute.
    */
  def streamSinkUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val tbl = streamSinkEnsure(spark, sfDir)
    graft.io.Upsert.read(spark, tbl)
      .groupBy(col("event_type"))
      .agg(sum(col("value_cents")).as("value_cents"),
        count(lit(1)).as("row_ct"))
  }

  /** Build-once MERGE-ON-READ streamed-sink table (VERDICT r10 #1):
    * the SAME three command waves as [[streamSinkEnsure]], but the
    * sink runs `mor=true` — each epoch lands as ONE O(batch) delta
    * append (the base is never rewritten, commit cost tracks the
    * batch), with a mid-stream [[graft.io.Maintenance.runMor]] fold
    * between waves 2 and 3 so the head also proves compaction racing a
    * live stream converges. Returns the MOR root.
    */
  def streamSinkMorEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/stream_sink_mor_", sfDir,
        recipe = "stream-sink-mor three-wave upsert + midstream fold v1") { base =>
      val src = s"$base/src"
      val dir = s"$base/t"
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"), col("value"))
      def wave(df: DataFrame, v: Long, op: String): Unit = {
        df.withColumn("__v", lit(v)).withColumn("op", lit(op))
          .coalesce(1).write.mode("append").parquet(src)
        Thread.sleep(50) // distinct file mod-times: waves stream in order
      }
      wave(ev, 1L, "upsert")
      wave(ev.filter(col("event_id") % 97 === 0)
        .withColumn("value_cents", cents(col("value") + 1)), 2L, "upsert")
      val schema = spark.read.parquet(src).schema
      def drain(): Unit = {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1") // one epoch per wave file
          .parquet(src)
        val q = graft.sources.UpsertStreamSink.writer(stream.drop("value"),
          dir, pk = Seq("event_id"), versionCol = "__v",
          deleteFlagCol = Some("op"), mor = true)
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination(300000)
        ()
      }
      drain() // waves 1-2 appended as delta batches 0-1
      // background maintenance folds the backlog into a base while the
      // pipeline is live (the stream resumes from its checkpoint next)
      graft.io.Maintenance.runMor(spark, dir, Seq("event_id"), "__v",
        deleteFlagCol = Some("op"),
        policy = graft.io.Maintenance.Policy(maxDeltaBatches = 0))
      wave(ev.filter(col("event_id") % 101 === 0 && col("event_id") % 97 =!= 0),
        3L, "delete")
      drain() // wave 3 appends against the compacted base
    } + "/t"

  /** The MOR streamed-sink table, graded: per-type Σ cents + row count
    * after three waves landed as O(batch) delta appends with a
    * compaction mid-stream. Same oracle as `k3_stream_sink_upsert`
    * (same net waves) — a green row proves the delta-append epoch
    * commit, the replay watermarks, the mid-stream fold, and the
    * base ∪ deltas LWW read all compose to a batch recompute.
    */
  def streamSinkMor(spark: SparkSession, sfDir: String): DataFrame = {
    val tbl = streamSinkMorEnsure(spark, sfDir)
    graft.io.MergeOnRead.read(spark, tbl, pk = Seq("event_id"),
      versionCol = "__v", deleteFlagCol = Some("op"))
      .groupBy(col("event_type"))
      .agg(sum(col("value_cents")).as("value_cents"),
        count(lit(1)).as("row_ct"))
  }

  /** Build-once DDL lifecycle, every step a SQL statement through the
    * catalog: `DROP TABLE IF EXISTS` (rebuild hygiene) → CTAS with the
    * `bucket(16, event_id)` placement transform → `ALTER TABLE ADD
    * COLUMNS` (metadata-only; every CTAS row surfaces NULL) →
    * `INSERT INTO` backfilling the %7 slice at a higher version (the
    * recorded LWW merge) → `ALTER TABLE DROP COLUMN value`
    * (tombstoned, no file rewrite). Returns the table root.
    */
  def ddlLifecycleEnsure(spark: SparkSession, sfDir: String): String =
    Tables.ensureBuilt(spark, "target/dml/ddl_ctas_", sfDir,
        recipe = "ddl ctas+add-cols+backfill%7+drop-col v1") { root =>
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.sql(s"DROP TABLE IF EXISTS graft.`$root`")
      val view = "ddl_ev_" + root.replaceAll("[^A-Za-z0-9]+", "_")
      Tables.events(spark, sfDir).createOrReplaceTempView(view)
      spark.sql(
        s"""CREATE TABLE graft.`$root`
            PARTITIONED BY (bucket(16, event_id))
            TBLPROPERTIES ('versionCol'='__v')
            AS SELECT event_id, event_type, value, CAST(1 AS BIGINT) AS __v
               FROM $view""")
      spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (value_cents BIGINT)")
      spark.sql(
        s"""INSERT INTO graft.`$root` (event_id, event_type, value, __v, value_cents)
            SELECT event_id, event_type, value, CAST(2 AS BIGINT),
                   CAST(FLOOR(value * 100) AS BIGINT)
            FROM $view WHERE event_id % 7 = 0""")
      spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN value")
    }

  /** DDL-lifecycle head: aggregate the table the SQL statements built.
    * The oracle recomputes the net state from the raw events table, so
    * a green row proves CTAS copied every row, ALTER ADD surfaced NULL
    * for pre-existing rows (ct vs ct_backfilled), and the INSERT
    * upserted exactly the %7 keys at the higher version. The dropped
    * `value` column is absent from the read schema by construction
    * (selecting it would fail analysis).
    */
  def ddlCtasLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ddlLifecycleEnsure(spark, sfDir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.table(s"graft.`$root`")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("row_ct"),
        count(col("value_cents")).as("backfilled_ct"),
        sum(col("value_cents")).as("backfilled_cents"))
  }
}
