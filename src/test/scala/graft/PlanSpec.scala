package graft

/** Plan-shape assertions: the properties that make these queries scale
  * (pushdown, pruning, broadcast strategy, codegen) are pinned here so
  * a refactor that silently degrades the physical plan fails the build,
  * not the 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false") // deterministic shape
    try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q1: shipdate filter pushed to parquet scan") {
    val p = plan("q1_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
  }

  test("p2: column pruning — scan reads only needed events columns") {
    val p = plan("p2_envelope_filter")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props") && !readSchema.contains("ts:"),
      s"scan reads unneeded columns: $readSchema")
    assert(readSchema.contains("event_id") && readSchema.contains("value"))
  }

  test("j4: dim lookups planned as broadcast hash joins") {
    val p = plan("j4_dim_lookup")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, s"expected 2 BHJ:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q5: only the final aggregate shuffles (facts never re-shuffle)") {
    val p = plan("q5_local_supplier")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected single agg exchange, got $exchanges:\n$p")
  }

  test("q1: aggregation runs inside whole-stage codegen") {
    val p = plan("q1_pricing")
    // codegen'd operators print as "*(stageId) Op" in executedPlan
    assert(p.contains("*(1) HashAggregate") || p.contains("*(2) HashAggregate"),
      s"aggregate not codegen'd:\n$p")
  }

  test("j5: aggregate-then-enrich keeps dim joins broadcast after the agg") {
    val p = plan("j5_dim_chain")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, s"expected 3 BHJ:\n$p")
  }

  test("j5_sku_chain: all six dim hops are broadcast joins after one agg shuffle") {
    val p = plan("j5_sku_chain")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 6, s"expected 6 BHJ:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim hop degraded to SMJ:\n$p")
    val factExchanges = "Exchange hashpartitioning\\(sku_id".r.findAllIn(p).size +
      "Exchange hashpartitioning\\(l_partkey".r.findAllIn(p).size
    assert(factExchanges <= 1, s"fact side shuffles more than once:\n$p")
  }

  test("j5_sku_chain_auto: DimBroadcastRule broadcasts registered dims even when " +
       "size estimates can't (threshold -1, AQE off) — the 100 TB stats-lie case") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("j5_sku_chain_auto") // zero per-query hints in the builder
      assert("BroadcastHashJoin".r.findAllIn(p).size == 6, s"expected 6 BHJ:\n$p")
      assert(!p.contains("SortMergeJoin"), s"rule missed a dim join:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (10L * 1024 * 1024).toString)
      graft.core.DimRegistry.unregister(spark, s"$sf/part.parquet") // keep later gates order-free
    }
  }

  test("a_rollup_multigrain: every grain from ONE shuffle (Expand + partial agg)") {
    val p = plan("a_rollup_multigrain")
    assert(p.contains("Expand"), s"rollup must expand grouping sets, not re-scan:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"all grains must share a single agg exchange:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"facts must be read once, not once per grain:\n$p")
  }

  test("text_stratified_sample: scan never reads text; exactly one (source) exchange") {
    val p = plan("text_stratified_sample")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), s"sampler must not read document bodies: $readSchema")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected the single per-source window exchange:\n$p")
  }

  test("sim_brute_topk: query side broadcasts; corpus never shuffles before scoring") {
    val p = plan("sim_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"queries not broadcast:\n$p")
  }

  test("sim_sq8_topk: amax and queries broadcast; corpus scans once, " +
       "shuffles only for the rank") {
    val p = plan("sim_sq8_topk")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      s"only the one-row amax and the query-set broadcasts may nested-loop:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"SQ8 scoring degraded:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("embeddings.parquet")) <= 3,
      s"encode must be a per-row map over one corpus scan (plus amax + query scans):\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"only the per-query rank may hash-shuffle:\n$p")
  }

  test("q10: returnflag and orderdate filters push to their parquet scans") {
    val p = plan("q10_returns")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"returnflag not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"orderdate not pushed:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, s"dims not broadcast:\n$p")
  }

  test("q14: shipdate window pushed; part side broadcast; single-pass conditional agg") {
    val p = plan("q14_promo_share")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part not broadcast:\n$p")
    assert("HashAggregate".r.findAllIn(p).size <= 2,
      s"promo/total should fold into one partial+final agg pair:\n$p")
  }

  test("text_decontaminate: benchmark shingles broadcast; corpus never shuffles pre-join") {
    val p = plan("text_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"bench side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"overlap join degraded to SMJ:\n$p")
  }

  test("text_repetition: per-doc kernel, zero shuffles (r15)") {
    // The signals are per-document, so the scale-correct plan has NO
    // exchange anywhere: one scan, the rep2_stats kernel, a project.
    // (Formerly pinned as "hash-agg with map-side partials" — the r15
    // rewrite removed the aggregation pipeline outright.)
    val p = plan("text_repetition")
    assert(!p.contains("Exchange"), s"per-doc metric must not shuffle:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"one corpus scan:\n$p")
    assert(p.toLowerCase.contains("rep2stats"), s"kernel missing:\n$p")
  }

  test("q18: post-HAVING aggregate joins orders by broadcast under AQE (r2 outlier gate)") {
    // The 100 TB shape: orders is far too big to broadcast statically,
    // but the post-HAVING per-order aggregate is tiny — AQE must flip
    // the join to a BroadcastHashJoin at runtime from the agg's actual
    // size. Simulate by disabling the static broadcast threshold and
    // leaving only the adaptive one.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    try {
      val df = graft.ops.TpcH.q18LargeOrders(spark, sf)
      df.queryExecution.toRdd.count() // execute so AQE finalizes the plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
      val cut = p.indexOf("== Initial Plan ==")
      val finalSection = if (cut >= 0) p.substring(0, cut) else p
      assert(finalSection.contains("BroadcastHashJoin"),
        s"AQE did not convert the orders join to broadcast:\n$p")
      assert(!finalSection.contains("SortMergeJoin"),
        s"orders join stayed sort-merge despite a tiny HAVING side:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q18: one fact shuffle; orders and customer joins both broadcast statically") {
    val p = plan("q18_large_orders")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, s"expected 2 BHJ:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the aggregation exchange:\n$p")
  }

  test("q6: every range predicate reaches the scan; no hash exchange at all") {
    // the default 100-char metadata cap truncates the PushedFilters list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = try plan("q6_forecast")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
      "LessThan(l_quantity"))
      assert(p.contains(f), s"$f not pushed:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      s"scan reads columns the query never uses: $readSchema")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 0,
      s"single-group agg must not hash-shuffle:\n$p")
  }

  test("q4: EXISTS plans as a semi join with the date filter pushed to orders") {
    val p = plan("q4_priority_exists")
    assert(p.contains("LeftSemi"), s"EXISTS must be a semi join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"date not pushed:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"returnflag not pushed:\n$p")
  }

  test("q16: NOT IN plans as a broadcast anti join before the distinct shuffle") {
    val p = plan("q16_supplier_variety")
    assert(p.contains("LeftAnti"), s"NOT IN must be an anti join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim-sized sides degraded to SMJ:\n$p")
    // anti join must run on the raw supply rows, i.e. BEFORE the
    // count-distinct aggregation (its exchange), not after it
    assert(p.indexOf("LeftAnti") > p.indexOf("HashAggregate"),
      s"anti join should prune before aggregation:\n$p")
  }

  test("q13: customers keep order-less rows via LEFT OUTER; two agg exchanges only") {
    val p = plan("q13_cust_distribution")
    assert(p.contains("LeftOuter"), s"outer join lost:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected per-customer + histogram exchanges only:\n$p")
  }

  test("q15: scalar max broadcasts back over per-supplier revenue (no global sort)") {
    val p = plan("q15_top_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2,
      s"max filter and supplier enrich must both broadcast:\n$p")
    assert(!p.contains("GlobalLimit") && !p.contains("TakeOrderedAndProject"),
      s"argmax must not rely on a global sort:\n$p")
  }

  test("q19: the OR-of-ANDs keeps the equi-join (no nested loop) and one scan per table") {
    val p = plan("q19_disjunctive")
    assert(p.contains("BroadcastHashJoin"), s"part side not broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"disjunction broke the equi-join:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 2,
      s"each table must be scanned once, not once per arm:\n$p")
  }

  test("q22: global-average stats are a one-row broadcast; NOT EXISTS is an anti join") {
    val p = plan("q22_dormant_accounts")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must be an anti join:\n$p")
    // the single-row stats cross join is the only nested-loop allowed
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"only the one-row stats broadcast may nested-loop:\n$p")
  }

  test("q21: both quantifiers fold into per-order aggregates — no correlated re-scan, " +
       "one fact shuffle, no window") {
    val p = plan("q21_waiting_suppliers")
    assert(!p.contains("CartesianProduct"), s"correlation became a cartesian:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 2,
      s"lineitem ONCE and supplier once:\n$p")
    // r15 shape: ONE repartition on l_orderkey feeds the pair collapse
    // AND the per-order rollup exchange-free (HashPartitioning(ok)
    // satisfies both clusterings); the former Window pass is folded
    // into the rollup (the sole returning supplier is max(suppkey |
    // ret=1) under the ret_supp_ct = 1 filter). Fact rows shuffle once.
    assert(!p.contains("Window"), s"window must fold into the rollup:\n$p")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex == 2, s"expected repartition + final suppkey agg only, got $ex:\n$p")
  }

  test("a_window_analytics: all four window functions share ONE sort and ONE exchange") {
    val p = plan("a_window_analytics")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"window functions over the same frame must share one shuffle:\n$p")
    // row_number/lag (RowFrame) and the running sum (RangeFrame) can't
    // share one Window node, but they must PIPELINE over the same
    // sorted shuffle output — pinned by the single Sort below
    assert("Sort ".r.findAllIn(p).size == 1,
      s"expected a single partition-local sort feeding every window fn:\n$p")
  }

  test("a_cube_metrics: all four grains from ONE scan, one Expand, one exchange") {
    val p = plan("a_cube_metrics")
    assert(p.contains("Expand"), s"cube must expand grouping sets, not re-scan:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"all grains must share a single agg exchange:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"facts must be read once, not once per grain:\n$p")
  }

  test("q17: AQE flips the per-part average join-back to broadcast at runtime " +
       "(agg output is tiny even when the facts are 100 TB)") {
    val df = graft.ops.TpcH.q17SmallQuantity(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
    val cut = p.indexOf("== Initial Plan ==")
    val finalSection = if (cut >= 0) p.substring(0, cut) else p
    assert(!finalSection.contains("SortMergeJoin"),
      s"per-part agg join-back stayed sort-merge:\n$p")
  }

  test("q2: argmin is a rank window with group-limit pushdown — no join-back (r15)") {
    val df = graft.ops.TpcH.q2CheapestSupply(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
    val cut = p.indexOf("== Initial Plan ==")
    val finalSection = if (cut >= 0) p.substring(0, cut) else p
    assert(!finalSection.contains("SortMergeJoin"),
      s"argmin regressed to a sort-merge join-back:\n$p")
    // rank()=1 keeps every min-price tie; WindowGroupLimit prunes each
    // map partition to its per-part leaders BEFORE the one exchange
    assert(finalSection.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing:\n$p")
  }

  test("q9: dims broadcast around one fact pass; single agg exchange") {
    val p = plan("q9_product_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"part/supplier/nation must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"profit join became a cartesian:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected only the (nation, year) agg exchange:\n$p")
  }

  test("q11: facts scanned ONCE — the stats branch reuses the per-part exchange; " +
       "one-row stats broadcast back; nation band pushed to the scan") {
    val p = plan("q11_important_supply")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem.parquet")) == 1,
      s"per-part value and its total must share one lineitem scan:\n$p")
    assert(p.contains("ReusedExchange"),
      s"the stats aggregate must reuse the partkey shuffle, not recompute it:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"only the one-row stats broadcast may nested-loop:\n$p")
    assert(p.contains("StringStartsWith(n_name,NATION_1"), s"nation band not pushed:\n$p")
  }

  test("q20: shipdate + name-prefix pushed; per-part totals via ONE window over " +
       "the pair relation (single fact scan); dim joins broadcast") {
    val p = plan("q20_dominant_suppliers")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate not pushed:\n$p")
    assert(p.contains("StringStartsWith(p_name,cold"), s"name prefix not pushed:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem.parquet")) == 1,
      s"pair quantities and per-part totals must share one lineitem scan:\n$p")
    assert("Window".r.findAllIn(p).size == 1,
      s"the per-part total must be one window pass over the pair relation:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"dim joins degraded:\n$p")
  }

  test("scd2_versions: whole derivation in ONE shuffle — the run-compression " +
       "lag and the interval lead share a single exchange and sort") {
    val p = plan("scd2_versions")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"the two windows must share one user_id exchange:\n$p")
    assert("Window \\[".r.findAllIn(p).size == 2, s"expected lag + lead windows:\n$p")
    assert("Sort \\[user_id".r.findAllIn(p).size == 1,
      s"the lead window must reuse the lag window's sort:\n$p")
    assert(p.contains("Not(EqualTo(event_type,purchase))"),
      s"dim filter not pushed to the scan:\n$p")
  }

  test("scd2_temporal_join: version table broadcast — BHJ on the key with the " +
       "interval residual; facts add no shuffle; fact filter pushed") {
    val p = plan("scd2_temporal_join")
    assert(p.contains("BroadcastHashJoin"), s"temporal join must broadcast the dim:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"temporal join degraded:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)"),
      s"fact filter not pushed:\n$p")
    // exactly two hash exchanges: the dim window, the final aggregate —
    // the fact stream flows scan → BHJ → partial agg with no shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"facts must not shuffle before the aggregate:\n$p")
  }

  test("sim_cosine_neardup above the size gate plans an equi-join, never a BNLJ") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = graft.llm.Similarity.cosineNearDup(spark, sf, maxBruteCorpus = 0)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"gated path still plans a nested-loop join:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), s"no equi-join on bucket:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("a_pivot_daily: explicit-value pivot is ONE conditional-agg pass — " +
       "one scan, one shuffle, no Expand, no value-discovery job") {
    val p = plan("a_pivot_daily")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"expected 1 scan:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected single agg exchange:\n$p")
    assert(!p.contains("Expand"), s"pivot must not expand rows:\n$p")
  }

  test("a_percentile_exact: one exchange feeds both window frames and the final agg") {
    val p = plan("a_percentile_exact")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"expected 1 scan:\n$p")
    // row_number (ordered) + count (unordered) + groupBy all share the
    // event_type hash partitioning — a second exchange means a window
    // spec stopped aligning with the grouping key
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected single exchange reused across windows + agg:\n$p")
    assert("Sort ".r.findAllIn(p).size <= 2, s"unexpected extra sorts:\n$p")
  }

  test("j3_interval_bucketed: the band join shuffles on (user, bucket), " +
       "never on user alone") {
    val p = plan("j3_interval_bucketed")
    // at sf0.001 the click side broadcasts; at scale the same keys hash-
    // partition — either way the EQUI keys must include the time bucket
    val joinLines = p.linesIterator.filter(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin")).toSeq
    assert(joinLines.nonEmpty && joinLines.forall(_.contains("bk#")),
      s"join keys must include the time bucket:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"band degenerated to BNLJ:\n$p")
  }

  test("q_top_revenue_orders: global top-k is TakeOrderedAndProject — " +
       "no global sort, no single-partition exchange") {
    val p = plan("q_top_revenue_orders")
    assert(p.contains("TakeOrderedAndProject"), s"expected partial top-k heaps:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort crept in:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition merge crept in:\n$p")
  }

  // --- de-hinted SF-proportional part slices (r7 verdict #1) ---------------
  // The five TPC-H heads whose part slice grows linearly with SF carry NO
  // broadcast hint: AQE must pick broadcast at bench SF from actual sizes,
  // and at 100 TB the same plan degrades to SMJ instead of OOMing.

  private def aqeFinalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.count() // execute so AQE finalizes
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  private val sf01 = "/root/testdata/sf0.1"

  for ((name, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
    ("q16_supplier_variety", () => graft.ops.TpcH.q16SupplierVariety(spark, sf01)),
    ("q17_small_quantity",   () => graft.ops.TpcH.q17SmallQuantity(spark, sf01)),
    ("q2_cheapest_supply",   () => graft.ops.TpcH.q2CheapestSupply(spark, sf01)),
    ("q9_product_profit",    () => graft.ops.TpcH.q9ProductProfit(spark, sf01)),
    ("q20_dominant_suppliers", () => graft.ops.TpcH.q20DominantSuppliers(spark, sf01))))
    test(s"$name: un-hinted part slice joins by BROADCAST at sf0.1 via AQE " +
         "(forced hints removed — 100 TB posture)") {
      val p = aqeFinalPlan(mk())
      // the part-slice join key must be served by a BroadcastHashJoin...
      val bhjOnPart = p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("p_partkey"))
      assert(bhjOnPart, s"part-slice join not broadcast under AQE:\n$p")
      // ...and must NOT have fallen to a sort-merge join on that key
      assert(!p.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && l.contains("p_partkey")),
        s"part-slice join degraded to SMJ at bench SF:\n$p")
    }

  test("TpcH source carries broadcast() hints ONLY on bounded relations " +
       "(nation/region/one-row stats) — the SF-proportional slices stay unhinted") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/ops/TpcH.scala")), "UTF-8")
    val offenders = src.linesIterator.zipWithIndex
      .filter { case (l, _) => l.contains("broadcast(") && !l.trim.startsWith("*") }
      .filterNot { case (l, _) =>
        l.contains("nation") || l.contains("region") ||
        l.contains("maxRev") || l.contains("stats") }
      .toSeq
    assert(offenders.isEmpty,
      s"unexpected broadcast() hints in TpcH.scala: ${offenders.map(_._2 + 1).mkString(",")}")
  }

  test("mv_rollup_rewrite answers from the MV scan, never the documents fact scan") {
    val p = plan("mv_rollup_rewrite")
    assert(p.contains("documents_rollup_"), s"MV scan missing from plan:\n$p")
    assert(!p.contains("documents.parquet"), s"fact scan survived the rewrite:\n$p")
    // rewrite leaves no trace after the query: a later documents
    // aggregate plans against the fact table again
    val after = graft.io.Tables.documents(spark, sf).groupBy("source")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
      .queryExecution.executedPlan.toString
    assert(after.contains("documents.parquet"), s"registry leaked:\n$after")
  }
}
