package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rtdw.Scd2

/** SCD2 dim history ([[graft.rtdw.Scd2]]): run-compression, half-open
  * interval semantics, temporal-join boundary behavior, equivalence to
  * the as-of formulation, and the incremental ingest path under late
  * cross-batch arrivals and replay.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def hist(rows: Seq[(Long, Long, Long, String)]): DataFrame =
    rows.toDF("user_id", "sec", "event_id", "seg")
      .select(col("user_id"), col("sec").cast("timestamp").as("ts"),
        col("event_id"), col("seg"))

  private def versionTuples(df: DataFrame): Set[(Long, String, Long, Option[Long], Boolean)] =
    df.select(col("user_id"), col("seg"),
        unix_micros(col("effective_from")).as("ef"),
        unix_micros(col("effective_to")).as("et"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSet

  private val S = 1000000L // seconds → micros

  test("fromHistory compresses runs and assigns half-open intervals") {
    // user 1: x x y y x — three runs; user 2: single change
    val h = hist(Seq(
      (1L, 10L, 1L, "x"), (1L, 20L, 2L, "x"), (1L, 30L, 3L, "y"),
      (1L, 40L, 4L, "y"), (1L, 50L, 5L, "x"),
      (2L, 5L, 6L, "a")))
    val got = versionTuples(Scd2.fromHistory(h, "user_id", "ts", "event_id", Seq("seg")))
    assert(got == Set(
      (1L, "x", 10 * S, Some(30 * S), false),
      (1L, "y", 30 * S, Some(50 * S), false),
      (1L, "x", 50 * S, None, true),
      (2L, "a", 5 * S, None, true)))
  }

  test("fromHistory: null attributes compare null-safely; same-ts ties order by tieBreak") {
    val h = hist(Seq(
      (3L, 10L, 1L, null), (3L, 20L, 2L, null), (3L, 30L, 3L, "z"),
      // two changes at the SAME instant: tieBreak decides the sequence;
      // the earlier one gets an EMPTY [10,10) interval, the later wins
      (4L, 10L, 1L, "p"), (4L, 10L, 2L, "q")))
    val got = versionTuples(
      Scd2.fromHistory(h, "user_id", "ts", "event_id", Seq("seg"))
        .withColumn("seg", coalesce(col("seg"), lit("∅"))))
    assert(got == Set(
      (3L, "∅", 10 * S, Some(30 * S), false),
      (3L, "z", 30 * S, None, true),
      (4L, "p", 10 * S, Some(10 * S), false),
      (4L, "q", 10 * S, None, true)))
  }

  test("temporalJoin: half-open boundaries, exactly one version per fact, " +
       "no-version facts survive the left join") {
    val v = Scd2.fromHistory(hist(Seq(
      (1L, 10L, 1L, "x"), (1L, 30L, 2L, "y"))),
      "user_id", "ts", "event_id", Seq("seg"))
    val facts = Seq(
      (1L, 5L, 100L),  // before first version → null seg
      (1L, 10L, 101L), // == version start (inclusive) → x
      (1L, 29L, 102L), // inside → x
      (1L, 30L, 103L), // == next start (prev end exclusive) → y
      (9L, 10L, 104L)) // user with no versions at all → null seg
      .toDF("user_id", "sec", "fact_id")
      .select(col("user_id"), col("sec").cast("timestamp").as("ts"), col("fact_id"))
    val got = Scd2.temporalJoin(facts, v, "user_id", "ts")
      .select(col("fact_id"), col("seg")).as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(100L -> None, 101L -> Some("x"), 102L -> Some("x"),
      103L -> Some("y"), 104L -> None))
    assert(got.size == 5, "interval partitioning must never duplicate a fact")
  }

  test("temporalJoin over events == the as-of formulation (interval membership " +
       "IS latest-change-at-or-before)") {
    val ev = graft.io.Tables.events(spark, sf)
    val changes = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("seg"))
    val v = Scd2.fromHistory(changes, "user_id", "ts", "event_id", Seq("seg"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("fact_id"))

    val viaInterval = Scd2.temporalJoin(facts, v, "user_id", "ts")
      .select(col("fact_id"), col("seg")).as[(Long, Option[String])].collect().toMap

    // as-of against the UNCOMPRESSED change log: run-compression must
    // not change which attribute value is in force at any instant
    val viaAsOf = graft.plans.AsOfJoin.asOf(facts, changes,
        key = "user_id", probeTs = "ts", historyTs = "ts", tieBreak = Seq("event_id"))
      .toDF("user_id", "ts", "fact_id", "h_user", "h_ts", "h_event_id", "seg")
      .select(col("fact_id"), col("seg")).as[(Long, Option[String])].collect().toMap

    assert(viaInterval == viaAsOf)
    assert(viaInterval.nonEmpty)
  }

  test("temporalJoin mode=asof equals mode=broadcast on a GAPPED version table; " +
       "auto gates metadata-only on the size budget") {
    // versions with a hole: [10,20) then nothing until [40,∞) — facts in
    // the gap must get NULL on BOTH paths (as-of alone would attach the
    // expired [10,20) row; the validity mask nulls it)
    val v = Seq(
      (1L, "a", Some(ts(10)), Some(ts(20)), false),
      (1L, "b", Some(ts(40)), None: Option[Timestamp], true))
      .toDF("user_id", "seg", "effective_from", "effective_to", "is_current")
      .select(col("user_id"), col("seg"), col("effective_from"),
        col("effective_to"), col("is_current"))
    val facts = Seq((1L, ts(15), 100L), (1L, ts(25), 101L), (1L, ts(45), 102L))
      .toDF("user_id", "ts", "fact_id")

    def segs(mode: String): Map[Long, Option[String]] =
      Scd2.temporalJoin(facts, v, "user_id", "ts", mode = mode)
        .select(col("fact_id"), col("seg"))
        .as[(Long, Option[String])].collect().toMap

    val want = Map(100L -> Some("a"), 101L -> None, 102L -> Some("b"))
    assert(segs("broadcast") == want)
    assert(segs("asof") == want)

    // auto is a metadata-only gate: tiny budget → the as-of physical
    // operator; dim-sized default → broadcast hash join
    val tiny = Scd2.temporalJoin(facts, v, "user_id", "ts",
      mode = "auto", maxBroadcastBytes = 1L)
    assert(tiny.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "above-budget version table must take the as-of path")
    val dflt = Scd2.temporalJoin(facts, v, "user_id", "ts")
    assert(dflt.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "dim-sized version table must broadcast")
  }

  test("temporalJoin: payload/fact column collision fails identically on every " +
       "mode (auto must never succeed-or-throw by table size)") {
    val v = Seq((1L, "a", Some(ts(10)), None: Option[Timestamp], true))
      .toDF("user_id", "seg", "effective_from", "effective_to", "is_current")
    // facts ALSO carry a `seg` column — the collision case
    val facts = Seq((1L, ts(15), "fact-seg")).toDF("user_id", "ts", "seg")
    for (mode <- Seq("auto", "broadcast", "asof")) {
      val e = intercept[IllegalArgumentException] {
        Scd2.temporalJoin(facts, v, "user_id", "ts", mode = mode)
      }
      assert(e.getMessage.contains("seg"), s"mode=$mode: $e")
    }
  }

  test("auto gate width-adjusts by schema: many wide attrs push the same row " +
       "count over the broadcast budget") {
    // the width seam directly: 40 string attrs ≈ 40·20 B + key/interval
    // fields per row, so 100k rows blow a 64 MB budget where the old
    // fixed 64 B/row floor (6.4 MB) would still have broadcast
    val attrs = (1 to 40).map(i => lit("x").as(s"attr_$i"))
    val wide = spark.range(100000)
      .select(col("id").as("user_id") +: lit(ts(10)).as("effective_from")
        +: lit(null).cast("timestamp").as("effective_to")
        +: lit(true).as("is_current") +: attrs: _*)
    val est = Scd2.estRowBytes(wide.schema)
    assert(est > 800L, s"40 string attrs must estimate > 800 B/row, got $est")
    assert(100000L * est > 64L * 1024 * 1024,
      "100k wide rows must exceed the 64 MB budget under the schema width")
    assert(100000L * 64L < 64L * 1024 * 1024,
      "(the old fixed floor would have let the same table broadcast)")
    // end-to-end sanity (sizeInBytes branch — Spark drops rowCount
    // through the Project, estimating ~141 B/row): 500k wide rows
    // exceed the budget and take the as-of path under auto
    val wider = spark.range(500000)
      .select(col("id").as("user_id") +: lit(ts(10)).as("effective_from")
        +: lit(null).cast("timestamp").as("effective_to")
        +: lit(true).as("is_current") +: attrs: _*)
    val facts = Seq((1L, ts(15), 100L)).toDF("user_id", "ts", "fact_id")
    val p = Scd2.temporalJoin(facts, wider, "user_id", "ts",
      mode = "auto").queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"),
      s"over-budget wide version table must take the as-of path:\n$p")
  }

  test("ingest: late cross-batch changes resurrect compressed runs; " +
       "replay is a no-op; snapshot equals the batch derivation") {
    val root = java.nio.file.Files.createTempDirectory("scd2").toString
    def wave(rows: Seq[(Long, Long, Long, String)], id: Long): Unit =
      Scd2.ingest(spark, root, hist(rows), batchId = id)

    // batch 1: user 7 has ONE compressed run x@10..x@30; user 8 one change
    wave(Seq((7L, 10L, 1L, "x"), (7L, 30L, 2L, "x"), (8L, 10L, 3L, "m")), 1L)
    assert(versionTuples(Scd2.versions(spark, root).get) == Set(
      (7L, "x", 10 * S, None, true),
      (8L, "m", 10 * S, None, true)))

    // batch 2: LATE y@20 lands INSIDE user 7's run — x@30 was compressed
    // away and must resurrect as its own version (the case a
    // versions-table-only rewrite cannot reconstruct)
    wave(Seq((7L, 20L, 4L, "y")), 2L)
    val after2 = versionTuples(Scd2.versions(spark, root).get)
    assert(after2 == Set(
      (7L, "x", 10 * S, Some(20 * S), false),
      (7L, "y", 20 * S, Some(30 * S), false),
      (7L, "x", 30 * S, None, true),
      (8L, "m", 10 * S, None, true)))

    // batch 2 replayed (crash recovery): identical table
    wave(Seq((7L, 20L, 4L, "y")), 2L)
    assert(versionTuples(Scd2.versions(spark, root).get) == after2)

    // batch 3: user 8 changes twice; untouched user 7 rows survive
    wave(Seq((8L, 40L, 5L, "n"), (8L, 50L, 6L, "n")), 3L)
    val finalGot = versionTuples(Scd2.versions(spark, root).get)

    // the incremental table must equal deriving from the FULL history
    val all = Seq((7L, 10L, 1L, "x"), (7L, 30L, 2L, "x"), (8L, 10L, 3L, "m"),
      (7L, 20L, 4L, "y"), (8L, 40L, 5L, "n"), (8L, 50L, 6L, "n"))
    val expected = versionTuples(
      Scd2.fromHistory(hist(all), "user_id", "ts", "event_id", Seq("seg")))
    assert(finalGot == expected)

    // serving snapshot: exactly one current row per key
    val cur = Scd2.currentSnapshot(spark, root).get
      .select(col("user_id"), col("seg")).as[(Long, String)].collect().toSet
    assert(cur == Set((7L, "x"), (8L, "n")))
  }
}
