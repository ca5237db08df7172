package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.{ChangeFeed, Upsert}
import graft.rtdw.IncrementalDws

/** VERDICT r1 #7: DWS aggregates maintained from the upsert change feed
  * must equal a full recompute over the merged fact table after every
  * batch — across inserts, value corrections, and deletes.
  */
class IncrementalDwsSpec extends SparkSpec {
  import spark.implicits._

  private def fullRecompute(factDir: String) =
    Upsert.read(spark, factDir)
      .groupBy("province_id")
      .agg(sum(col("amount_cents")).as("amount_cents"), count(lit(1)).as("row_ct"))
      .select("province_id", "amount_cents", "row_ct")
      .as[(String, Long, Long)].collect().toSet

  private def incremental(dwsDir: String) =
    IncrementalDws.current(spark, dwsDir).get
      .select("province_id", "amount_cents", "row_ct")
      .as[(String, Long, Long)].collect().toSet

  test("delta-fold DWS equals full recompute after insert, correction, delete batches") {
    val root = Files.createTempDirectory("incdws").toString
    val fact = s"$root/dwd_order_detail"; val dws = s"$root/dws_province"

    def mergeBatch(rows: Seq[(String, String, Long, Long, String)]): Unit =
      Upsert.merge(spark,
        fact, rows.toDF("id", "province_id", "ver", "amount_cents", "op"),
        pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"),
        changeLog = true)

    // batch 0: pure inserts
    mergeBatch(Seq(("d1", "p1", 1L, 1000L, "insert"), ("d2", "p1", 1L, 550L, "insert"),
      ("d3", "p2", 1L, 725L, "insert")))
    IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    assert(incremental(dws) == fullRecompute(fact))

    // batch 1: value correction (d1 re-emitted with a new amount) + new row
    mergeBatch(Seq(("d1", "p1", 2L, 1200L, "update"), ("d4", "p2", 2L, 300L, "insert")))
    IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    assert(incremental(dws) == fullRecompute(fact))

    // batch 2: stale out-of-order version must be a net no-op
    mergeBatch(Seq(("d1", "p1", 1L, 999L, "update")))
    IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    assert(incremental(dws) == fullRecompute(fact))

    // batch 3: delete one row; delete ALL of p2's rows → group vanishes
    mergeBatch(Seq(("d3", "p2", 3L, 725L, "delete"), ("d4", "p2", 3L, 300L, "delete")))
    IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    val finalState = incremental(dws)
    assert(finalState == fullRecompute(fact))
    assert(!finalState.exists(_._1 == "p2"), "fully-deleted province must vanish")

    // caught-up refresh is a no-op (same applied batch id)
    val before = IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    val after = IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    assert(before == after)
  }

  test("bounded changes(from, to]: reproducible range reads; net-batch refusals mirror since()") {
    val root = Files.createTempDirectory("cdcrange").toString
    val fact = s"$root/fact"
    def mergeBatch(rows: Seq[(String, String, Long, Long, String)]): Unit =
      Upsert.merge(spark,
        fact, rows.toDF("id", "province_id", "ver", "amount_cents", "op"),
        pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"),
        changeLog = true)
    mergeBatch(Seq(("d1", "p1", 1L, 100L, "insert"), ("d2", "p2", 1L, 50L, "insert")))
    mergeBatch(Seq(("d1", "p1", 2L, 140L, "update")))                 // batch 1
    mergeBatch(Seq(("d2", "p2", 3L, 50L, "delete"), ("d3", "p1", 3L, 7L, "insert")))

    def signedTotal(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(when(col(ChangeFeed.ChangeCol) === "add", col("amount_cents"))
        .otherwise(-col("amount_cents")))).head().getLong(0)

    // the bounded range equals the concatenation of its batches, and a
    // re-read returns the identical frame even after MORE batches land
    val r12 = ChangeFeed.changes(spark, fact, 0L, 2L)
    val t12 = signedTotal(r12)
    assert(t12 == (140L - 100L) + (-50L + 7L)) // d1 correction + d2 delete + d3 insert
    mergeBatch(Seq(("d4", "p1", 4L, 11L, "insert")))                  // batch 3
    assert(signedTotal(ChangeFeed.changes(spark, fact, 0L, 2L)) == t12,
      "a bounded range must be reproducible after later batches land")
    // from-birth form covers the whole feed
    assert(signedTotal(ChangeFeed.changes(spark, fact, -1L, 3L)) ==
      100L + 50L + t12 + 11L)

    // refusals: inverted, future, and net-past-watermark / GC'd ranges
    intercept[IllegalArgumentException](ChangeFeed.changes(spark, fact, 2L, 2L))
    intercept[IllegalArgumentException](ChangeFeed.changes(spark, fact, 0L, 99L))
    ChangeFeed.compact(spark, fact, upTo = 2L) // net=2 replaces 0..2
    val e1 = intercept[IllegalStateException](
      ChangeFeed.changes(spark, fact, 0L, 3L)) // net inside the range
    assert(e1.getMessage.contains("net=2"))
    val e2 = intercept[IllegalStateException](
      ChangeFeed.changes(spark, fact, 0L, 1L)) // batches folded away
    assert(e2.getMessage.contains("not reconstructible"))
    // bootstrap through the net still works and equals the full history
    assert(signedTotal(ChangeFeed.changes(spark, fact, -1L, 3L)) ==
      100L + 50L + t12 + 11L)
    // post-net tail alone stays readable
    assert(signedTotal(ChangeFeed.changes(spark, fact, 2L, 3L)) == 11L)
  }

  test("compacted feed bootstraps a fresh consumer to the same state") {
    val root = Files.createTempDirectory("compact").toString
    val fact = s"$root/fact"

    def mergeBatch(rows: Seq[(String, String, Long, Long, String)]): Unit =
      Upsert.merge(spark,
        fact, rows.toDF("id", "province_id", "ver", "amount_cents", "op"),
        pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"),
        changeLog = true)

    mergeBatch(Seq(("d1", "p1", 1L, 100L, "insert"), ("d2", "p2", 1L, 200L, "insert")))
    mergeBatch(Seq(("d1", "p1", 2L, 150L, "update"), ("d3", "p1", 2L, 50L, "insert")))
    mergeBatch(Seq(("d2", "p2", 3L, 200L, "delete")))

    // consumer A consumed everything before compaction
    val dwsA = s"$root/dwsA"
    IncrementalDws.provinceOrderRefresh(spark, fact, dwsA)

    ChangeFeed.compact(spark, fact, upTo = 2L)
    assert(ChangeFeed.batches(spark, fact).map(_._1) == Seq(2L),
      "prefix 0..2 should collapse into batch=2")

    // consumer B bootstraps from the compacted feed alone
    val dwsB = s"$root/dwsB"
    IncrementalDws.provinceOrderRefresh(spark, fact, dwsB)
    def state(d: String) = IncrementalDws.current(spark, d).get
      .select("province_id", "amount_cents", "row_ct")
      .as[(String, Long, Long)].collect().toSet
    assert(state(dwsB) == state(dwsA))
    assert(state(dwsB) == fullRecompute(fact))

    // consumer A (watermark == compacted id) sees nothing new
    val appliedBefore = IncrementalDws.provinceOrderRefresh(spark, fact, dwsA)
    assert(appliedBefore == 2L && state(dwsA) == fullRecompute(fact))
  }

  test("a feed compacted past a consumer's watermark fails its refresh loudly") {
    val root = Files.createTempDirectory("compact_past").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"
    def mergeBatch(rows: Seq[(String, String, Long, Long, String)]): Unit =
      Upsert.merge(spark,
        fact, rows.toDF("id", "province_id", "ver", "amount_cents", "op"),
        pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"),
        changeLog = true)
    mergeBatch(Seq(("d1", "p1", 1L, 100L, "insert")))
    IncrementalDws.provinceOrderRefresh(spark, fact, dws) // applied = 0
    mergeBatch(Seq(("d2", "p2", 2L, 200L, "insert")))
    mergeBatch(Seq(("d1", "p1", 3L, 150L, "update")))
    // producer-side contract violation: compaction past a live
    // consumer — the telescoped net=2 would re-deliver batch 0
    ChangeFeed.compact(spark, fact, upTo = 2L)
    val e = intercept[IllegalStateException](
      IncrementalDws.provinceOrderRefresh(spark, fact, dws))
    assert(e.getMessage.contains("compacted to net=2") &&
      e.getMessage.contains("watermark 0"), e.getMessage)
    // the guarded aggregate is untouched
    assert(state2(dws) == Set(("p1", 100L, 1L)))
  }

  private def state2(d: String) = IncrementalDws.current(spark, d).get
    .select("province_id", "amount_cents", "row_ct")
    .as[(String, Long, Long)].collect().toSet

  test("change batches are retract-encoded and bounded by the batch, not the table") {
    val root = Files.createTempDirectory("cdf").toString
    val fact = s"$root/t"
    Upsert.merge(spark, fact, (1 to 50).map(i => (s"k$i", 1L, 100L)).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver", changeLog = true)
    Upsert.merge(spark, fact, Seq(("k1", 2L, 900L)).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver", changeLog = true)
    val batches = ChangeFeed.batches(spark, fact)
    assert(batches.map(_._1) == Seq(0L, 1L))
    val b1 = spark.read.parquet(batches(1)._2)
    // second batch touched ONE key: exactly one retract + one add
    val ops = b1.select("id", ChangeFeed.ChangeCol).as[(String, String)].collect().toSet
    assert(ops == Set(("k1", "retract"), ("k1", "add")))
  }

  test("change feed survives schema evolution: pre-images keep the old shape, " +
       "consumers read NULL-filled unions across the boundary") {
    val root = Files.createTempDirectory("cdf_evolve").toString
    val fact = s"$root/t"
    Upsert.merge(spark, fact, Seq(("k1", 1L, 100L)).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver", changeLog = true)
    // evolving merge: corrects k1 AND introduces a column
    Upsert.merge(spark, fact, Seq(("k1", 2L, 150L, "promo")).toDF("id", "ver", "v", "tag"),
      pk = Seq("id"), versionCol = "ver", changeLog = true)
    val (changes, upTo) = ChangeFeed.since(spark, fact, afterBatch = -1L).get
    assert(upTo == 1L)
    val rows = changes.select("id", "ver", "tag", ChangeFeed.ChangeCol)
      .as[(String, Long, String, String)].collect().toSet
    assert(rows == Set(
      ("k1", 1L, null: String, "add"),     // batch 0 predates the column
      ("k1", 1L, null: String, "retract"), // pre-image keeps the old shape
      ("k1", 2L, "promo", "add")), s"got $rows")
    // compaction nets the evolved history without losing the new column
    ChangeFeed.compact(spark, fact, upTo = 1L)
    val (net, _) = ChangeFeed.since(spark, fact, afterBatch = -1L).get
    val netRows = net.select("id", "ver", "tag", ChangeFeed.ChangeCol)
      .as[(String, Long, String, String)].collect().toSet
    assert(netRows == Set(("k1", 2L, "promo", "add")), s"got $netRows")
  }
}
