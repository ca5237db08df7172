package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.{ChangeFeed, Maintenance, MergeOnRead, Subscribers, Upsert}
import graft.rtdw.IncrementalDws

/** r15 — durable subscriber registry (NOTES backlog "feed dirs never
  * age out"; ADVICE r14 "gate the in-stream compact on a minimum
  * watermark across registered subscribers").
  *
  * Pins: (1) registry semantics — max-per-name wins, a replayed lower
  * record never regresses, unsubscribe releases, empty registry means
  * "unknown" not "none"; (2) [[Maintenance.runFeed]] ages a CoW feed
  * out exactly to the slowest registered subscriber, and every
  * registered consumer keeps reading across the GC; (3)
  * [[Maintenance.runMor]] clamps its fold to the slowest registered
  * subscriber — a lagging consumer's unapplied delta batches are
  * never folded under it; (4) a [[IncrementalDws.streamingMor]]
  * consumer auto-registers and advances its watermark with its folds,
  * and the paired background compaction respects a second lagging
  * subscriber, which can then resume exactly.
  */
class SubscribersSpec extends SparkSpec {
  import spark.implicits._

  test("registry: max-per-name wins, no regression on replay, unsubscribe releases") {
    val root = Files.createTempDirectory("subs").toString
    val t = s"$root/t"
    assert(Subscribers.minWatermark(spark, t).isEmpty,
      "empty registry is None — unknown, never 'no consumers'")
    Subscribers.record(spark, t, "a", 5L)
    Subscribers.record(spark, t, "b", 2L)
    assert(Subscribers.minWatermark(spark, t).contains(2L))
    assert(Subscribers.appliedOf(spark, t, "a").contains(5L))
    // a crash-replayed consumer re-records an OLDER position: max wins
    Subscribers.record(spark, t, "a", 3L)
    assert(Subscribers.appliedOf(spark, t, "a").contains(5L))
    Subscribers.record(spark, t, "b", 9L)
    assert(Subscribers.minWatermark(spark, t).contains(5L))
    assert(Subscribers.list(spark, t).map(s => s.name -> s.appliedBatch) ==
      Seq("a" -> 5L, "b" -> 9L))
    // a fresh consumer reserves from birth
    Subscribers.record(spark, t, "c", -1L)
    assert(Subscribers.minWatermark(spark, t).contains(-1L))
    Subscribers.unsubscribe(spark, t, "c")
    Subscribers.unsubscribe(spark, t, "a")
    assert(Subscribers.minWatermark(spark, t).contains(9L))
    intercept[IllegalArgumentException](
      Subscribers.record(spark, t, "bad=name", 1L))
    intercept[IllegalArgumentException](Subscribers.record(spark, t, "", 1L))
    intercept[IllegalArgumentException](Subscribers.record(spark, t, "a", -2L))
  }

  test("runFeed ages the CoW feed to the slowest registered subscriber; readers survive the GC") {
    val root = Files.createTempDirectory("subs_feed").toString
    val fact = s"$root/fact"
    def mergeBatch(rows: Seq[(String, String, Long, Long, String)]): Unit =
      Upsert.merge(spark,
        fact, rows.toDF("id", "province_id", "ver", "amount_cents", "op"),
        pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"),
        changeLog = true)
    (0 until 6).foreach(i => mergeBatch(Seq(
      (s"d$i", s"p${i % 2}", i + 1L, 100L + i, "insert"))))

    // no registry ⇒ runFeed must not touch the feed (consumers unknown)
    assert(Maintenance.runFeed(spark, fact).isEmpty)
    assert(ChangeFeed.batches(spark, fact).size == 6)

    // two consumers: fast folds everything, slow stops at batch 2
    val fast = s"$root/dws_fast"; val slow = s"$root/dws_slow"
    IncrementalDws.refresh(spark, fact, fast, Seq("province_id"),
      Seq("amount_cents"), subscriber = Some("fast"))
    Subscribers.record(spark, fact, "slow", 2L)
    val acts = Maintenance.runFeed(spark, fact)
    assert(acts.exists(_.contains("feedCompact")), acts.toString)
    // prefix 0..2 telescoped into net=2; 3..5 retained verbatim
    val ids = ChangeFeed.batches(spark, fact).map(_._1)
    assert(ids == Seq(2L, 3L, 4L, 5L), ids.toString)
    // idempotent: nothing new below the slowest subscriber
    assert(Maintenance.runFeed(spark, fact).isEmpty)

    // the "slow" consumer's first real fold runs AFTER the GC: from
    // applied=-1 it reads net=2 (the telescoped prefix) + 3..5 — the
    // bootstrap form. Equality with the recompute proves the GC'd feed
    // still reconstructs history-from-birth for a lagging reader.
    IncrementalDws.refresh(spark, fact, slow, Seq("province_id"),
      Seq("amount_cents"), subscriber = Some("slow"))
    val full = Upsert.read(spark, fact)
      .groupBy("province_id")
      .agg(sum("amount_cents").as("amount_cents"), count(lit(1)).as("row_ct"))
      .collect().map(_.mkString("|")).toSet
    val slowNow = IncrementalDws.current(spark, slow).get
      .select("province_id", "amount_cents", "row_ct")
      .collect().map(_.mkString("|")).toSet
    assert(slowNow == full)
    // and the registry advanced both names to the newest batch
    assert(Subscribers.minWatermark(spark, fact).contains(5L))
    // now everything below 5 can age out
    val acts2 = Maintenance.runFeed(spark, fact)
    assert(acts2.exists(_.contains("feedCompact")), acts2.toString)
    assert(ChangeFeed.batches(spark, fact).map(_._1) == Seq(5L))
  }

  test("runMor clamps its fold to the slowest registered subscriber") {
    val root = Files.createTempDirectory("subs_mor").toString
    val fact = s"$root/fact"
    def wave(w: Long) = (0 until 40).map(i =>
      (s"k$i", i % 4L, (i + w) * 10L, w)).toDF("id", "gid", "cents", "__v")
    (1L to 12L).foreach(w => MergeOnRead.merge(spark, fact, wave(w)))
    // 12 merges = delta batches 0..11
    MergeOnRead.recordContract(spark, fact, Seq("id"), "__v", None,
      Upsert.DefaultNumBuckets)

    // a registered subscriber at batch 4 clamps the policy fold
    Subscribers.record(spark, fact, "lagging", 4L)
    val acts = Maintenance.runMor(spark, fact, Seq("id"), "__v")
    assert(acts.exists(_.contains("bounded to batch <= 4")), acts.toString)
    assert(MergeOnRead.compactedUpto(spark, fact) == 4L)
    // LIVE deltas (above the fold watermark) are exactly the lagging
    // subscriber's unapplied batches — retention additionally keeps
    // the folded cycle's dirs on disk, so filter, don't count raw dirs
    assert(MergeOnRead.deltaBatches(spark, fact).map(_._1)
      .filter(_ > 4L).min == 5L,
      "the lagging subscriber's unapplied batches must stay live deltas")
    // a FORCING policy (fold on any backlog) that still has nothing
    // foldable behind the subscriber: held back LOUDLY, not silently
    // skipped (the default-threshold pass would simply not trigger)
    val force = Maintenance.Policy(maxDeltaBatches = 0)
    val held = Maintenance.runMor(spark, fact, Seq("id"), "__v", policy = force)
    assert(held.exists(_.contains("held back")), held.toString)
    assert(MergeOnRead.compactedUpto(spark, fact) == 4L)
    // the lagging consumer catches up; the next pass folds the rest
    Subscribers.record(spark, fact, "lagging", 11L)
    Maintenance.runMor(spark, fact, Seq("id"), "__v", policy = force)
    assert(MergeOnRead.compactedUpto(spark, fact) == 11L)
    // content unharmed throughout
    assert(MergeOnRead.read(spark, fact, Seq("id"), "__v").count() == 40L)
  }

  test("streamingMor auto-registers; paired compaction never folds past a lagging registered subscriber") {
    val root = Files.createTempDirectory("subs_pair").toString
    val fact = s"$root/fact"
    def wave(w: Long) = (0 until 60).map(i =>
      (s"k$i", i % 5L, (i + w) * 10L, w)).toDF("id", "gid", "cents", "__v")
    MergeOnRead.merge(spark, fact, wave(1L))
    MergeOnRead.recordContract(spark, fact, Seq("id"), "__v", None,
      Upsert.DefaultNumBuckets)
    (2L to 13L).foreach(w => MergeOnRead.merge(spark, fact, wave(w)))
    // 13 merges = delta batches 0..12

    // a second registered consumer sits at batch 3
    Subscribers.record(spark, fact, "slowpoke", 3L)

    val q = IncrementalDws.streamingMor(spark, fact, s"$root/dws",
      groupCols = Seq("gid"), sumCols = Seq("cents"),
      checkpointDir = s"$root/ckpt", maxBatchesPerTrigger = Some(3),
      compactEveryTriggers = Some(2))
    q.awaitTermination(300000)
    IncrementalDws.awaitPairedCompacts(fact, 120000)

    // the drain registered itself and advanced to the newest batch
    val subs = Subscribers.list(spark, fact)
    assert(subs.exists(s => s.name.startsWith("dws-") && s.appliedBatch == 12L),
      subs.toString)
    // ... but compaction stopped at the slowpoke's watermark
    assert(MergeOnRead.compactedUpto(spark, fact) <= 3L,
      s"paired compaction must clamp to the lagging subscriber, " +
        s"compactedUpto=${MergeOnRead.compactedUpto(spark, fact)}")
    // the slowpoke can still read exactly what it is owed: batches
    // (3, 12] reconstruct without a missing-batch refusal
    val owed = graft.rtdw.MorChangeFeed.changes(spark, fact, 3L, 12L)
    assert(owed.count() > 0L)
    // and the drained aggregate is exact
    val full = MergeOnRead.read(spark, fact, Seq("id"), "__v")
      .groupBy("gid").agg(sum("cents").as("cents"), count(lit(1)).as("row_ct"))
      .collect().map(_.mkString("|")).toSet
    val got = IncrementalDws.current(spark, s"$root/dws").get
      .select("gid", "cents", "row_ct").collect().map(_.mkString("|")).toSet
    assert(got == full)

    // slowpoke leaves; a fresh policy pass may now fold the whole prefix
    Subscribers.unsubscribe(spark, fact, "slowpoke")
    val acts = Maintenance.runMor(spark, fact, Seq("id"), "__v")
    assert(MergeOnRead.compactedUpto(spark, fact) == 12L, acts.toString)
  }
}
