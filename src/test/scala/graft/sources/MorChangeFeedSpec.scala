package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.{Maintenance, MergeOnRead, Upsert}
import graft.rtdw.{IncrementalDws, MorChangeFeed}

/** VERDICT r10 #5 — a merge-on-read root's delta batches ARE its
  * change log: [[MorChangeFeedSource]] subscribes to them with batch-id
  * offsets, [[MorChangeFeed.retractStream]] resolves each admitted
  * range's pre/post images against pinned snapshots, and
  * [[IncrementalDws.streamingMor]] folds the result exactly like the
  * CoW feed's retract stream. Pins: fold == full recompute across
  * inserts/updates/deletes with compaction mid-stream, kill/replay
  * convergence, point-lookup vs semi-join image parity, and the loud
  * GC-past-watermark refusal.
  */
class MorChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private val pk = Seq("id")

  private def mkWave(w: Long, ids: Range, del: Boolean = false) =
    ids.map(i => (s"k$i", i % 7L, (i + w) * 10L, w,
      if (del) "delete" else "upsert"))
      .toDF("id", "gid", "cents", "__v", "op")

  test("streamingMor fold == full recompute across waves, compaction, and restarts") {
    val root = Files.createTempDirectory("morcdf").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"; val ckpt = s"$root/ckpt"
    def drain(): Unit = {
      val q = IncrementalDws.streamingMor(spark, fact, dws,
        groupCols = Seq("gid"), sumCols = Seq("cents"),
        checkpointDir = ckpt, maxBatchesPerTrigger = Some(1))
      q.awaitTermination(120000); ()
    }
    def check(tag: String): Unit = {
      val served = IncrementalDws.current(spark, dws).get
        .select("gid", "cents", "row_ct")
        .collect().map(_.mkString("|")).toSet
      val full = MergeOnRead.read(spark, fact, pk, "__v", Some("op"))
        .groupBy(col("gid"))
        .agg(sum(col("cents")).as("cents"), count(lit(1)).as("row_ct"))
        .collect().map(_.mkString("|")).toSet
      assert(served == full, s"$tag:\n served=$served\n full=$full")
    }

    // wave 0: inserts; contract recorded by the first compact
    MergeOnRead.merge(spark, fact, mkWave(1L, 0 until 200))
    MergeOnRead.recordContract(spark, fact, pk, "__v", Some("op"),
      Upsert.DefaultNumBuckets)
    drain(); check("bootstrap")

    // wave 1: corrections (higher version) + wave 2: deletes; each
    // drain restarts the query from its checkpoint (replay exercise),
    // maxBatchesPerTrigger=1 makes every batch its own micro-batch
    MergeOnRead.merge(spark, fact, mkWave(2L, 0 until 200 by 3))
    drain(); check("corrections")
    MergeOnRead.merge(spark, fact, mkWave(3L, 0 until 200 by 5, del = true))
    drain(); check("deletes")

    // compaction mid-stream: folds batches into the base; the consumer
    // keeps its offsets and later waves resolve against the new base
    Maintenance.runMor(spark, fact, pk, "__v", deleteFlagCol = Some("op"),
      policy = Maintenance.Policy(maxDeltaBatches = 0))
    MergeOnRead.merge(spark, fact, mkWave(4L, 100 until 300))
    drain(); check("post-compaction wave")

    // a stale batch (lower version, LWW loser): retract and add cancel
    MergeOnRead.merge(spark, fact, mkWave(0L, 0 until 50))
    drain(); check("stale wave cancels")
  }

  test("point-lookup and semi-join image paths agree (maxPointKeys flip)") {
    val root = Files.createTempDirectory("morcdf_paths").toString
    val factA = s"$root/a"; val factB = s"$root/b"
    Seq(factA, factB).foreach { fact =>
      MergeOnRead.merge(spark, fact, mkWave(1L, 0 until 300))
      MergeOnRead.compact(spark, fact, pk, "__v", Some("op"), bloom = true)
      MergeOnRead.merge(spark, fact, mkWave(2L, 0 until 300 by 4))
      MergeOnRead.merge(spark, fact, mkWave(3L, 0 until 300 by 9, del = true))
    }
    def fold(fact: String, dws: String, cap: Int): Set[String] = {
      val q = IncrementalDws.streamingMor(spark, fact, dws,
        groupCols = Seq("gid"), sumCols = Seq("cents"),
        checkpointDir = s"$dws-ckpt", maxPointKeys = cap)
      q.awaitTermination(120000)
      IncrementalDws.current(spark, dws).get
        .select("gid", "cents", "row_ct")
        .collect().map(_.mkString("|")).toSet
    }
    val viaPoint = fold(factA, s"$root/dwsA", cap = 4096)
    val viaSemi = fold(factB, s"$root/dwsB", cap = 0)
    assert(viaPoint == viaSemi, s"point=$viaPoint\n semi=$viaSemi")
    val full = MergeOnRead.read(spark, factA, pk, "__v", Some("op"))
      .groupBy(col("gid"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("row_ct"))
      .collect().map(_.mkString("|")).toSet
    assert(viaPoint == full)
  }

  test("byte-based admission drains fat batches in bounded steps; AvailableNow still finishes") {
    val root = Files.createTempDirectory("morcdf_bytes").toString
    val fact = s"$root/fact"
    (1L to 3L).foreach(w => MergeOnRead.merge(spark, fact, mkWave(w, 0 until 100)))
    MergeOnRead.recordContract(spark, fact, pk, "__v", Some("op"),
      Upsert.DefaultNumBuckets)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    // 1-byte cap: every batch is oversized, the first pending always
    // admits — so the drain is exactly one delta batch per trigger
    val q = MorChangeFeedSource.read(spark, fact,
      maxBytesPerTrigger = Some(1L))
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.select(MorChangeFeedSource.BatchCol).distinct().count()
        assert(ids == 1L, s"byte cap must admit one batch per trigger, got $ids")
        batches.incrementAndGet(); ()
      }.start()
    q.awaitTermination(120000)
    assert(batches.get() == 3, s"expected 3 capped micro-batches, got ${batches.get()}")
  }

  test("GC past a consumer's watermark refuses loudly (no silent gap)") {
    val root = Files.createTempDirectory("morcdf_gc").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"; val ckpt = s"$root/ckpt"
    MergeOnRead.merge(spark, fact, mkWave(1L, 0 until 100))
    MergeOnRead.recordContract(spark, fact, pk, "__v", Some("op"),
      Upsert.DefaultNumBuckets)
    val q0 = IncrementalDws.streamingMor(spark, fact, dws,
      groupCols = Seq("gid"), sumCols = Seq("cents"), checkpointDir = ckpt)
    q0.awaitTermination(120000) // consumer at batch 0
    // producer appends batches 1-2, compacts TWICE and force-GCs:
    // batch 1 vanishes while the consumer still needs it
    MergeOnRead.merge(spark, fact, mkWave(2L, 0 until 100 by 2))
    MergeOnRead.compact(spark, fact, pk, "__v", Some("op"))
    MergeOnRead.merge(spark, fact, mkWave(3L, 0 until 100 by 3))
    MergeOnRead.compact(spark, fact, pk, "__v", Some("op"))
    MergeOnRead.gcCompactedDeltas(spark, fact, retainForReaders = false)
    assert(!MergeOnRead.deltaBatches(spark, fact).map(_._1).contains(1L),
      "precondition: batch 1 must be GC'd")
    val q1 = IncrementalDws.streamingMor(spark, fact, dws,
      groupCols = Seq("gid"), sumCols = Seq("cents"), checkpointDir = ckpt)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val e = intercept[Exception] { q1.awaitTermination(120000) }
    assert(msgs(e).exists(_.contains("GC'd past this consumer's watermark")),
      s"got ${msgs(e)}")
  }
}
