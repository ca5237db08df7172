package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.io.{ChangeFeed, Upsert}
import graft.rtdw.IncrementalDws

/** The change feed as a Structured-Streaming SOURCE (VERDICT r8 #2):
  * `readStream.format(graft.sources.ChangeFeedSource)` subscribes to an
  * Upsert table's retract stream, and [[IncrementalDws.streaming]]
  * folds it into the DWS aggregate — pinned set-equal to the batch
  * fold and to a full recompute, across a kill/restart with replay.
  */
class ChangeFeedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mergeBatch(fact: String,
                         rows: Seq[(String, String, Long, Long, String)]): Unit =
    Upsert.merge(spark,
      fact, rows.toDF("id", "province_id", "ver", "amount_cents", "op"),
      pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"),
      changeLog = true)

  private def fullRecompute(factDir: String) =
    Upsert.read(spark, factDir)
      .groupBy("province_id")
      .agg(sum(col("amount_cents")).as("amount_cents"), count(lit(1)).as("row_ct"))
      .as[(String, Long, Long)].collect().toSet

  private def served(dwsDir: String) =
    IncrementalDws.current(spark, dwsDir).get
      .select("province_id", "amount_cents", "row_ct")
      .as[(String, Long, Long)].collect().toSet

  private def drain(fact: String, dws: String, ckpt: String): Unit = {
    val q = IncrementalDws.streaming(spark, fact, dws,
      groupCols = Seq("province_id"), sumCols = Seq("amount_cents"),
      checkpointDir = ckpt, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000); ()
  }

  test("streamed retract rows carry the batch's pre/post images in offset order") {
    val root = Files.createTempDirectory("cdfsrc").toString
    val fact = s"$root/fact"
    mergeBatch(fact, Seq(("a", "p1", 1L, 100L, "insert"), ("b", "p2", 1L, 50L, "insert")))
    mergeBatch(fact, Seq(("a", "p1", 2L, 140L, "update")))
    val out = s"$root/out"
    val q = ChangeFeedSource.read(spark, fact)
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.mode("append").parquet(out); ()
      }.start()
    q.awaitTermination(120000)
    val rows = spark.read.parquet(out)
      .select("id", "amount_cents", ChangeFeed.ChangeCol)
      .as[(String, Long, String)].collect().toSet
    // batch 0: two adds; batch 1: retract of a@100 + add of a@140
    assert(rows == Set(("a", 100L, "add"), ("b", 50L, "add"),
      ("a", 100L, "retract"), ("a", 140L, "add")))
  }

  test("streaming DWS fold equals batch fold and full recompute; restart replays as no-op") {
    val root = Files.createTempDirectory("cdfdws").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"; val ckpt = s"$root/ckpt"
    val dwsBatch = s"$root/dws_batch"

    mergeBatch(fact, Seq(("d1", "p1", 1L, 1000L, "insert"),
      ("d2", "p1", 1L, 550L, "insert"), ("d3", "p2", 1L, 725L, "insert")))
    drain(fact, dws, ckpt)
    IncrementalDws.refresh(spark, fact, dwsBatch,
      Seq("province_id"), Seq("amount_cents"))
    assert(served(dws) == fullRecompute(fact))
    assert(served(dws) == served(dwsBatch))

    // KILL (the AvailableNow query already terminated), publish more —
    // a correction, a stale replay, a full-group delete — RESTART from
    // the same checkpoint: only the unconsumed batches fold
    mergeBatch(fact, Seq(("d1", "p1", 2L, 1200L, "update"),
      ("d4", "p2", 2L, 300L, "insert")))
    mergeBatch(fact, Seq(("d1", "p1", 1L, 999L, "update"))) // stale: no-op batch
    mergeBatch(fact, Seq(("d3", "p2", 3L, 725L, "delete"),
      ("d4", "p2", 3L, 300L, "delete")))
    drain(fact, dws, ckpt)
    IncrementalDws.refresh(spark, fact, dwsBatch,
      Seq("province_id"), Seq("amount_cents"))
    val s = served(dws)
    assert(s == fullRecompute(fact))
    assert(s == served(dwsBatch))
    assert(!s.exists(_._1 == "p2"), "fully-deleted province must vanish")

    // drain again with nothing new: content byte-stable
    drain(fact, dws, ckpt)
    assert(served(dws) == s)
  }

  test("ONE-QUERY pipeline: update-mode stateful agg lands as LWW upserts, retracted groups delete") {
    val root = Files.createTempDirectory("cdfpipe").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"; val ckpt = s"$root/ckpt"
    def drainPipe(): Unit = {
      val q = IncrementalDws.streamingPipeline(spark, fact, dws,
        groupCols = Seq("province_id"), sumCols = Seq("amount_cents"),
        checkpointDir = ckpt, trigger = Trigger.AvailableNow())
      q.awaitTermination(120000); ()
    }
    def servedPipe: Set[(String, Long, Long)] =
      Upsert.read(spark, s"$dws/table")
        .select("province_id", "amount_cents", "row_ct")
        .as[(String, Long, Long)].collect().toSet

    mergeBatch(fact, Seq(("a", "p1", 1L, 100L, "insert"),
      ("b", "p2", 1L, 50L, "insert"), ("c", "p2", 1L, 30L, "insert")))
    drainPipe()
    assert(servedPipe == fullRecompute(fact))

    // restart from the same checkpoint: a correction epoch supersedes
    // (versionFromEpoch), and a province retracted to zero rows is
    // delete-flagged out of the table by the sink's LWW merge
    mergeBatch(fact, Seq(("a", "p1", 2L, 140L, "update")))
    mergeBatch(fact, Seq(("b", "p2", 2L, 50L, "delete"),
      ("c", "p2", 2L, 30L, "delete")))
    drainPipe()
    val s = servedPipe
    assert(s == fullRecompute(fact))
    assert(!s.exists(_._1 == "p2"), "fully-retracted province must be deleted")

    // nothing new: the sink commits no epoch, the table generation is
    // untouched (replay hygiene without any driver-side fold code)
    val gen = Upsert.currentManifest(spark, s"$dws/table").get.gen
    drainPipe()
    assert(Upsert.currentManifest(spark, s"$dws/table").get.gen == gen)

    // the landed table is a REAL upsert table: recorded pk + epoch
    // version, readable through the DSv2/SQL stack like any other
    val man = Upsert.currentManifest(spark, s"$dws/table").get
    assert(man.props.get("pkCols").contains("province_id"))
    assert(man.props.get("versionCol").contains("__v"))

    // the same pipeline on the ROCKSDB state store (what cluster
    // deployments run): fresh table + checkpoint, identical result
    val dwsR = s"$root/dwsR"; val ckptR = s"$root/ckptR"
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = IncrementalDws.streamingPipeline(spark, fact, dwsR,
        groupCols = Seq("province_id"), sumCols = Seq("amount_cents"),
        checkpointDir = ckptR, trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
      val sr = Upsert.read(spark, s"$dwsR/table")
        .select("province_id", "amount_cents", "row_ct")
        .as[(String, Long, Long)].collect().toSet
      assert(sr == fullRecompute(fact))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("a net batch bootstraps a FRESH consumer; a consumer inside the compacted range fails loudly") {
    val root = Files.createTempDirectory("cdfnet").toString
    val fact = s"$root/fact"
    mergeBatch(fact, Seq(("x1", "p1", 1L, 10L, "insert")))
    mergeBatch(fact, Seq(("x2", "p1", 1L, 20L, "insert")))

    // consumer A drains batches 0..1, then the producer compacts 0..1
    val dwsA = s"$root/dwsA"; val ckptA = s"$root/ckptA"
    drain(fact, dwsA, ckptA)
    ChangeFeed.compact(spark, fact, upTo = 1L)
    mergeBatch(fact, Seq(("x3", "p2", 1L, 30L, "insert")))

    // fresh consumer B bootstraps from net=1 + batch 2 → full state
    val dwsB = s"$root/dwsB"; val ckptB = s"$root/ckptB"
    drain(fact, dwsB, ckptB)
    assert(served(dwsB) == fullRecompute(fact))

    // consumer A (watermark 1 — AT the net) continues past it cleanly
    drain(fact, dwsA, ckptA)
    assert(served(dwsA) == fullRecompute(fact))

    // a consumer whose watermark is INSIDE a compacted range fails:
    // simulate with a direct planInputPartitions call (watermark 0,
    // net=1 visible)
    val stream = new ChangeFeedStream(fact,
      ChangeFeedSource.feedSchema(spark, fact),
      ChangeFeedSource.feedSchema(spark, fact))
    val err = intercept[IllegalStateException] {
      stream.planInputPartitions(FeedOffset(0L), FeedOffset(2L))
    }
    assert(err.getMessage.contains("compacted"))
    // a FRESH consumer replaying a pre-compaction range (-inf, e]
    // whose original batches were compacted away must ALSO fail —
    // silence would commit an empty batch and lose the prefix
    val replayHole = intercept[IllegalStateException] {
      stream.planInputPartitions(FeedOffset(-1L), FeedOffset(0L))
    }
    assert(replayHole.getMessage.contains("replaying its first micro-batch"))
  }

  test("startingOffset: latest skips the net bootstrap and history; an " +
       "out-of-range explicit id refuses at query start") {
    val root = Files.createTempDirectory("cdf_start").toString
    val fact = s"$root/fact"
    mergeBatch(fact, Seq(("a", "p1", 1L, 100L, "insert")))
    mergeBatch(fact, Seq(("b", "p2", 1L, 200L, "insert")))
    // latest: the AvailableNow drain target == the start → zero rows
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = ChangeFeedSource.read(spark, fact, startingOffset = Some("latest"))
      .writeStream
      .option("checkpointLocation", s"$root/ckL")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(df.count()); ()
      }.start()
    q.awaitTermination(120000)
    assert(seen.get() == 0, s"latest consumer must skip history, saw ${seen.get()}")
    // the SAME checkpoint then receives only post-start changes
    mergeBatch(fact, Seq(("c", "p3", 1L, 300L, "insert")))
    val seen2 = new java.util.concurrent.atomic.AtomicLong(0)
    val q2 = ChangeFeedSource.read(spark, fact, startingOffset = Some("latest"))
      .writeStream
      .option("checkpointLocation", s"$root/ckL")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen2.addAndGet(df.filter(col("id") === "c").count() * 1000 + df.count()); ()
      }.start()
    q2.awaitTermination(120000)
    assert(seen2.get() == 1001, s"post-start change must arrive alone, got ${seen2.get()}")
    // explicit id past the known range refuses at query start
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val q3 = ChangeFeedSource.read(spark, fact, startingOffset = Some("99"))
      .writeStream
      .option("checkpointLocation", s"$root/ckE")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[Exception] { q3.awaitTermination(120000) }
    assert(msgs(e).exists(_.contains("out of range")), s"got ${msgs(e)}")
    // an explicit id INSIDE the compacted prefix refuses at QUERY
    // START (the net above it would re-deliver applied history),
    // mirroring the MOR twin — not at the first mid-stream admission
    mergeBatch(fact, Seq(("d", "p4", 1L, 50L, "insert")))
    graft.io.ChangeFeed.compact(spark, fact, upTo = 2L)
    val q4 = ChangeFeedSource.read(spark, fact, startingOffset = Some("1"))
      .writeStream
      .option("checkpointLocation", s"$root/ckN")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e2 = intercept[Exception] { q4.awaitTermination(120000) }
    assert(msgs(e2).exists(m => m.contains("net=2") && m.contains("earliest")),
      s"got ${msgs(e2)}")
  }

  test("maxBatchesPerTrigger drains a backlog in bounded micro-batches") {
    val root = Files.createTempDirectory("cdf_admission").toString
    val fact = s"$root/fact"
    mergeBatch(fact, Seq(("a", "p1", 1L, 10L, "insert")))
    mergeBatch(fact, Seq(("b", "p2", 1L, 20L, "insert")))
    mergeBatch(fact, Seq(("a", "p1", 2L, 15L, "update")))
    val out = s"$root/out"
    val ids = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = ChangeFeedSource.read(spark, fact, maxBatchesPerTrigger = Some(1))
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        ids.add(id); df.write.mode("append").parquet(out); ()
      }.start()
    q.awaitTermination(120000)
    // three feed batches, capped at one per trigger -> three
    // micro-batches, content identical to an uncapped drain
    assert(ids.size == 3, s"expected 3 micro-batches, got $ids")
    import scala.jdk.CollectionConverters._
    assert(ids.asScala.toSeq == ids.asScala.toSeq.sorted)
    val got = spark.read.parquet(out)
      .select("id", "amount_cents", ChangeFeed.ChangeCol)
      .as[(String, Long, String)].collect().toSet
    assert(got == Set(("a", 10L, "add"), ("b", 20L, "add"),
      ("a", 10L, "retract"), ("a", 15L, "add")))
  }

  test("maxBytesPerTrigger drains heterogeneous batch sizes bounded by bytes") {
    val root = Files.createTempDirectory("cdf_bytes").toString
    val fact = s"$root/fact"
    // two thin batches, one FAT batch (thousands of rows), two thin:
    // a count cap alone cannot bound memory here, a byte cap can
    mergeBatch(fact, Seq(("a", "p1", 1L, 10L, "insert")))
    mergeBatch(fact, Seq(("b", "p2", 1L, 20L, "insert")))
    Upsert.merge(spark, fact,
      spark.range(4000).select(concat(lit("fat"), col("id")).as("id"),
        lit("p3").as("province_id"), lit(1L).as("ver"),
        col("id").as("amount_cents"), lit("insert").as("op")),
      pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"),
      changeLog = true)
    mergeBatch(fact, Seq(("c", "p4", 1L, 30L, "insert")))
    mergeBatch(fact, Seq(("d", "p5", 1L, 40L, "insert")))
    // byte budget sized between "two thin batches" and "thin + fat":
    // thin feed batches are a few KB, the fat one is much larger
    val feedDir = new org.apache.hadoop.fs.Path(ChangeFeed.dirFor(fact))
    val fs = feedDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizes = ChangeFeed.batches(spark, fact).map { case (id, p) =>
      id -> fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }
    val fat = sizes.map(_._2).max
    val thin = sizes.map(_._2).filter(_ != fat).max // largest THIN batch
    assert(fat > 3 * thin, s"fat batch must dominate: $sizes")
    val budget = thin * 2 + thin / 2 // fits any two thin, never thin+fat
    val out = s"$root/out"
    val ids = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = ChangeFeedSource.read(spark, fact,
      maxBytesPerTrigger = Some(budget))
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        ids.add(id); df.write.mode("append").parquet(out); ()
      }.start()
    q.awaitTermination(120000)
    // expected admission: [thin a + thin b], [FAT alone — oversized but
    // first-pending, progress over stall], [thin c + thin d]
    assert(ids.size == 3, s"expected 3 byte-bounded micro-batches, got $ids")
    val got = spark.read.parquet(out)
    assert(got.count() == 4004L)
    assert(got.filter(col("id").isin("a", "b", "c", "d")).count() == 4L)
  }

  test("a capped bootstrap over a compacted feed lands the net batch whole") {
    val root = Files.createTempDirectory("cdf_admission_net").toString
    val fact = s"$root/fact"
    mergeBatch(fact, Seq(("a", "p1", 1L, 10L, "insert")))
    mergeBatch(fact, Seq(("b", "p2", 1L, 20L, "insert")))
    ChangeFeed.compact(spark, fact, upTo = 1L)
    mergeBatch(fact, Seq(("c", "p3", 1L, 30L, "insert")))
    mergeBatch(fact, Seq(("d", "p4", 1L, 40L, "insert")))
    // batches() exposes only the newest net batch plus later ones, so
    // the bootstrap's first pending id IS the net and any cap ≥ 1
    // consumes that telescoped prefix whole; the remaining batches
    // drain one per micro-batch
    val dws = s"$root/dws"
    val q = IncrementalDws.streaming(spark, fact, dws,
      groupCols = Seq("province_id"), sumCols = Seq("amount_cents"),
      checkpointDir = s"$root/ckpt", trigger = Trigger.AvailableNow(),
      maxBatchesPerTrigger = Some(1))
    q.awaitTermination(120000)
    assert(served(dws) == fullRecompute(fact))
  }

  test("Trigger.Once overrides the cap: the single batch drains everything") {
    val root = Files.createTempDirectory("cdf_admission_once").toString
    val fact = s"$root/fact"
    mergeBatch(fact, Seq(("a", "p1", 1L, 10L, "insert")))
    mergeBatch(fact, Seq(("b", "p2", 1L, 20L, "insert")))
    mergeBatch(fact, Seq(("c", "p3", 1L, 30L, "insert")))
    // Once promises ONE micro-batch covering everything available —
    // Spark substitutes ReadLimit.allAvailable(), and the source must
    // honor the SUBSTITUTED limit, not its own cap, or backlog would
    // silently strand
    val ids = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val out = s"$root/out"
    @annotation.nowarn("cat=deprecation")
    val q = ChangeFeedSource.read(spark, fact, maxBatchesPerTrigger = Some(1))
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.Once())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        ids.add(id); df.write.mode("append").parquet(out); ()
      }.start()
    q.awaitTermination(120000)
    assert(ids.size == 1, s"Trigger.Once must run exactly one batch, got $ids")
    assert(spark.read.parquet(out).count() == 3L)
  }

  test("a rebuilt checkpoint cannot fold into an existing DWS lineage") {
    val root = Files.createTempDirectory("cdf_rebuild").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"
    mergeBatch(fact, Seq(("d1", "p1", 1L, 100L, "insert"),
      ("d2", "p2", 1L, 200L, "insert")))
    drain(fact, dws, s"$root/ckpt1")
    assert(served(dws) == fullRecompute(fact))
    // a NEW checkpoint restarts batch numbering AND source offsets:
    // folding the feed from scratch onto the already-folded table
    // would double-count — the lineage guard refuses loudly
    val q2 = IncrementalDws.streaming(spark, fact, dws,
      groupCols = Seq("province_id"), sumCols = Seq("amount_cents"),
      checkpointDir = s"$root/ckpt2", trigger = Trigger.AvailableNow())
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination(120000)
    }
    def ms(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ ms(x.getCause))
    assert(ms(e).exists(_.contains("rebuilt or relocated checkpoint")),
      s"got ${ms(e)}")
    // the guarded table is untouched
    assert(served(dws) == fullRecompute(fact))
  }

  test("a stream started after RENAME COLUMN serves old batches under the new name") {
    val root = Files.createTempDirectory("cdfren").toString
    val fact = s"$root/fact"
    mergeBatch(fact, Seq(("a", "p1", 1L, 100L, "insert"),
      ("b", "p2", 1L, 50L, "insert")))
    mergeBatch(fact, Seq(("a", "p1", 2L, 140L, "update")))
    Upsert.renameColumn(spark, fact, "amount_cents", "amt")
    val k = "spark.sql.parquet.fieldId.read.enabled"
    spark.conf.set(k, "true")
    try Upsert.merge(spark, fact,
        Seq(("c", "p1", 3L, 75L, "insert"))
          .toDF("id", "province_id", "ver", "amt", "op"),
        pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"),
        changeLog = true)
    finally spark.conf.unset(k)

    // fresh consumer from earliest: pre-rename batch files (name era 0)
    // must surface their values under the CURRENT name — per-era read
    // supports, never silent NULLs
    val out = s"$root/out"
    val q = ChangeFeedSource.read(spark, fact)
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.mode("append").parquet(out); ()
      }.start()
    q.awaitTermination(120000)
    val rows = spark.read.parquet(out)
      .select("id", "amt", ChangeFeed.ChangeCol)
      .as[(String, Long, String)].collect().toSet
    assert(rows == Set(("a", 100L, "add"), ("b", 50L, "add"),
      ("a", 100L, "retract"), ("a", 140L, "add"), ("c", 75L, "add")),
      s"got $rows")
  }
}
