package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.io.{ChangeFeed, Upsert}

/** The streaming SINK over Upsert tables: micro-batches land as the
  * table's own LWW merge (write half of the upsert-kafka equivalence;
  * [[ChangeFeedSource]] is the read half). Pins: LWW semantics across
  * epochs, exactly-once under kill/restart replay, the per-query epoch
  * watermark riding the SAME manifest commit as the content, feed
  * cooperation, and the contract guardrails.
  */
class UpsertStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def table(dir: String) =
    Upsert.read(spark, dir).select("k", "ver", "v").as[(String, Long, String)]

  test("micro-batches land as LWW merges; restart continues the same table") {
    val root = Files.createTempDirectory("ssink").toString
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    val in = MemoryStream[(String, Long, String)]
    def start() = UpsertStreamSink.writer(
      in.toDF().toDF("k", "ver", "v"), dir, pk = Seq("k"), versionCol = "ver",
      numBuckets = 4)
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()

    in.addData(("a", 1L, "a1"), ("b", 1L, "b1"))
    start().awaitTermination(120000)
    assert(table(dir).collect().toSet ==
      Set(("a", 1L, "a1"), ("b", 1L, "b1")))

    // second run from the SAME checkpoint: newer version wins, stale
    // version loses, new key appears — the table's own merge contract
    in.addData(("a", 2L, "a2"), ("b", 0L, "b0"), ("c", 1L, "c1"))
    start().awaitTermination(120000)
    assert(table(dir).collect().toSet ==
      Set(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1")))
    // no staging residue outside hidden dirs
    val hist = Upsert.history(spark, dir).collect()
    assert(hist.map(_.getString(2)).forall(Set("create", "merge")))
  }

  test("a replayed epoch is a no-op: the recorded watermark gates the merge") {
    val root = Files.createTempDirectory("ssink_replay").toString
    val dir = s"$root/t"
    Upsert.merge(spark, dir, Seq(("a", 1L, "a1")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val w = new UpsertStreamingWrite(dir,
      table(dir).schema, pk = Seq("k"), versionCol = "ver",
      numBuckets = 4, changeLog = false, queryId = "q-test")
    // stage one epoch's file the way an executor would
    val staged = s"$root/stage.parquet"
    Seq(("a", 2L, "a2")).toDF("k", "ver", "v").coalesce(1)
      .write.parquet(staged)
    val file = new java.io.File(staged).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    w.commit(7L, Array(StreamFileCommit(file)))
    val gensAfterFirst = Upsert.manifestGens(spark, dir).size
    assert(table(dir).collect().toSet == Set(("a", 2L, "a2")))
    // the sink's epoch watermark rides the same commit as the content
    val man = Upsert.currentManifest(spark, dir).get
    assert(man.props.get("streamEpoch.q-test").contains("7"))
    // replay of epoch 7 (crash between sink commit and checkpoint
    // advance): no new manifest generation, rows unchanged
    w.commit(7L, Array(StreamFileCommit(file)))
    assert(Upsert.manifestGens(spark, dir).size == gensAfterFirst)
    assert(table(dir).collect().toSet == Set(("a", 2L, "a2")))
  }

  test("a table with a change feed is FED by the sink, not refused") {
    val root = Files.createTempDirectory("ssink_feed").toString
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    Upsert.merge(spark, dir, Seq(("a", 1L, "a1")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4, changeLog = true)
    val before = ChangeFeed.batches(spark, dir).size
    val in = MemoryStream[(String, Long, String)]
    in.addData(("a", 2L, "a2"))
    UpsertStreamSink.writer(in.toDF().toDF("k", "ver", "v"), dir,
      pk = Seq("k"), versionCol = "ver")
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow())
      .start().awaitTermination(120000)
    // the epoch appended a retract batch (pre-image a1, post-image a2)
    val after = ChangeFeed.batches(spark, dir)
    assert(after.size == before + 1)
    val last = ChangeFeed.since(spark, dir, after.map(_._1).max - 1).get._1
      .select("k", "v", ChangeFeed.ChangeCol).as[(String, String, String)]
      .collect().toSet
    assert(last == Set(("a", "a1", "retract"), ("a", "a2", "add")))
  }

  test("contract guardrails: fresh table needs pk; recorded contract binds") {
    val root = Files.createTempDirectory("ssink_guard").toString
    val in = MemoryStream[(String, Long, String)]
    in.addData(("a", 1L, "a1"))
    // fresh table without pk option: loud at query start
    val q1 = in.toDF().toDF("k", "ver", "v").writeStream
      .format(classOf[UpsertStreamSink].getName)
      .option("path", s"$root/fresh")
      .option("checkpointLocation", s"$root/c1")
      .trigger(Trigger.AvailableNow()).start()
    val e1 = intercept[Exception] { q1.awaitTermination(120000) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(e1).exists(_.contains("needs .option(\"pk\"")))
    // existing table: a contradicting pk option refuses
    val dir = s"$root/t"
    Upsert.merge(spark, dir, Seq(("a", 1L, "a1")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val q2 = UpsertStreamSink.writer(in.toDF().toDF("k", "ver", "v"), dir,
      pk = Seq("v"), versionCol = "ver")
      .option("checkpointLocation", s"$root/c2")
      .trigger(Trigger.AvailableNow()).start()
    val e2 = intercept[Exception] { q2.awaitTermination(120000) }
    assert(msgs(e2).exists(_.contains("contradicts the recorded pk")))
  }

  test("guards: versionFromEpoch refuses non-epoch-bred tables; numBuckets contradictions refuse") {
    val root = Files.createTempDirectory("ssink_guards").toString
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val dir = s"$root/t"
    // a table bred by BATCH merges: its versionCol holds data-domain
    // versions — epoch counters (0,1,2,…) would lose every LWW
    // comparison and the stream would never change the table
    Upsert.merge(spark, dir,
      Seq(("a", 1700000000000L, "a1")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val in = MemoryStream[(String, String)]
    in.addData(("a", "a2"))
    val q1 = in.toDF().toDF("k", "v").writeStream
      .format(classOf[UpsertStreamSink].getName)
      .option("path", dir).option("versionFromEpoch", "true")
      .option("checkpointLocation", s"$root/c1")
      .trigger(Trigger.AvailableNow()).start()
    val e1 = intercept[Exception] { q1.awaitTermination(120000) }
    assert(msgs(e1).exists(_.contains("non-epoch writers")), s"got ${msgs(e1)}")
    // a numBuckets option contradicting the recorded placement refuses
    // at query start (silently ignoring it reads as a re-bucket)
    val in2 = MemoryStream[(String, Long, String)]
    in2.addData(("b", 2L, "b1"))
    val q2 = UpsertStreamSink.writer(in2.toDF().toDF("k", "ver", "v"), dir,
      pk = Seq("k"), versionCol = "ver", numBuckets = 16)
      .option("checkpointLocation", s"$root/c2")
      .trigger(Trigger.AvailableNow()).start()
    val e2 = intercept[Exception] { q2.awaitTermination(120000) }
    assert(msgs(e2).exists(_.contains("contradicts the recorded numBuckets")),
      s"got ${msgs(e2)}")
    // the recorded content is untouched by both refusals
    assert(Upsert.read(spark, dir).select("v").as[String].collect().toSeq ==
      Seq("a1"))
  }

  private def morTable(dir: String) =
    graft.io.MergeOnRead.read(spark, dir, Seq("k"), "ver")
      .select("k", "ver", "v").as[(String, Long, String)]

  test("mor mode: epochs land as O(batch) delta appends; LWW reads; maintenance folds mid-stream") {
    import graft.io.{Maintenance, MergeOnRead}
    val root = Files.createTempDirectory("ssink_mor").toString
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    val in = MemoryStream[(String, Long, String)]
    def start() = UpsertStreamSink.writer(
      in.toDF().toDF("k", "ver", "v"), dir, pk = Seq("k"), versionCol = "ver",
      numBuckets = 4, mor = true)
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()

    in.addData(("a", 1L, "a1"), ("b", 1L, "b1"))
    start().awaitTermination(120000)
    assert(morTable(dir).collect().toSet == Set(("a", 1L, "a1"), ("b", 1L, "b1")))
    // the epoch is a DELTA APPEND: one batch dir, no base generation —
    // the table was never rewritten
    assert(MergeOnRead.deltaBatches(spark, dir).size == 1)
    assert(Upsert.currentManifest(spark, s"$dir/base").isEmpty,
      "an epoch commit must never build a base")
    // the contract recorded durably at query start
    assert(MergeOnRead.contract(spark, dir)
      .contains((Seq("k"), "ver", None, 4)))

    // second run, same checkpoint: LWW across epochs (stale b0 loses)
    in.addData(("a", 2L, "a2"), ("b", 0L, "b0"), ("c", 1L, "c1"))
    start().awaitTermination(120000)
    assert(morTable(dir).collect().toSet ==
      Set(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1")))
    assert(MergeOnRead.deltaBatches(spark, dir).size == 2)

    // background maintenance folds the backlog; content unchanged and
    // later epochs keep appending against the compacted base
    val acts = Maintenance.runMor(spark, dir, Seq("k"), "ver",
      numBuckets = 4, policy = Maintenance.Policy(maxDeltaBatches = 0))
    assert(acts.nonEmpty, "expected a compaction")
    assert(Upsert.currentManifest(spark, s"$dir/base").isDefined)
    assert(morTable(dir).collect().toSet ==
      Set(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1")))
    in.addData(("d", 1L, "d1"))
    start().awaitTermination(120000)
    assert(morTable(dir).collect().toSet ==
      Set(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1"), ("d", 1L, "d1")))
  }

  test("mor mode: replay is a no-op at EVERY crash point; unacked stream batches survive GC") {
    import graft.io.MergeOnRead
    val root = Files.createTempDirectory("ssink_mor_replay").toString
    val dir = s"$root/t"
    MergeOnRead.recordContract(spark, dir, Seq("k"), "ver", None, 4)
    val schema = Seq(("a", 1L, "a1")).toDF("k", "ver", "v").schema
    val w = new UpsertStreamingWrite(dir, schema, pk = Seq("k"),
      versionCol = "ver", numBuckets = 4, changeLog = false,
      queryId = "q-mor", morMode = true)
    val staged = s"$root/stage.parquet"
    Seq(("a", 2L, "a2")).toDF("k", "ver", "v").coalesce(1).write.parquet(staged)
    val file = new java.io.File(staged).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath

    w.commit(7L, Array(StreamFileCommit(file)))
    assert(morTable(dir).collect().toSet == Set(("a", 2L, "a2")))
    assert(MergeOnRead.streamEpochApplied(spark, dir, "q-mor") == 7L)
    // plain replay (crash between sink commit and checkpoint advance):
    // the watermark gates — no new delta batch
    val n0 = MergeOnRead.deltaBatches(spark, dir).size
    w.commit(7L, Array(StreamFileCommit(file)))
    assert(MergeOnRead.deltaBatches(spark, dir).size == n0)

    // WORST crash point: batch committed, watermark write LOST, then
    // the table is compacted TWICE while the stream is down — the
    // folded batch would normally GC, but its stream marker is
    // unacknowledged, so gc must retain it for the replay
    val fs = graft.io.FsOps.fs(spark, new org.apache.hadoop.fs.Path(dir))
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_streamEpoch-q-mor"), false)
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", numBuckets = 4)
    MergeOnRead.merge(spark, dir, Seq(("x", 1L, "x1")).toDF("k", "ver", "v"))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", numBuckets = 4)
    MergeOnRead.gcCompactedDeltas(spark, dir, retainForReaders = false)
    val live = MergeOnRead.deltaBatches(spark, dir)
    assert(live.exists { case (_, p) =>
      fs.exists(new org.apache.hadoop.fs.Path(p, "_commit-stream-q-mor-7"))
    }, s"unacknowledged stream batch must survive GC, have $live")

    // the restarted stream replays epoch 7: the batch marker turns it
    // into a no-op and the watermark heals
    val n1 = MergeOnRead.deltaBatches(spark, dir).size
    w.commit(7L, Array(StreamFileCommit(file)))
    assert(MergeOnRead.deltaBatches(spark, dir).size == n1, "replay re-applied!")
    assert(MergeOnRead.streamEpochApplied(spark, dir, "q-mor") == 7L)
    assert(morTable(dir).collect().toSet ==
      Set(("a", 2L, "a2"), ("x", 1L, "x1")))
    // acknowledged now: the next gc collects the folded batch
    MergeOnRead.gcCompactedDeltas(spark, dir, retainForReaders = false)
    assert(!MergeOnRead.deltaBatches(spark, dir).exists { case (_, p) =>
      fs.exists(new org.apache.hadoop.fs.Path(p, "_commit-stream-q-mor-7"))
    })
  }

  test("two-producer matrix: distinct queryIds interleave legally on both " +
       "layouts; the same queryId from two drivers is FENCED loudly") {
    Seq(false, true).foreach { mor =>
      val root = Files.createTempDirectory(s"ssink_two_$mor").toString
      val dir = s"$root/t"
      // LEGAL: two producers with their OWN checkpoints (distinct
      // queryIds) interleave epochs into one table — LWW by version
      // resolves the union, and each lineage's replay watermark is
      // tracked independently
      val inA = MemoryStream[(String, Long, String)]
      val inB = MemoryStream[(String, Long, String)]
      def start(in: MemoryStream[(String, Long, String)], ckpt: String) =
        UpsertStreamSink.writer(in.toDF().toDF("k", "ver", "v"), dir,
          pk = Seq("k"), versionCol = "ver", numBuckets = 4, mor = mor)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
      inA.addData(("a", 1L, "a1"), ("b", 1L, "b1"))
      start(inA, s"$root/ckA").awaitTermination(120000)
      inB.addData(("a", 2L, "a2"), ("b", 0L, "b0"), ("c", 1L, "c1"))
      start(inB, s"$root/ckB").awaitTermination(120000)
      inA.addData(("d", 1L, "d1"), ("a", 0L, "a0"))
      start(inA, s"$root/ckA").awaitTermination(120000)
      val got = (if (mor) morTable(dir) else table(dir)).collect().toSet
      assert(got == Set(("a", 2L, "a2"), ("b", 1L, "b1"),
        ("c", 1L, "c1"), ("d", 1L, "d1")), s"mor=$mor: $got")
      val watermarks =
        if (mor) graft.io.MergeOnRead.streamEpochWatermarks(spark, dir).keySet
        else Upsert.currentManifest(spark, dir).get.props.keySet
          .filter(_.startsWith("streamEpoch.")).map(_.stripPrefix("streamEpoch."))
      assert(watermarks.size == 2,
        s"mor=$mor: two lineages must track independent watermarks, got $watermarks")

      // ILLEGAL: the SAME queryId from two drivers (split-brain
      // double-start). Without fencing the replay watermark would fold
      // the slower driver's epochs silently; with it, the newest
      // claimer wins and the superseded run fails LOUDLY on its next
      // commit — then the survivor continues unharmed.
      val schema = Seq(("x", 1L, "x")).toDF("k", "ver", "v").schema
      def stage(rows: Seq[(String, Long, String)], name: String): String = {
        val p = s"$root/$name"
        rows.toDF("k", "ver", "v").coalesce(1).write.parquet(p)
        new java.io.File(p).listFiles()
          .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
      }
      def mkW() = new UpsertStreamingWrite(dir, schema, pk = Seq("k"),
        versionCol = "ver", numBuckets = 4, changeLog = false,
        queryId = "q-dup", morMode = mor)
      val w1 = mkW(); val w2 = mkW()
      w1.commit(100L, Array(StreamFileCommit(stage(Seq(("p", 1L, "p1")), "f1"))))
      w2.commit(101L, Array(StreamFileCommit(stage(Seq(("q", 1L, "q1")), "f2"))))
      val e = intercept[IllegalStateException] {
        w1.commit(102L, Array(StreamFileCommit(stage(Seq(("r", 1L, "r1")), "f3"))))
      }
      assert(e.getMessage.contains("fenced"), s"mor=$mor: ${e.getMessage}")
      w2.commit(103L, Array(StreamFileCommit(stage(Seq(("s", 1L, "s1")), "f4"))))
      val fin = (if (mor) morTable(dir) else table(dir)).collect().toSet
      assert(fin.contains(("q", 1L, "q1")) && fin.contains(("s", 1L, "s1")) &&
        !fin.contains(("r", 1L, "r1")), s"mor=$mor: $fin")
    }
  }

  test("layout guards: mor=true refuses a CoW table dir; CoW mode refuses a MOR root") {
    import graft.io.MergeOnRead
    val root = Files.createTempDirectory("ssink_layout").toString
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    // an existing CoW table: a MOR epoch here would plant a delta log
    // the table's readers never resolve
    val cow = s"$root/cow"
    Upsert.merge(spark, cow, Seq(("a", 1L, "a1")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val in = MemoryStream[(String, Long, String)]
    in.addData(("a", 2L, "a2"))
    val q1 = UpsertStreamSink.writer(in.toDF().toDF("k", "ver", "v"), cow,
      pk = Seq("k"), versionCol = "ver", mor = true)
      .option("checkpointLocation", s"$root/c1")
      .trigger(Trigger.AvailableNow()).start()
    val e1 = intercept[Exception] { q1.awaitTermination(120000) }
    assert(msgs(e1).exists(_.contains("copy-on-write Upsert table")), s"got ${msgs(e1)}")
    // an existing MOR root: a CoW epoch here would commit a __gen tree
    // beside the delta log
    val mor = s"$root/mor"
    MergeOnRead.merge(spark, mor, Seq(("a", 1L, "a1")).toDF("k", "ver", "v"))
    val in2 = MemoryStream[(String, Long, String)]
    in2.addData(("a", 2L, "a2"))
    val q2 = UpsertStreamSink.writer(in2.toDF().toDF("k", "ver", "v"), mor,
      pk = Seq("k"), versionCol = "ver")
      .option("checkpointLocation", s"$root/c2")
      .trigger(Trigger.AvailableNow()).start()
    val e2 = intercept[Exception] { q2.awaitTermination(120000) }
    assert(msgs(e2).exists(_.contains("merge-on-read root")), s"got ${msgs(e2)}")
    // both dirs untouched by the refusals
    assert(Upsert.read(spark, cow).count() == 1L)
    assert(MergeOnRead.deltaBatches(spark, mor).size == 1)
  }

  test("mor mode guardrails: changeLog refuses; versionFromEpoch refuses foreign MOR roots") {
    import graft.io.MergeOnRead
    val root = Files.createTempDirectory("ssink_mor_guards").toString
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val in = MemoryStream[(String, Long, String)]
    in.addData(("a", 1L, "a1"))
    // delta batches ARE the change log — a second feed refuses
    val q1 = UpsertStreamSink.writer(in.toDF().toDF("k", "ver", "v"),
      s"$root/t1", pk = Seq("k"), versionCol = "ver", mor = true,
      changeLog = true)
      .option("checkpointLocation", s"$root/c1")
      .trigger(Trigger.AvailableNow()).start()
    val e1 = intercept[Exception] { q1.awaitTermination(120000) }
    assert(msgs(e1).exists(_.contains("already its change log")), s"got ${msgs(e1)}")
    // a MOR root bred by batch merges holds data-domain versions:
    // epoch counters would lose every LWW comparison
    val dir2 = s"$root/t2"
    MergeOnRead.merge(spark, dir2,
      Seq(("a", 1700000000000L, "a1")).toDF("k", "ver", "v"))
    val in2 = MemoryStream[(String, String)]
    in2.addData(("a", "a2"))
    val q2 = in2.toDF().toDF("k", "v").writeStream
      .format(classOf[UpsertStreamSink].getName)
      .option("path", dir2).option("mor", "true")
      .option("versionFromEpoch", "true").option("pk", "k")
      .option("checkpointLocation", s"$root/c2")
      .trigger(Trigger.AvailableNow()).start()
    val e2 = intercept[Exception] { q2.awaitTermination(120000) }
    assert(msgs(e2).exists(_.contains("no epoch-stamping stream bred")),
      s"got ${msgs(e2)}")
  }
}
