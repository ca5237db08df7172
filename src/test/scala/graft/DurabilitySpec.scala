package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.io.{ChangeFeed, FsOps, Upsert}
import graft.rtdw.IncrementalDws

/** ADVICE r2 + VERDICT r3 durability items: the io layer's commit
  * points must be idempotent under foreachBatch replay and recoverable
  * after a crash at any step — no double-applied deltas, no lost change
  * history, no watermark/table skew, and (r3 #1/#4) no torn or
  * half-visible table state: the manifest rename is the ONLY visibility
  * point, so a crash anywhere before it leaves the previous snapshot
  * exactly intact, and a reader that resolved the previous manifest
  * keeps a complete consistent view even while a multi-bucket merge
  * commits underneath it.
  */
class DurabilitySpec extends SparkSpec {
  import spark.implicits._

  test("merge(changeLog) with a commitId is idempotent under replay — no double delta") {
    val root = Files.createTempDirectory("dur_replay").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"

    def mergeOnce(id: String, rows: Seq[(String, String, Long, Long)]): Unit =
      Upsert.merge(spark, fact, rows.toDF("id", "province_id", "ver", "amount_cents"),
        pk = Seq("id"), versionCol = "ver", changeLog = true, commitId = Some(id))

    mergeOnce("b0", Seq(("d1", "p1", 1L, 100L), ("d2", "p2", 1L, 200L)))
    // replay of the SAME logical batch (crash after feed commit, before
    // or after the manifest flip — Spark re-invokes foreachBatch)
    mergeOnce("b0", Seq(("d1", "p1", 1L, 100L), ("d2", "p2", 1L, 200L)))
    assert(ChangeFeed.batches(spark, fact).size == 1,
      "replayed merge must not append a second change batch")

    mergeOnce("b1", Seq(("d1", "p1", 2L, 150L)))
    mergeOnce("b1", Seq(("d1", "p1", 2L, 150L))) // replay again
    assert(ChangeFeed.batches(spark, fact).map(_._1) == Seq(0L, 1L))

    // downstream delta fold still equals a full recompute
    IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    val inc = IncrementalDws.current(spark, dws).get
      .select("province_id", "amount_cents", "row_ct")
      .as[(String, Long, Long)].collect().toSet
    val full = Upsert.read(spark, fact).groupBy("province_id")
      .agg(sum(col("amount_cents")).as("amount_cents"), count(lit(1)).as("row_ct"))
      .as[(String, Long, Long)].collect().toSet
    assert(inc == full)
  }

  test("a crashed compaction can never truncate the feed: the net commit " +
       "is the one visibility switch, covered dirs stay invisible until swept") {
    val root = Files.createTempDirectory("dur_compact").toString
    val fact = s"$root/fact"
    def mergeBatch(rows: Seq[(String, Long, Long)]): Unit =
      Upsert.merge(spark, fact, rows.toDF("id", "ver", "v"),
        pk = Seq("id"), versionCol = "ver", changeLog = true)
    mergeBatch(Seq(("k1", 1L, 10L), ("k2", 1L, 20L)))
    mergeBatch(Seq(("k1", 2L, 15L)))
    mergeBatch(Seq(("k3", 3L, 30L)))

    // simulate the crash window AFTER the net=2 commit but BEFORE the
    // covered-dir sweep: the net is present, batch=0..2 still on disk
    val feedRoot = new Path(ChangeFeed.dirFor(fact))
    val fs = FsOps.fs(spark, feedRoot)
    val expected = spark.read.parquet(
      ChangeFeed.batches(spark, fact).map(_._2): _*)
    val net = expected.groupBy(expected.columns.filterNot(_ == ChangeFeed.ChangeCol)
        .toIndexedSeq.map(col): _*)
      .agg(sum(when(col(ChangeFeed.ChangeCol) === "add", 1L).otherwise(-1L)).as("__net"))
      .filter(col("__net") > 0).drop("__net")
      .withColumn(ChangeFeed.ChangeCol, lit("add"))
    net.write.parquet(new Path(feedRoot, "net=2").toString)

    // readers see ONLY the net — the covered prefix is invisible even
    // though its dirs still exist, and reads never mutate the feed
    val after = ChangeFeed.batches(spark, fact)
    assert(after.map(_._1) == Seq(2L), s"expected single compacted batch, got $after")
    assert(fs.exists(new Path(feedRoot, "batch=0")), "reads must not mutate")
    val content = spark.read.parquet(after.head._2)
      .filter(col(ChangeFeed.ChangeCol) === "add")
      .select("id", "ver", "v").as[(String, Long, Long)].collect().toSet
    assert(content == Set(("k1", 2L, 15L), ("k2", 1L, 20L), ("k3", 3L, 30L)))

    // numbering can never reset under the crash leftovers: a new
    // append lands ABOVE the net, and the next compact sweeps the
    // covered dirs while folding the net forward
    mergeBatch(Seq(("k4", 4L, 40L)))
    assert(ChangeFeed.batches(spark, fact).map(_._1) == Seq(2L, 3L))
    ChangeFeed.compact(spark, fact, upTo = 3L)
    assert(ChangeFeed.batches(spark, fact).map(_._1) == Seq(3L))
    assert(!fs.exists(new Path(feedRoot, "batch=0")), "sweep must collect covered dirs")
    assert(!fs.exists(new Path(feedRoot, "net=2")), "sweep must collect superseded nets")
    val finalContent = spark.read.parquet(
        ChangeFeed.batches(spark, fact).head._2)
      .filter(col(ChangeFeed.ChangeCol) === "add")
      .select("id", "ver", "v").as[(String, Long, Long)].collect().toSet
    assert(finalContent == Set(("k1", 2L, 15L), ("k2", 1L, 20L),
      ("k3", 3L, 30L), ("k4", 4L, 40L)))
  }

  test("the applied watermark commits in the same manifest rename as the DWS table") {
    val root = Files.createTempDirectory("dur_applied").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"
    Upsert.merge(spark, fact, Seq(("d1", "p1", 1L, 100L))
      .toDF("id", "province_id", "ver", "amount_cents"),
      pk = Seq("id"), versionCol = "ver", changeLog = true)
    IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    // the watermark is a manifest PROPERTY: content and watermark are
    // literally one commit (VERDICT r4 #1)
    val man = Upsert.currentManifest(spark, s"$dws/table").get
    assert(man.props.get("applied").contains("0"))
    assert(IncrementalDws.readApplied(spark, dws) == 0L)
    assert(IncrementalDws.current(spark, dws).get.columns.toSet ==
      Set("province_id", "amount_cents", "row_ct"))
    // caught-up refresh is still a no-op
    assert(IncrementalDws.provinceOrderRefresh(spark, fact, dws) == 0L)
  }

  test("readers racing DWS refreshes never see a missing table or a mixed snapshot (VERDICT r4 #1)") {
    val root = Files.createTempDirectory("dur_dws_race").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"
    // each wave rewrites BOTH provinces' single row to amount = wave ×
    // base, so any consistent DWS snapshot has p1 = 2 × p2 exactly; a
    // torn refresh (old p1 with new p2, or a half-written dir) breaks
    // the invariant, a vanished dir breaks the read itself
    def wave(v: Long): Unit = {
      Upsert.merge(spark, fact,
        Seq(("d1", "p1", v, 200L * v), ("d2", "p2", v, 100L * v))
          .toDF("id", "province_id", "ver", "amount_cents"),
        pk = Seq("id"), versionCol = "ver", changeLog = true)
      IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    }
    wave(1L)
    @volatile var torn: Option[String] = None
    @volatile var writerDone = false
    val writer = new Thread(() => {
      try (2L to 9L).foreach(wave) finally writerDone = true
    })
    val reader = new Thread(() => {
      while (!writerDone && torn.isEmpty) {
        IncrementalDws.current(spark, dws) match {
          case None => torn = Some("table vanished mid-refresh")
          case Some(df) =>
            val m = df.select("province_id", "amount_cents")
              .as[(String, Long)].collect().toMap
            if (m.size != 2 || m("p1") != 2 * m("p2"))
              torn = Some(s"mixed snapshot: $m")
        }
      }
    })
    writer.start(); reader.start()
    writer.join(300000); reader.join(300000)
    assert(torn.isEmpty, s"reader saw torn DWS state: $torn")
    val fin = IncrementalDws.current(spark, dws).get
      .select("province_id", "amount_cents").as[(String, Long)].collect().toMap
    assert(fin == Map("p1" -> 1800L, "p2" -> 900L))
  }

  test("writer lease: a second writer aborts loudly; vacuum refuses while a lease is live (VERDICT r4 #3)") {
    val root = Files.createTempDirectory("dur_lease").toString
    val dir = s"$root/t"
    Upsert.merge(spark, dir, Seq(("k1", 1L, "a")).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    // simulate a live holder: claim the lease out-of-band
    val fs = FsOps.fs(spark, new Path(dir))
    val lock = new Path(dir, "_lock")
    val out = fs.create(lock, false); out.write("holder".getBytes); out.close()
    intercept[Upsert.ConcurrentWriterException] {
      Upsert.merge(spark, dir, Seq(("k1", 2L, "b")).toDF("id", "ver", "v"),
        pk = Seq("id"), versionCol = "ver")
    }
    intercept[Upsert.ConcurrentWriterException] { Upsert.vacuum(spark, dir) }
    // the loser's abort left the holder's lease and the table untouched
    assert(FsOps.readTextOpt(spark, lock).contains("holder"))
    assert(Upsert.read(spark, dir).select("v").as[String].collect().toSeq == Seq("a"))
    // holder releases → writes proceed again
    fs.delete(lock, false)
    Upsert.merge(spark, dir, Seq(("k1", 2L, "b")).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    assert(Upsert.read(spark, dir).select("v").as[String].collect().toSeq == Seq("b"))
    assert(!fs.exists(lock), "a completed merge must release its lease")
    // a STALE lease (crashed holder) is taken over instead of wedging
    // the table forever
    val out2 = fs.create(lock, false); out2.write("crashed".getBytes); out2.close()
    spark.conf.set("spark.graft.lease.staleMs", "0")
    try {
      Upsert.merge(spark, dir, Seq(("k1", 3L, "c")).toDF("id", "ver", "v"),
        pk = Seq("id"), versionCol = "ver")
      assert(Upsert.read(spark, dir).select("v").as[String].collect().toSeq == Seq("c"))
    } finally spark.conf.unset("spark.graft.lease.staleMs")
  }

  test("a live holder outliving staleMs is NOT presumed crashed: heartbeats " +
       "keep the lease fresh for the whole body, takeover needs a dead process") {
    val root = Files.createTempDirectory("dur_beat").toString
    val dir = s"$root/t"
    Upsert.merge(spark, dir, Seq(("k1", 1L, "a")).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    spark.conf.set("spark.graft.lease.staleMs", "1000")
    try {
      @volatile var holderDone = false
      val holder = new Thread(() => {
        Upsert.withCompositeLease(spark, dir) { Thread.sleep(3000); holderDone = true }
      })
      holder.start()
      Thread.sleep(1500) // well past staleMs — only heartbeats keep it fresh
      intercept[Upsert.ConcurrentWriterException] {
        Upsert.merge(spark, dir, Seq(("k1", 2L, "steal")).toDF("id", "ver", "v"),
          pk = Seq("id"), versionCol = "ver")
      }
      holder.join()
      assert(holderDone, "holder body must have completed")
      // release frees the table for the next writer
      Upsert.merge(spark, dir, Seq(("k1", 3L, "c")).toDF("id", "ver", "v"),
        pk = Seq("id"), versionCol = "ver")
      assert(Upsert.read(spark, dir).select("v").as[String].collect().toSeq == Seq("c"))
    } finally spark.conf.unset("spark.graft.lease.staleMs")
  }

  test("two genuinely racing merges: exactly one content wins, every snapshot stays whole") {
    val root = Files.createTempDirectory("dur_race2").toString
    val dir = s"$root/t"
    Upsert.merge(spark, dir, Seq(("k1", 0L, "init")).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    // two writers hammer the same table; the lease serializes them —
    // each attempt either commits fully or throws ConcurrentWriter.
    // Afterwards the table must hold the single newest committed
    // version with an intact manifest chain (no clobbered metadata).
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val oks = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var unexpected: Option[Throwable] = None
    def writerThread(tag: String): Thread = new Thread(() => {
      (1 to 6).foreach { i =>
        try {
          Upsert.merge(spark, dir, Seq(("k1", i.toLong, s"$tag$i")).toDF("id", "ver", "v"),
            pk = Seq("id"), versionCol = "ver")
          oks.incrementAndGet()
        } catch {
          case _: Upsert.ConcurrentWriterException => errs.incrementAndGet()
          case t: Throwable => unexpected = Some(t)
        }
      }
    })
    val a = writerThread("a"); val b = writerThread("b")
    a.start(); b.start(); a.join(300000); b.join(300000)
    assert(unexpected.isEmpty,
      s"losers must abort ONLY with ConcurrentWriterException, got: ${unexpected.map(t =>
        t.toString + "\n" + t.getStackTrace.take(12).mkString("\n"))}")
    assert(oks.get() > 0, "at least one merge must have committed")
    // every loser aborted loudly; nothing was silently dropped
    assert(oks.get() + errs.get() == 12)
    val rows = Upsert.read(spark, dir).select("id", "ver", "v")
      .as[(String, Long, String)].collect()
    assert(rows.length == 1, s"exactly one row for k1, got ${rows.toSeq}")
    val (_, ver, v) = rows.head
    assert(v == s"a$ver" || v == s"b$ver", s"content must be one committed write, got $v")
    assert(!FsOps.fs(spark, new Path(dir)).exists(new Path(dir, "_lock")),
      "all leases released after the dust settles")
  }

  test("a crashed merge (staged generation, no manifest) is invisible; vacuum collects it") {
    val root = Files.createTempDirectory("dur_stage").toString
    val dir = s"$root/t"
    Upsert.merge(spark, dir, (1 to 100).map(i => (s"k$i", 1L, s"v$i"))
      .toDF("id", "ver", "payload"), pk = Seq("id"), versionCol = "ver")
    val before = Upsert.read(spark, dir).select("id", "payload")
      .as[(String, String)].collect().toMap
    val genBefore = Upsert.currentManifest(spark, dir).get.gen

    // simulate a merge that staged its output and died before the
    // manifest rename: data files exist under a NEW generation dir but
    // nothing references them
    val fs = FsOps.fs(spark, new Path(dir))
    (1 to 100).map(i => (s"k$i", 9L, "CRASHED")).toDF("id", "ver", "payload")
      .withColumn("__bucket", pmod(xxhash64(col("id")), lit(16)).cast("int"))
      .write.partitionBy("__bucket").parquet(s"$dir/__gen=${genBefore + 1}")

    // readers see the old snapshot, exactly
    assert(Upsert.currentManifest(spark, dir).get.gen == genBefore)
    val mid = Upsert.read(spark, dir).select("id", "payload")
      .as[(String, String)].collect().toMap
    assert(mid == before, "uncommitted staged generation must be invisible")

    // the next real merge is unaffected by the orphan (fresh gen number)
    Upsert.merge(spark, dir, Seq(("k1", 2L, "V1")).toDF("id", "ver", "payload"),
      pk = Seq("id"), versionCol = "ver")
    val afterMerge = Upsert.read(spark, dir).select("id", "payload")
      .as[(String, String)].collect().toMap
    assert(afterMerge("k1") == "V1")

    // vacuum GCs the orphaned generation
    Upsert.vacuum(spark, dir, keepManifests = 1)
    assert(!fs.exists(new Path(s"$dir/__gen=${genBefore + 1}")),
      "vacuum must collect the crashed generation")
    assert(Upsert.read(spark, dir).count() == 100)
  }

  test("snapshot isolation: a reader resolved pre-merge sees the full old table (VERDICT r3 #1)") {
    val root = Files.createTempDirectory("dur_snap").toString
    val dir = s"$root/t"
    Upsert.merge(spark, dir, (1 to 400).map(i => (s"k$i", 1L, s"v$i"))
      .toDF("id", "ver", "payload"), pk = Seq("id"), versionCol = "ver")
    val snapGen = Upsert.currentManifest(spark, dir).get.gen
    val oldContent = Upsert.readAt(spark, dir, snapGen)
      .select("id", "payload").as[(String, String)].collect().toMap

    // a merge that touches MANY buckets commits underneath the reader
    Upsert.merge(spark, dir, (1 to 400 by 3).map(i => (s"k$i", 2L, s"V$i"))
      .toDF("id", "ver", "payload"), pk = Seq("id"), versionCol = "ver")

    // the old snapshot re-resolves to EXACTLY the old content — full
    // old table, zero mixed buckets — because its files are immutable
    // and still on disk
    val oldAgain = Upsert.readAt(spark, dir, snapGen)
      .select("id", "payload").as[(String, String)].collect().toMap
    assert(oldAgain == oldContent, "pre-merge snapshot must stay fully consistent")
    assert(oldAgain.values.forall(_.startsWith("v")), "no new-version row may leak in")

    // the current snapshot is the complete new state
    val cur = Upsert.read(spark, dir).select("id", "payload")
      .as[(String, String)].collect().toMap
    assert((1 to 400 by 3).forall(i => cur(s"k$i") == s"V$i"))
    assert((2 to 400 by 3).forall(i => cur(s"k$i") == s"v$i"))

    // vacuum(keep=2) preserves the previous snapshot; keep=1 retires it
    Upsert.vacuum(spark, dir, keepManifests = 2)
    assert(Upsert.readAt(spark, dir, snapGen).count() == 400)
    Upsert.vacuum(spark, dir, keepManifests = 1)
    assert(Upsert.manifestAt(spark, dir, snapGen).isEmpty, "old manifest retired")
    assert(Upsert.read(spark, dir).count() == 400)
  }

  test("live concurrency: readers racing a merging writer only ever see whole snapshots") {
    val root = Files.createTempDirectory("dur_race").toString
    val dir = s"$root/t"
    // every commit rewrites ALL 200 keys (touching every bucket) to one
    // version, so ANY consistent snapshot has exactly 200 rows of ONE
    // distinct version — a torn multi-bucket read would mix versions
    def full(v: Long) = (1 to 200).map(i => (s"k$i", v, s"v$v")).toDF("id", "ver", "payload")
    Upsert.merge(spark, dir, full(0L), pk = Seq("id"), versionCol = "ver")

    @volatile var torn: Option[String] = None
    @volatile var writerDone = false
    val writer = new Thread(() => {
      try (1L to 8L).foreach { v =>
        Upsert.merge(spark, dir, full(v), pk = Seq("id"), versionCol = "ver")
      } finally writerDone = true
    })
    val reader = new Thread(() => {
      while (!writerDone && torn.isEmpty) {
        val rows = Upsert.read(spark, dir).select("ver", "payload")
          .as[(Long, String)].collect()
        val vs = rows.map(_._1).distinct
        if (rows.length != 200 || vs.length != 1 ||
            rows.exists { case (v, p) => p != s"v$v" })
          torn = Some(s"rows=${rows.length} versions=${vs.toSeq.sorted}")
      }
    })
    writer.start(); reader.start()
    writer.join(300000); reader.join(300000)
    assert(torn.isEmpty, s"reader saw a torn snapshot: $torn")
    val fin = Upsert.read(spark, dir).select("ver").distinct().as[Long].collect().toSeq
    assert(fin == Seq(8L))
  }

  test("a half-written initial CREATE is invisible until its manifest commits (VERDICT r3 #4)") {
    val root = Files.createTempDirectory("dur_create").toString
    val dir = s"$root/t"
    // simulate the crash: a create staged its files but died before the
    // manifest rename
    (1 to 50).map(i => (s"k$i", 1L, s"v$i")).toDF("id", "ver", "payload")
      .withColumn("__bucket", pmod(xxhash64(col("id")), lit(16)).cast("int"))
      .write.partitionBy("__bucket").parquet(s"$dir/__gen=0")
    assert(Upsert.readIfExists(spark, dir).isEmpty,
      "a table with no committed manifest does not exist")
    intercept[IllegalStateException] { Upsert.read(spark, dir) }

    // re-running the create commits a complete table in one rename
    Upsert.merge(spark, dir, (1 to 50).map(i => (s"k$i", 1L, s"v$i"))
      .toDF("id", "ver", "payload"), pk = Seq("id"), versionCol = "ver")
    assert(Upsert.read(spark, dir).count() == 50)
  }

  test("renameOrThrow surfaces a failed commit instead of swallowing it") {
    val root = Files.createTempDirectory("dur_rename").toString
    val p = new Path(root)
    val fs = FsOps.fs(spark, p)
    val src = new Path(root, "src")
    fs.mkdirs(src)
    val blocker = new Path(root, "blocker") // a regular FILE as dst parent
    fs.create(blocker, true).close()
    // local fs either returns false (→ our IllegalStateException) or
    // throws an IOException of its own — both fail the batch loudly,
    // which is the contract; silence is the only wrong outcome
    intercept[Exception] {
      FsOps.renameOrThrow(fs, src, new Path(blocker, "child"))
    }
    assert(fs.exists(src), "failed rename must leave the source intact")
  }
}
