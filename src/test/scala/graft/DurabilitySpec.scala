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

  test("interrupted compaction (durable .ready, crash before swap) is finished by batches()") {
    val root = Files.createTempDirectory("dur_compact").toString
    val fact = s"$root/fact"
    def mergeBatch(rows: Seq[(String, Long, Long)]): Unit =
      Upsert.merge(spark, fact, rows.toDF("id", "ver", "v"),
        pk = Seq("id"), versionCol = "ver", changeLog = true)
    mergeBatch(Seq(("k1", 1L, 10L), ("k2", 1L, 20L)))
    mergeBatch(Seq(("k1", 2L, 15L)))
    mergeBatch(Seq(("k3", 3L, 30L)))

    // simulate the crash window: the compacted net is durable under
    // .compact-2.ready but none of the prefix deletes / final rename ran
    val feedRoot = new Path(ChangeFeed.dirFor(fact))
    val fs = FsOps.fs(spark, feedRoot)
    val expected = spark.read.parquet(
      ChangeFeed.batches(spark, fact).map(_._2): _*)
    val net = expected.groupBy(expected.columns.filterNot(_ == ChangeFeed.ChangeCol)
        .toIndexedSeq.map(col): _*)
      .agg(sum(when(col(ChangeFeed.ChangeCol) === "add", 1L).otherwise(-1L)).as("__net"))
      .filter(col("__net") > 0).drop("__net")
      .withColumn(ChangeFeed.ChangeCol, lit("add"))
    net.write.parquet(new Path(feedRoot, ".compact-2.ready").toString)

    // next reader finishes the compaction instead of seeing a torn feed
    val after = ChangeFeed.batches(spark, fact)
    assert(after.map(_._1) == Seq(2L), s"expected single compacted batch, got $after")
    val content = spark.read.parquet(after.head._2)
      .filter(col(ChangeFeed.ChangeCol) === "add")
      .select("id", "ver", "v").as[(String, Long, Long)].collect().toSet
    assert(content == Set(("k1", 2L, 15L), ("k2", 1L, 20L), ("k3", 3L, 30L)))
  }

  test("the _applied watermark commits atomically inside the DWS table dir") {
    val root = Files.createTempDirectory("dur_applied").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"
    Upsert.merge(spark, fact, Seq(("d1", "p1", 1L, 100L))
      .toDF("id", "province_id", "ver", "amount_cents"),
      pk = Seq("id"), versionCol = "ver", changeLog = true)
    IncrementalDws.provinceOrderRefresh(spark, fact, dws)
    // the watermark file lives inside the table dir (one-rename commit)
    // and is invisible to the parquet reader
    assert(FsOps.readTextOpt(spark, new Path(s"$dws/table/_applied")).contains("0"))
    assert(IncrementalDws.current(spark, dws).get.columns.toSet ==
      Set("province_id", "amount_cents", "row_ct"))
    // caught-up refresh is still a no-op
    assert(IncrementalDws.provinceOrderRefresh(spark, fact, dws) == 0L)
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
