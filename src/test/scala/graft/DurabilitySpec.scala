package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.io.{ChangeFeed, FsOps, Upsert}
import graft.rtdw.IncrementalDws

/** ADVICE r2 durability items: the io layer's commit points must be
  * idempotent under foreachBatch replay and recoverable after a crash
  * at any step — no double-applied deltas, no lost change history, no
  * watermark/table skew.
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
    // or after the bucket swap — Spark re-invokes foreachBatch)
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

  test("interrupted bucket swap (durable marker, crash before finish) is recovered losslessly") {
    val root = Files.createTempDirectory("dur_swap").toString
    val dir = s"$root/t"
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Upsert.merge(spark, dir, (1 to 400).map(i => (s"k$i", 1L, s"v$i"))
      .toDF("id", "ver", "payload"),
      pk = Seq("id"), versionCol = "ver", bloom = true)
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")

    // pick a multi-file bucket; treat one file as the merge candidate
    // and the rest as preserved
    val byBucket = spark.read.parquet(dir)
      .select(col("id"), org.apache.spark.sql.functions.input_file_name().as("f"),
        col("__bucket"))
      .as[(String, String, Int)].collect().groupBy(_._3)
    val (b, rows) = byBucket.find(_._2.map(_._2).distinct.length > 2).get
    val files = rows.map(_._2).distinct.map(f => f.substring(f.lastIndexOf('/') + 1))
    val candFile = files.head
    val kept = files.tail
    val replacedKeys = rows.filter(_._2.endsWith(candFile)).map(_._1).toSet
    val keptKeys = rows.filterNot(_._2.endsWith(candFile)).map(_._1).toSet

    // simulate the crash: staged replacement for the candidate file is
    // durable under <dir>.tmp, the marker (listing kept files) is
    // committed, but none of the finish steps ran
    replacedKeys.toSeq.map(k => (k, 2L, "NEW")).toDF("id", "ver", "payload")
      .coalesce(1).write.parquet(s"$dir.tmp/__bucket=$b")
    graft.io.FsOps.writeTextAtomic(spark,
      new org.apache.hadoop.fs.Path(dir, s".swap-$b.ready"), kept.mkString("\n"))

    // ANY entry point finishes the swap: read() here
    val after = Upsert.read(spark, dir).select("id", "payload")
      .as[(String, String)].collect().toMap
    assert(replacedKeys.forall(after(_) == "NEW"), "staged file must win")
    assert(keptKeys.forall(k => after(k) == s"v${k.drop(1)}"), "preserved files intact")
    assert(after.size == 400, "no key lost or duplicated")
    val fs = graft.io.FsOps.fs(spark, new org.apache.hadoop.fs.Path(dir))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, s".swap-$b.ready")),
      "marker consumed")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir.tmp/__bucket=$b")),
      "staged bucket swapped in")
    // recovery is idempotent
    Upsert.recoverSwaps(spark, dir)
    assert(Upsert.read(spark, dir).count() == 400)
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
