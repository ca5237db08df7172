package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.{FsOps, MergeOnRead, Upsert}
import graft.rtdw.IncrementalDws

/** VERDICT r14 #2 — carried boundary images for bounded drains. While
  * a [[IncrementalDws.streamingMor]] consumer is behind, each fold
  * commits the resolved LWW state of every key it has seen or can see
  * coming (visible-backlog lookahead), and later triggers serve their
  * PRE images from that carry instead of re-resolving the base — one
  * base pass per drain, O(wave) per trigger at any wave density.
  *
  * Pins: (1) the image is committed while behind and GC'd at
  * catch-up, with the drained fold exactly equal to a full recompute
  * and to an uncarried drain; (2) a carried TOMBSTONE keeps beating a
  * later lower-versioned admitted row; (3) stale/orphan images are
  * detected (prop validAt + contract fingerprint) and swept, never
  * trusted; (4) a checkpointed mid-drain restart resumes onto the
  * carry exactly.
  */
class CarryImageSpec extends SparkSpec {
  import spark.implicits._

  private val pk = Seq("id")

  private def mkWave(w: Long, ids: Range, del: Boolean = false) =
    ids.map(i => (s"k$i", i % 5L, (i + w) * 10L, w,
      if (del) "delete" else "upsert"))
      .toDF("id", "gid", "cents", "__v", "op")

  private def fullRows(fact: String): Set[String] =
    MergeOnRead.read(spark, fact, pk, "__v", Some("op"))
      .groupBy(col("gid"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("row_ct"))
      .collect().map(_.mkString("|")).toSet

  private def servedRows(dws: String): Set[String] =
    IncrementalDws.current(spark, dws).get
      .select("gid", "cents", "row_ct")
      .collect().map(_.mkString("|")).toSet

  private def carryImgs(dws: String): Set[String] = {
    val root = new Path(s"$dws/carry")
    val fs = FsOps.fs(spark, root)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).map(_.getPath.getName).toSet
  }

  test("drain commits the image while behind, serves PREs from it, and GCs at catch-up") {
    val root = Files.createTempDirectory("carry").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"; val ckpt = s"$root/ckpt"
    MergeOnRead.merge(spark, fact, mkWave(1L, 0 until 120))
    MergeOnRead.recordContract(spark, fact, pk, "__v", Some("op"),
      Upsert.DefaultNumBuckets)
    // 10-batch backlog: disjoint-ish key slices plus corrections
    (2L to 11L).foreach(w => MergeOnRead.merge(spark, fact,
      mkWave(w, (w * 9).toInt until (w * 9 + 30).toInt)))

    // STEP 1 — stop once ≥2 triggers completed (the first may be the
    // kmin==0 bootstrap, which carries nothing): the consumer is
    // mid-drain, so the latest fold must have committed a carry
    val q1 = IncrementalDws.streamingMor(spark, fact, dws,
      groupCols = Seq("gid"), sumCols = Seq("cents"), checkpointDir = ckpt,
      maxBatchesPerTrigger = Some(2))
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (q1.isActive && System.nanoTime() < deadline &&
        q1.recentProgress.count(_.numInputRows > 0) < 2) Thread.sleep(50)
    q1.stop(); q1.awaitTermination(120000)
    val imgsMid = carryImgs(dws)
    assert(imgsMid.nonEmpty, "a mid-drain fold must commit a carry image")
    val prop = Upsert.currentManifest(spark, s"$dws/table").get
      .props.get("streamCarryAt")
    assert(prop.isDefined, "the carry prop must ride the fold's manifest")
    val Array(validAt, fp) = prop.get.split(":", 2)
    assert(imgsMid.contains(s"img-$validAt"),
      s"prop $prop must vouch for a present image, have $imgsMid")
    assert(fp == MergeOnRead.contractFingerprint(spark, fact))
    // the image's covered keys span at least the LOOKAHEAD (every key
    // of the visible not-yet-admitted backlog) and at most the whole
    // retained history's keys
    def keysOf(p: Long => Boolean): Long = {
      val parts = MergeOnRead.deltaBatches(spark, fact)
        .filter(t => p(t._1)).map { case (_, d) =>
          spark.read.parquet(d).select("id") }
      if (parts.isEmpty) 0L else parts.reduce(_.union(_)).distinct().count()
    }
    val covered = spark.read.parquet(s"$dws/carry/img-$validAt/keys").count()
    val lookPart = keysOf(_ > validAt.toLong)
    val allPart = keysOf(_ => true) + 120 // + the base wave's keys
    assert(covered >= lookPart && covered <= allPart,
      s"covered=$covered must span the lookahead=$lookPart (≤ $allPart)")

    // STEP 2 — drain to completion: exact, and the carry is GC'd
    val q2 = IncrementalDws.streamingMor(spark, fact, dws,
      groupCols = Seq("gid"), sumCols = Seq("cents"), checkpointDir = ckpt,
      maxBatchesPerTrigger = Some(2))
    q2.awaitTermination(300000)
    assert(servedRows(dws) == fullRows(fact),
      "the carried drain must equal a full recompute")
    assert(carryImgs(dws).isEmpty,
      s"catch-up must GC the carry, have ${carryImgs(dws)}")

    // and an UNCARRIED drain of the same fact agrees row-for-row
    val q3 = IncrementalDws.streamingMor(spark, fact, s"$root/dws_nc",
      groupCols = Seq("gid"), sumCols = Seq("cents"),
      checkpointDir = s"$root/ckpt_nc", maxBatchesPerTrigger = Some(2),
      carryBoundaryImages = false)
    q3.awaitTermination(300000)
    assert(servedRows(s"$root/dws_nc") == servedRows(dws))
    assert(carryImgs(s"$root/dws_nc").isEmpty, "carry off writes no images")
  }

  test("a carried tombstone beats a later lower-versioned admitted row") {
    val root = Files.createTempDirectory("carry_del").toString
    val fact = s"$root/fact"
    MergeOnRead.merge(spark, fact, mkWave(1L, 0 until 40))
    MergeOnRead.recordContract(spark, fact, pk, "__v", Some("op"),
      Upsert.DefaultNumBuckets)
    // backlog: delete k0..k9 at v=9, then a LOSING reinsert at v=5 —
    // drained at cap=1 the tombstones live in the CARRY when the
    // reinsert's trigger resolves its PRE
    MergeOnRead.merge(spark, fact,
      mkWave(9L, 0 until 10, del = true))
    MergeOnRead.merge(spark, fact, mkWave(5L, 0 until 10))
    val q = IncrementalDws.streamingMor(spark, fact, s"$root/dws",
      groupCols = Seq("gid"), sumCols = Seq("cents"),
      checkpointDir = s"$root/ckpt", maxBatchesPerTrigger = Some(1))
    q.awaitTermination(300000)
    assert(servedRows(s"$root/dws") == fullRows(fact),
      "deleted keys must stay deleted through the carried PRE")
    // the full recompute indeed shows the keys gone (guards mkWave)
    val liveIds = MergeOnRead.read(spark, fact, pk, "__v", Some("op"))
      .select("id").as[String].collect().toSet
    assert((0 until 10).forall(i => !liveIds(s"k$i")), s"live=$liveIds")
  }

  test("stale and orphan images are ignored and swept, never trusted") {
    val root = Files.createTempDirectory("carry_stale").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"
    MergeOnRead.merge(spark, fact, mkWave(1L, 0 until 60))
    MergeOnRead.recordContract(spark, fact, pk, "__v", Some("op"),
      Upsert.DefaultNumBuckets)
    MergeOnRead.merge(spark, fact, mkWave(2L, 0 until 30))
    val q = IncrementalDws.streamingMor(spark, fact, dws,
      groupCols = Seq("gid"), sumCols = Seq("cents"),
      checkpointDir = s"$root/ckpt", maxBatchesPerTrigger = Some(1))
    q.awaitTermination(300000)
    assert(servedRows(dws) == fullRows(fact))

    // plant a POISONED image exactly where the next trigger would look
    // (validAt = current newest batch), with garbage values — without
    // a manifest prop vouching for it, it must be ignored and swept
    val at = MergeOnRead.deltaBatches(spark, fact).map(_._1)
      .foldLeft(MergeOnRead.compactedUpto(spark, fact))(math.max)
    mkWave(99L, 0 until 60).withColumn("cents", lit(777777L))
      .write.parquet(s"$dws/carry/img-$at/rows")
    mkWave(99L, 0 until 60).select("id")
      .write.parquet(s"$dws/carry/img-$at/keys")
    mkWave(99L, 0 until 60).select("id")
      .write.parquet(s"$dws/carry/img-999/keys")

    MergeOnRead.merge(spark, fact, mkWave(3L, 0 until 60))
    MergeOnRead.merge(spark, fact, mkWave(4L, 10 until 50))
    val q2 = IncrementalDws.streamingMor(spark, fact, dws,
      groupCols = Seq("gid"), sumCols = Seq("cents"),
      checkpointDir = s"$root/ckpt", maxBatchesPerTrigger = Some(1))
    q2.awaitTermination(300000)
    assert(servedRows(dws) == fullRows(fact),
      "an unvouched image must never contaminate the fold")
    assert(carryImgs(dws).isEmpty,
      s"poisoned/orphan images must be swept, have ${carryImgs(dws)}")
  }
}
