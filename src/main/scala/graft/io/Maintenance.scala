package graft.io

import org.apache.spark.sql.SparkSession

/** Threshold-gated maintenance atop the job-free health stats
  * (VERDICT r5 #4): [[graft.tools.TableDoctor]] REPORTS, this ACTS —
  * but only when a threshold crosses, so a scheduler (or a streaming
  * job's foreachBatch epilogue) can call it unconditionally after
  * every wave and pay exactly one metadata read while the table is
  * healthy.
  *
  * The DECISION is metadata-only — manifest props, file listings,
  * never a Spark job (SparkListener-gated in MaintenanceSpec). Each
  * ACTION is one of the existing maintenance primitives
  * ([[Upsert.compactBuckets]], [[Upsert.vacuum]],
  * [[MergeOnRead.compact]]), each of which takes the table's writer
  * lease itself — a concurrent writer makes the action abort loudly
  * ([[Upsert.ConcurrentWriterException]]) rather than race.
  *
  * Reference analog: the reference leans on Kafka compacted topics,
  * HBase compactions and Doris compaction daemons — all
  * threshold-driven background maintenance the engines run for it;
  * on bare parquet this object IS that daemon's policy loop.
  */
object Maintenance {

  /** Thresholds. A table is HEALTHY (no-op) while every figure is at
    * or below its limit; an action fires only when strictly above.
    */
  case class Policy(
      /** [[Upsert]]: compact any bucket holding more than this many
        * files (bloom point-merges add one per batch by design). */
      maxFilesPerBucket: Int = 8,
      /** [[Upsert]]: vacuum when reclaimable/(live+reclaimable) bytes
        * exceed this ratio AND the reclaimable bytes clear the floor —
        * superseded MVCC generations are the price of snapshot reads,
        * worth collecting only once they dominate. */
      maxReclaimableRatio: Double = 0.5,
      minReclaimableBytes: Long = 1L << 20,
      /** [[Upsert.vacuum]] retention: ≥ 2 keeps the previous snapshot
        * for readers that resolved it just before a commit. */
      keepManifests: Int = 2,
      /** [[MergeOnRead]]: fold the delta backlog into the base when it
        * exceeds either bound — batches bound read-side resolution
        * work, bytes bound the broadcast fast path. */
      maxDeltaBatches: Int = 8,
      maxDeltaBytes: Long = 64L << 20,
      /** [[Upsert]]: when a bloom PK is in use, rewrite buckets whose
        * live files lack sidecars once coverage falls below this
        * fraction (0 = never enforce). */
      minBloomCoverage: Double = 0.0,
      /** [[Upsert.rebucket]] trigger: when any bucket's live bytes
        * exceed this, re-place the table under enough buckets to bring
        * the largest back under (0 = never). ABSOLUTE size, not
        * skew-vs-median, deliberately: a hot key-mass stays the same
        * MULTIPLE of the median under any modulus (both spread
        * proportionally), so a relative trigger re-fires forever —
        * while the absolute trigger targets the real scale failure
        * (bucket > per-task scan budget) and provably converges:
        * doubling halves every bucket that holds many distinct keys.
        * A single giant KEY cannot split by placement at all; that
        * case belongs to partial clustering / the bucketized band
        * join, not here. */
      maxBucketBytes: Long = 0L)

  /** Policy pass over an [[Upsert]] table. Returns the actions taken,
    * empty when healthy; the empty path runs zero Spark jobs.
    */
  def runUpsert(spark: SparkSession, dir: String, pk: Seq[String],
                policy: Policy = Policy(),
                bloom: Boolean = false): Seq[String] = {
    val man = Upsert.currentManifest(spark, dir).getOrElse(return Nil)
    val actions = Seq.newBuilder[String]
    val over = man.files.count { case (b, fs) =>
      b >= 0 && fs.size > policy.maxFilesPerBucket
    }
    if (over > 0) {
      Upsert.compactBuckets(spark, dir, pk, policy.maxFilesPerBucket, bloom)
      actions += s"compactBuckets: $over buckets over ${policy.maxFilesPerBucket} files"
    }
    if (bloom && policy.minBloomCoverage > 0) {
      Upsert.stats(spark, dir).foreach { s =>
        val liveBuckets = man.files.count { case (b, fs) => b >= 0 && fs.nonEmpty }
        if (liveBuckets > 0 &&
            s.bloomBuckets.toDouble / liveBuckets < policy.minBloomCoverage) {
          // full per-bucket rewrite — the only way un-bloomed files
          // gain sidecars; gated behind an explicit coverage floor
          Upsert.compactBuckets(spark, dir, pk, maxFilesPerBucket = 0, bloom = true)
          actions += s"rebloom: coverage ${s.bloomBuckets}/$liveBuckets " +
            s"below ${policy.minBloomCoverage}"
        }
      }
    }
    if (policy.maxBucketBytes > 0) {
      val sizes = Upsert.bucketBytes(spark, dir)
      if (sizes.nonEmpty) {
        val biggest = sizes.values.max
        if (biggest > policy.maxBucketBytes) {
          val n = man.numBuckets(Upsert.DefaultNumBuckets)
          // smallest power-of-two factor that brings the largest
          // bucket under target (its keys spread ~evenly under the
          // finer modulus)
          var factor = 2
          while (biggest / factor > policy.maxBucketBytes && factor < 1024)
            factor *= 2
          Upsert.rebucket(spark, dir, n * factor)
          val median = sizes.values.toSeq.sorted.apply(sizes.size / 2)
          actions += s"rebucket: ${n} -> ${n * factor} buckets " +
            s"(largest $biggest B > ${policy.maxBucketBytes} B target, " +
            s"skew ${if (median > 0) biggest / median else -1}x median)"
        }
      }
    }
    // trigger on what THIS retention would actually free (not the
    // current-manifest reclaimable figure), so files kept for
    // previous-snapshot readers never re-trigger a no-op vacuum
    val (freeFiles, freeBytes) = Upsert.freeableBy(spark, dir, policy.keepManifests)
    Upsert.stats(spark, dir).foreach { s =>
      val denom = s.liveBytes + freeBytes
      if (denom > 0 && freeBytes >= policy.minReclaimableBytes &&
          freeBytes.toDouble / denom > policy.maxReclaimableRatio) {
        Upsert.vacuum(spark, dir, policy.keepManifests)
        actions += s"vacuum: $freeBytes freeable bytes ($freeFiles files)"
      }
    }
    actions ++= runFeed(spark, dir)
    actions.result()
  }

  /** Age the table's change feed out up to the slowest REGISTERED
    * subscriber ([[Subscribers.minWatermark]]): the applied prefix
    * telescopes into one net batch and its covered dirs are GC'd —
    * the feed stops accumulating one dir per merge forever. With no
    * registered subscribers this does NOTHING: an empty registry
    * means "consumers unknown", never "no consumers" (an unregistered
    * reader compacted past still fails loudly in `since`/`changes`,
    * but registered ones are simply never overtaken). No-op when the
    * table has no feed or the applied prefix is already one batch.
    */
  def runFeed(spark: SparkSession, dir: String): Seq[String] = {
    val feedRoot = new org.apache.hadoop.fs.Path(ChangeFeed.dirFor(dir))
    if (!FsOps.fs(spark, feedRoot).exists(feedRoot)) return Nil
    Subscribers.minWatermark(spark, dir) match {
      case Some(m) if m >= 0 &&
          ChangeFeed.batches(spark, dir).count(_._1 <= m) > 1 =>
        ChangeFeed.compact(spark, dir, m)
        Seq(s"feedCompact: telescoped the feed prefix <= $m " +
          "(slowest registered subscriber)")
      case _ => Nil
    }
  }

  /** Policy pass over a [[MergeOnRead]] table: fold the delta backlog
    * when it exceeds the policy bounds. Returns the action taken,
    * empty when healthy; the empty path runs zero Spark jobs.
    *
    * A RECORDED contract binds: a policy pass that knows only the
    * path (a scheduler sweeping table roots) must fold under the
    * table's own pk/version/deleteFlag/buckets, not the caller's
    * defaults — otherwise the first pass over a delete-flagged table
    * would refuse on a None-vs-recorded contradiction. The supplied
    * arguments only seed an UN-contracted root's first compaction.
    */
  def runMor(spark: SparkSession, dir: String, pk: Seq[String],
             versionCol: String, deleteFlagCol: Option[String] = None,
             numBuckets: Int = Upsert.DefaultNumBuckets,
             bloom: Boolean = false,
             policy: Policy = Policy(),
             sortBase: Boolean = true,
             upToLimit: Option[Long] = None): Seq[String] = {
    val st = MergeOnRead.stats(spark, dir)
    if (st.liveDeltaBatches > policy.maxDeltaBatches ||
        st.liveDeltaBytes > policy.maxDeltaBytes) {
      val (ePk, eVc, eDel, eN) = MergeOnRead.contract(spark, dir)
        .getOrElse((pk, versionCol, deleteFlagCol, numBuckets))
      // clamp to the slowest REGISTERED subscriber (r15): a policy
      // pass must never fold delta batches a registered consumer has
      // not applied yet — its next PRE-image resolve needs them. An
      // empty registry keeps the explicit/unbounded behavior
      // (status-quo: one retention cycle + the loud refusal).
      val gated = (upToLimit.toSeq ++
        Subscribers.minWatermark(spark, dir).toSeq).minOption
      if (gated.exists(_ < 0) ||
          gated.exists(_ <= MergeOnRead.compactedUpto(spark, dir)))
        return Seq(s"compact: held back at batch <= ${gated.get} " +
          "(registered-subscriber/limit clamp; nothing new to fold " +
          "behind it)")
      MergeOnRead.compact(spark, dir, ePk, eVc, eDel, eN, bloom,
        sortBase = sortBase, upToLimit = gated)
      Seq(s"compact: folded ${st.liveDeltaBatches} delta batches " +
        s"(${st.liveDeltaBytes} B) into the base" +
        (if (sortBase) ", pk-sorted" else "") +
        gated.fold("")(u => s", bounded to batch <= $u"))
    } else Nil
  }

  /** Layout-dispatching entry point: a directory holding a REAL
    * merge-on-read shape ([[MergeOnRead.isMorRoot]] — recorded
    * contract, committed base manifest, or committed delta batch) is a
    * [[MergeOnRead]] table, anything else an [[Upsert]] table.
    */
  def run(spark: SparkSession, dir: String, pk: Seq[String],
          versionCol: String, policy: Policy = Policy(),
          bloom: Boolean = false): Seq[String] = {
    val d = dir.stripSuffix("/")
    // structural probe (contract / base manifest / committed batch),
    // not bare path existence — a child merely named base/delta must
    // not reroute an Upsert table's maintenance
    if (MergeOnRead.isMorRoot(spark, d))
      runMor(spark, d, pk, versionCol, bloom = bloom, policy = policy)
    else runUpsert(spark, d, pk, policy, bloom)
  }
}
