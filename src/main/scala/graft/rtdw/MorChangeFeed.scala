package graft.rtdw

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{ChangeFeed, MergeOnRead, Upsert}
import graft.sources.MorChangeFeedSource

/** Turns a merge-on-read root's raw delta-batch rows (the
  * [[graft.sources.MorChangeFeedSource]] stream) into the retract/add
  * stream the incremental DWS fold consumes (VERDICT r10 #5).
  *
  * A MOR delta batch is an UPSERT log: it carries each key's NEW row
  * but not the value it superseded, so a subscriber maintaining a
  * retract-decomposable aggregate (Σ, count) needs the PRE-image from
  * the table itself. For the admitted batch range [kmin, kmax] this
  * emits, per touched key:
  *
  *   retract = the key's resolved row AS OF batch kmin−1
  *             ([[MergeOnRead.snapshotAt]] — pinned, exact)
  *   add     = the key's resolved row AS OF batch kmax
  *
  * which telescopes identically to the CoW feed's per-merge
  * retract/add pairs: inserts emit only an add, updates a retract+add,
  * deletes only a retract, and a batch row that LOSES LWW resolution
  * emits equal retract and add that cancel in the signed fold — no
  * case analysis, the snapshot resolution is the case analysis.
  *
  * Scale shape: both images restrict to the batch's OWN keys. Small
  * batches (≤ `maxPointKeys` distinct keys, single-column pk) resolve
  * through [[MergeOnRead.lookupPinned]] — manifest + Bloom candidate
  * files, the HBase-Get shape, O(batch keys × candidate files)
  * whatever the base size. Bigger batches fall back to a broadcast
  * LEFT SEMI of the keys against the pinned resolved read: the base
  * never shuffles (the read's own contract) and column pruning cuts
  * the scan to pk + consumed columns, but file I/O is O(base) — the
  * same trade [[graft.io.Upsert.merge]] makes past its own point-batch
  * cap. Reference analog: DWS jobs re-keying Doris/HBase state per
  * retract batch (DwsTradeProvinceOrderWindow.java:117-145).
  */
object MorChangeFeed {

  /** The retract/add stream for one admitted micro-batch of raw feed
    * rows (must carry [[MorChangeFeedSource.BatchCol]]). Returns an
    * empty frame for an empty batch.
    */
  def retractStream(spark: SparkSession, morRoot: String, raw: DataFrame,
                    maxPointKeys: Int = 1024): DataFrame = {
    val (pk, vc, del, n) = MergeOnRead.contract(spark, morRoot).getOrElse(
      throw new UnsupportedOperationException(
        s"$morRoot records no contract — the feed consumer needs pk/version"))
    val bounds = raw.agg(
      min(col(MorChangeFeedSource.BatchCol)).as("kmin"),
      max(col(MorChangeFeedSource.BatchCol)).as("kmax")).head()
    if (bounds.isNullAt(0))
      return raw.drop(MorChangeFeedSource.BatchCol).limit(0)
        .withColumn(ChangeFeed.ChangeCol, lit(""))
    val (kmin, kmax) = (bounds.getLong(0), bounds.getLong(1))
    val keys = raw.select(pk.map(col): _*).distinct()

    // point path: bounded key set + single-column pk -> pinned Bloom
    // lookups, O(candidate files) per image whatever the base size
    val pointKeys: Option[Seq[String]] =
      if (pk.length != 1) None
      else {
        val ks = keys.select(col(pk.head).cast("string"))
          .limit(maxPointKeys + 1).collect().map(_.getString(0)).toSeq
        if (ks.size > maxPointKeys || ks.contains(null)) None else Some(ks)
      }

    def imageAt(v: Long, restrict: Boolean = true): DataFrame = {
      val snap = MergeOnRead.snapshotAt(spark, morRoot, v)
      if (!restrict)
        MergeOnRead.readPinned(spark, morRoot, snap, pk, vc, del,
          MergeOnRead.DefaultBroadcastDeltaBytes)
      else pointKeys match {
        case Some(ks) =>
          MergeOnRead.lookupPinned(spark, morRoot, snap, pk.head, ks, vc, del, n)
        case None =>
          val resolved = MergeOnRead.readPinned(spark, morRoot, snap, pk, vc,
            del, MergeOnRead.DefaultBroadcastDeltaBytes)
          resolved.join(broadcast(keys),
            pk.map(c => resolved(c) <=> keys(c)).reduce(_ && _), "left_semi")
      }
    }
    // kmin == 0 is the BOOTSTRAP: nothing precedes the range — the
    // pre-image is empty, and every resolved row at kmax stems from
    // the admitted batches, so the post-image is the FULL resolved
    // read with no key restriction (a bootstrap semi-join would
    // broadcast the whole table's key set for nothing)
    val pre =
      if (kmin == 0L) imageAt(kmax).limit(0)
      else imageAt(kmin - 1)
    val post = imageAt(kmax, restrict = kmin != 0L)
    pre.withColumn(ChangeFeed.ChangeCol, lit("retract"))
      .unionByName(post.withColumn(ChangeFeed.ChangeCol, lit("add")),
        allowMissingColumns = true)
  }

  /** Self-check surface for specs: the batch-range net effect equals
    * the snapshot diff for the touched keys.
    */
  private[graft] def contractOf(spark: SparkSession, morRoot: String)
      : (Seq[String], String, Option[String], Int) =
    MergeOnRead.contract(spark, morRoot).getOrElse(
      throw new Upsert.NoTableException(s"no contract under $morRoot"))
}
