package graft.rtdw

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{ChangeFeed, Upsert}

/** Incrementally-maintained DWS aggregates over [[graft.io.Upsert]]
  * change feeds (VERDICT r1 #7 — the reference's retract-stream DWS
  * consumption, upsert-kafka → DwsTradeProvinceOrderWindow, without
  * full re-reads).
  *
  * refresh() folds only the UNAPPLIED change batches into the running
  * aggregate: retract rows enter with sign −1, add rows with +1, so
  * per-group Σ(sign·metric) telescopes to the value a full recompute
  * over the current table would produce (proved in IncrementalDwsSpec
  * across inserts, value corrections, and deletes). Per-refresh I/O is
  * O(new changes) + O(DWS table), never O(fact table).
  *
  * Maintains SUM/COUNT-class metrics (self-decomposable under
  * retraction). Distinct counts are not retract-decomposable — the
  * reference keeps a per-window id Set for those
  * (DwsTradeProvinceOrderWindow.java:117-145); at scale that metric
  * stays on the stateful/sketch path (A5/A7), not the delta fold.
  */
object IncrementalDws {

  private def tablePath(dwsDir: String) = s"$dwsDir/table"

  // The applied-watermark file lives INSIDE the table directory (the
  // underscore prefix hides it from parquet readers), so the aggregate
  // and its watermark commit in the single directory rename of
  // Upsert.overwriteAtomic — a crash can never leave the watermark
  // behind the table, which would re-fold (double-count) change batches
  // on the next refresh.
  private def appliedPath(dwsDir: String) = new Path(tablePath(dwsDir), "_applied")

  private def readApplied(spark: SparkSession, dwsDir: String): Long =
    graft.io.FsOps.readTextOpt(spark, appliedPath(dwsDir)).map(_.toLong).getOrElse(-1L)

  /** Read the current aggregate (empty-safe). */
  def current(spark: SparkSession, dwsDir: String): Option[DataFrame] =
    if (Upsert.exists(spark, tablePath(dwsDir))) Some(spark.read.parquet(tablePath(dwsDir)))
    else None

  /** Fold unapplied change batches of `factDir`'s feed into the
    * aggregate at `dwsDir`: groupCols × (Σ sumCols, row_ct). Returns
    * the applied batch id (unchanged when already caught up).
    */
  def refresh(spark: SparkSession, factDir: String, dwsDir: String,
              groupCols: Seq[String], sumCols: Seq[String]): Long = {
    val applied = readApplied(spark, dwsDir)
    ChangeFeed.since(spark, factDir, applied) match {
      case None => applied
      case Some((changes, maxBatch)) =>
        val sign = when(col(ChangeFeed.ChangeCol) === "add", lit(1L)).otherwise(lit(-1L))
        val aggs = sumCols.map(c => sum(col(c) * sign).as(c)) :+ sum(sign).as("row_ct")
        val delta = changes.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
        val next = current(spark, dwsDir) match {
          case None => delta
          case Some(prev) =>
            val cols = sumCols :+ "row_ct"
            prev.unionByName(delta)
              .groupBy(groupCols.map(col): _*)
              .agg(sum(col(cols.head)).as(cols.head),
                cols.tail.map(c => sum(col(c)).as(c)): _*)
        }
        // a group whose rows all retracted away vanishes, exactly as it
        // would from a full recompute; the watermark rides in the same
        // atomic swap as the table (see appliedPath)
        Upsert.overwriteAtomic(spark, tablePath(dwsDir), next.filter(col("row_ct") > 0),
          extraFiles = Map("_applied" -> maxBatch.toString))
        maxBatch
    }
  }

  /** DwsTradeProvinceOrderWindow on the delta path: per-province order
    * amount (integer cents) + row count, maintained from the
    * order-detail upsert feed instead of re-reading the fact table.
    */
  def provinceOrderRefresh(spark: SparkSession, orderDetailDir: String,
                           dwsDir: String): Long =
    refresh(spark, orderDetailDir, dwsDir,
      groupCols = Seq("province_id"), sumCols = Seq("amount_cents"))
}
