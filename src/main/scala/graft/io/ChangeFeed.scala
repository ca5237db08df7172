package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Poor-man's change-data-feed for [[Upsert]] tables.
  *
  * Each merge with changeLog=true appends one retract-encoded batch:
  *
  *   <table>_changes/batch=K/part-*.parquet
  *     … data columns …, __change ∈ {retract, add}
  *
  * `retract` rows are the pre-image of every key the merge touched,
  * `add` rows the surviving post-image — the file-based equivalent of
  * the reference's upsert-kafka retract topics (SQLUtil.java:46-54,
  * consumed by the DWS layer at DwdTradeOrderDetail.java:46-66). A
  * downstream SUM/COUNT aggregate refreshes from batches alone:
  * Σ(add) − Σ(retract) telescopes to the table's current content, so
  * per-refresh I/O is O(new changes), never O(table) — the property
  * that makes continuously-maintained DWS aggregates viable at 100 TB.
  * On a lakehouse deployment this object is replaced by the format's
  * native CDF; [[graft.rtdw.IncrementalDws]] doesn't change shape.
  */
object ChangeFeed {

  val ChangeCol = "__change"

  def dirFor(tableDir: String): String = tableDir.stripSuffix("/") + "_changes"

  /** (batchId, path) for every committed change batch, ascending. */
  def batches(spark: SparkSession, tableDir: String): Seq[(Long, String)] = {
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(s => (s.getPath.getName.stripPrefix("batch=").toLong, s.getPath.toString))
      .sortBy(_._1)
  }

  /** Commit `changes` as the next batch (staging dir + rename, so a
    * half-written batch is never visible). Returns the batch id.
    */
  def append(spark: SparkSession, tableDir: String, changes: DataFrame): Long = {
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = batches(spark, tableDir).lastOption.map(_._1 + 1).getOrElse(0L)
    val tmp = new Path(root, s".batch-$next.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    changes.write.mode("overwrite").parquet(tmp.toString)
    fs.rename(tmp, new Path(root, s"batch=$next"))
    next
  }

  /** All change batches with id > `afterBatch`, with the max id read —
    * None when the consumer is already caught up.
    */
  def since(spark: SparkSession, tableDir: String,
            afterBatch: Long): Option[(DataFrame, Long)] = {
    val fresh = batches(spark, tableDir).filter(_._1 > afterBatch)
    if (fresh.isEmpty) None
    else Some((spark.read.parquet(fresh.map(_._2): _*), fresh.map(_._1).max))
  }

  /** Compact the batch prefix `0..upTo` into one net batch at id
    * `upTo`, so a FRESH consumer bootstraps from O(table-touched-keys)
    * rows instead of replaying the full merge history. The net of the
    * prefix is computed without schema knowledge: identical rows cancel
    * retract-against-add (for a PK table the per-row net is 0 or 1; the
    * general multiset case is expanded). Only compact up to the
    * slowest consumer's applied watermark — a consumer whose watermark
    * is INSIDE the compacted range would double-count (single-writer
    * discipline, same as the rest of this io layer).
    */
  def compact(spark: SparkSession, tableDir: String, upTo: Long): Unit = {
    import org.apache.spark.sql.functions._
    val prefix = batches(spark, tableDir).filter(_._1 <= upTo)
    if (prefix.size <= 1) return
    val df = spark.read.parquet(prefix.map(_._2): _*)
    val dataCols = df.columns.filterNot(_ == ChangeCol).toSeq
    val net = df
      .groupBy(dataCols.map(col): _*)
      .agg(sum(when(col(ChangeCol) === "add", 1L).otherwise(-1L)).as("__net"))
      .filter(col("__net") > 0)
      .withColumn("__i", explode(sequence(lit(1L), col("__net"))))
      .select(dataCols.map(col): _*)
      .withColumn(ChangeCol, lit("add"))
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(root, s".compact-$upTo.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    net.write.mode("overwrite").parquet(tmp.toString)
    prefix.foreach { case (_, path) => fs.delete(new Path(path), true) }
    fs.rename(tmp, new Path(root, s"batch=$upTo"))
  }
}
