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

  private val ReadyRe = """\.compact-(\d+)\.ready""".r

  /** (batchId, path) for every committed change batch, ascending.
    * Completes any interrupted compaction first (see [[compact]]): a
    * `.compact-K.ready` directory is a fully-written net whose swap
    * didn't finish — finishing it here means no consumer ever sees a
    * truncated feed.
    */
  def batches(spark: SparkSession, tableDir: String): Seq[(Long, String)] = {
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    var st = fs.listStatus(root).toSeq
    val pendingCompacts = st.map(_.getPath.getName).collect { case ReadyRe(k) => k.toLong }
    if (pendingCompacts.nonEmpty) {
      pendingCompacts.foreach(k => finishCompaction(fs, root, k))
      st = fs.listStatus(root).toSeq
    }
    st.filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(s => (s.getPath.getName.stripPrefix("batch=").toLong, s.getPath.toString))
      .sortBy(_._1)
  }

  /** The batch already committed under `commitId`, if any. The marker
    * file rides INSIDE the batch directory (underscore-prefixed, so
    * parquet readers ignore it) and therefore commits atomically with
    * the batch's own rename.
    */
  def committedBatchFor(spark: SparkSession, tableDir: String,
                        commitId: String): Option[Long] = {
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    batches(spark, tableDir).find { case (_, p) =>
      fs.exists(new Path(p, s"_commit-$commitId"))
    }.map(_._1)
  }

  /** Commit `changes` as the next batch (staging dir + rename, so a
    * half-written batch is never visible). Returns the batch id.
    *
    * `commitId` makes the append IDEMPOTENT: when a batch carrying the
    * same id already exists (a replayed foreachBatch, a crash between
    * the feed commit and the caller's own commit) the append is a no-op
    * returning the existing batch id — downstream delta folds never see
    * the same change twice. Compaction keeps the markers of the batches
    * it nets (single-writer discipline: only compact past every
    * consumer's — and any possible replay's — watermark).
    */
  def append(spark: SparkSession, tableDir: String, changes: DataFrame,
             commitId: Option[String] = None): Long = {
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    commitId.flatMap(committedBatchFor(spark, tableDir, _)) match {
      case Some(existing) => existing // replay: already committed
      case None =>
        val next = batches(spark, tableDir).lastOption.map(_._1 + 1).getOrElse(0L)
        val tmp = new Path(root, s".batch-$next.tmp")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        changes.write.mode("overwrite").parquet(tmp.toString)
        commitId.foreach(id => fs.create(new Path(tmp, s"_commit-$id"), true).close())
        FsOps.renameOrThrow(fs, tmp, new Path(root, s"batch=$next"))
        next
    }
  }

  /** All change batches with id > `afterBatch`, with the max id read —
    * None when the consumer is already caught up.
    */
  def since(spark: SparkSession, tableDir: String,
            afterBatch: Long): Option[(DataFrame, Long)] = {
    val fresh = batches(spark, tableDir).filter(_._1 > afterBatch)
    if (fresh.isEmpty) None
    else Some((readBatchDirs(spark, fresh.map(_._2)), fresh.map(_._1).max))
  }

  /** Union batch dirs BY NAME: the table may have evolved between
    * batches, and a multi-path parquet read would silently impose one
    * batch's schema on all of them. Missing columns fill with NULL.
    */
  private def readBatchDirs(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.map(spark.read.parquet(_))
      .reduce(_.unionByName(_, allowMissingColumns = true))

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
    val prefix = batches(spark, tableDir).filter(_._1 <= upTo) // also recovers
    if (prefix.size <= 1) return
    val df = readBatchDirs(spark, prefix.map(_._2))
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
    // carry the prefix's idempotence markers into the net so a very
    // late replayed append still dedupes after compaction
    prefix.foreach { case (_, p) =>
      fs.listStatus(new Path(p)).iterator
        .filter(_.getPath.getName.startsWith("_commit-"))
        .foreach(m => fs.create(new Path(tmp, m.getPath.getName), true).close())
    }
    // COMMIT POINT: renaming .tmp -> .ready marks the net durable.
    // Everything after (delete prefix, rename into place) is
    // deterministic and idempotent — finishCompaction re-runs it after
    // any crash (triggered from batches()), so the feed's history can
    // never be lost to a crash between the deletes and the final rename.
    val ready = new Path(root, s".compact-$upTo.ready")
    if (fs.exists(ready)) fs.delete(ready, true)
    FsOps.renameOrThrow(fs, tmp, ready)
    finishCompaction(fs, root, upTo)
  }

  /** Idempotent second phase of [[compact]]: drop the prefix 0..upTo
    * and swap the durable `.compact-upTo.ready` net in as `batch=upTo`.
    */
  private def finishCompaction(fs: org.apache.hadoop.fs.FileSystem,
                               root: Path, upTo: Long): Unit = {
    val ready = new Path(root, s".compact-$upTo.ready")
    if (!fs.exists(ready)) return
    fs.listStatus(root).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(_.getPath.getName.stripPrefix("batch=").toLong <= upTo)
      .foreach(s => fs.delete(s.getPath, true))
    FsOps.renameOrThrow(fs, ready, new Path(root, s"batch=$upTo"))
  }
}
