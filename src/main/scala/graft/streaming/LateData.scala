package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Late-data side output — the observability the reference lacks: it
  * configures no allowed-lateness and no side-output anywhere, so
  * watermark-dropped rows vanish silently (SURVEY §2.8). Spark surfaces
  * only a COUNT (StreamingQueryProgress.stateOperators.
  * numRowsDroppedByWatermark); at 100 TB you want the rows.
  *
  * `splitBatch` is the foreachBatch-side split: rows whose event time
  * trails the persisted high-watermark by more than `delay` are LATE —
  * the same previous-progress watermark contract Spark's stateful
  * operators drop by, applied before they get the chance, so the late
  * rows can be counted, sampled, or parked in a quarantine table for
  * backfill. The high-watermark is one long (epoch micros) per batch
  * id persisted next to the checkpoint (older ids pruned): restart- AND
  * replay-safe, O(1) state, no extra shuffle — the split is a
  * partition-local filter.
  */
object LateData {

  // The high-watermark is persisted PER BATCH ID: hwmDir/<batchId>
  // holds the running max event time as of that batch. A batch reads
  // the hwm recorded by the latest batch BEFORE it — so a replayed
  // foreachBatch (same batchId, after a crash between split and sink
  // commit) re-splits against exactly the watermark the first attempt
  // used, never against its own max event time. Files older than the
  // one a batch reads can never be read again (Spark replays at most
  // the current batch) and are pruned.

  private def listHwms(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[Long] = {
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong)
  }

  private def hwmBefore(spark: SparkSession, dir: Path, batchId: Long): Long = {
    val fs = graft.io.FsOps.fs(spark, dir)
    listHwms(fs, dir).filter(_ < batchId).sorted.lastOption
      .flatMap(id => graft.io.FsOps.readTextOpt(spark, new Path(dir, id.toString)))
      .map(_.toLong).getOrElse(Long.MinValue)
  }

  /** Split `batch` into (onTime, late) against the high-watermark
    * persisted by the PREVIOUS batch id, then record this batch's
    * running-max watermark under its own id. Late = event time <
    * hwm − delay (Spark's own contract: the watermark a batch is
    * filtered by comes from the previous progress). First batch:
    * nothing is late. Writing under `batchId` (never mutating earlier
    * ids) makes the split replay-stable — the caller persists its
    * outputs idempotently (e.g. Sinks.exactlyOnceBatch) and a replay
    * reproduces the identical (onTime, late) partition.
    */
  def splitBatch(spark: SparkSession, batch: DataFrame, tsCol: String,
                 delay: String, hwmDir: String, batchId: Long): (DataFrame, DataFrame) = {
    val delayMicros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    val delayUs = delayMicros.microseconds +
      delayMicros.days * 86400000000L // months unsupported by design
    val dir = new Path(hwmDir)
    val hwm = hwmBefore(spark, dir, batchId)
    val us = unix_micros(col(tsCol))
    val (onTime, late) =
      if (hwm == Long.MinValue) (batch, batch.limit(0))
      else (batch.filter(us >= hwm - delayUs), batch.filter(us < hwm - delayUs))
    val batchMax = batch.agg(max(us)).head()
    val newHwm = if (batchMax.isNullAt(0)) hwm else math.max(hwm, batchMax.getLong(0))
    if (newHwm != Long.MinValue) {
      // deterministic for a given (batchId, data): a replay overwrites
      // with the same value
      graft.io.FsOps.writeTextAtomic(spark, new Path(dir, batchId.toString), newHwm.toString)
      val fs = graft.io.FsOps.fs(spark, dir)
      listHwms(fs, dir).filter(_ < batchId - 1)
        .foreach(id => fs.delete(new Path(dir, id.toString), false))
    }
    (onTime, late)
  }
}
