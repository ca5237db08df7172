package graft.streaming

import java.nio.charset.StandardCharsets
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
  * backfill. The high-watermark is one long (epoch micros) persisted
  * next to the checkpoint: restart-safe, O(1) state, no extra shuffle —
  * the split is a partition-local filter.
  */
object LateData {

  private def readHwm(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Long.MinValue
    else {
      val in = fs.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private def writeHwm(spark: SparkSession, path: String, hwm: Long): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(hwm.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Split `batch` into (onTime, late) against the persisted
    * high-watermark at `hwmPath`, then advance the watermark to the
    * max event time seen. Late = event time < hwm − delay, judged
    * against the watermark BEFORE this batch (Spark's own contract:
    * the watermark a batch is filtered by comes from the previous
    * progress). First batch: nothing is late.
    */
  def splitBatch(spark: SparkSession, batch: DataFrame, tsCol: String,
                 delay: String, hwmPath: String): (DataFrame, DataFrame) = {
    val delayMicros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    val delayUs = delayMicros.microseconds +
      delayMicros.days * 86400000000L // months unsupported by design
    val hwm = readHwm(spark, hwmPath)
    val us = unix_micros(col(tsCol))
    val (onTime, late) =
      if (hwm == Long.MinValue) (batch, batch.limit(0))
      else (batch.filter(us >= hwm - delayUs), batch.filter(us < hwm - delayUs))
    val batchMax = batch.agg(max(us)).head()
    if (!batchMax.isNullAt(0)) {
      val newHwm = math.max(hwm, batchMax.getLong(0))
      if (newHwm != hwm) writeHwm(spark, hwmPath, newHwm)
    }
    (onTime, late)
  }
}
