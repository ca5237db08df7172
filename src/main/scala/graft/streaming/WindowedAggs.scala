package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregates (SURVEY.md §2.5 A1-A5, §2.6).
  *
  * The reference's DWS layer is event-time tumbling windows with
  * bounded out-of-orderness, results emitted once per window with
  * [stt, edt) stamps (e.g. DwsTrafficVcChArIsNewPageViewWindow.java:59,
  * watermark :111). Spark: withWatermark + window() in append mode —
  * finals emit when the watermark passes window end; late rows beyond
  * the watermark are dropped, matching Flink's default (no
  * allowed-lateness in the reference).
  *
  * These helpers work on BOTH streaming and batch DataFrames (the spec
  * pins values in batch; streaming runs share the code path).
  */
object WindowedAggs {

  /** A1/A2 — keyed tumbling-window aggregate with window stamps. */
  def keyedWindowAgg(events: DataFrame, tsCol: String, windowLen: String,
                     watermark: String, keys: Seq[String],
                     aggs: Seq[Column]): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val agged = wm.groupBy(window(col(tsCol), windowLen) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val rest = agged.columns.filter(_ != "window").map(col)
    agged.select(
      date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt") +:
      date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt") +:
      date_format(col("window.start"), "yyyy-MM-dd").as("cur_date") +:
      rest.toSeq: _*)
  }

  /** A3 — global (un-keyed) window reduce: same, no keys. */
  def globalWindowAgg(events: DataFrame, tsCol: String, windowLen: String,
                      watermark: String, aggs: Seq[Column]): DataFrame =
    keyedWindowAgg(events, tsCol, windowLen, watermark, Nil, aggs)
}
