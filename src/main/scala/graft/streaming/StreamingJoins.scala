package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming join operators (SURVEY.md §2.4 J1-J4).
  *
  * State-bounding design: every stream-stream join carries watermarks
  * on BOTH sides plus an event-time range condition, so Spark can
  * evict join state — the equivalent of the reference's
  * setIdleStateRetention TTLs (DwdTradeOrderDetail.java:20,
  * DwdTradeOrderPaySucDetail.java:19). Without the range condition,
  * stream-stream state grows unboundedly; with it, state is
  * O(watermark-window × arrival rate) regardless of total data size —
  * the property that matters at 100 TB/day.
  */
object StreamingJoins {

  /** J2 — stream-stream inner equi-join bounded by a time window.
    * Reference: DwdTradeOrderCancelDetail.java:61-81 (detail ⋈ cancel
    * on order_id, state TTL 5 s).
    */
  def boundedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       watermark: String, bound: String): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermark) else right
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $bound") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $bound"))
  }

  /** J3 — interval join: right.ts ∈ [left.ts - before, left.ts + after].
    * Reference: DwdTradeOrderPaySucDetail.intervalJoin (:123-148):
    * payment BETWEEN od.row_time - 15 min AND od.row_time + 5 s.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   watermark: String, before: String, after: String): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermark) else right
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after"))
  }

  /** J1 left-outer leg — watermarked stream-stream LEFT join: matched
    * rows emit immediately; unmatched left rows emit null-padded once
    * the watermark passes the join window (Spark's state-cleanup
    * point). This is the append-mode-honest version of the reference's
    * retraction-based left joins (SURVEY §7.4 risk 2) — the
    * foreachBatch join in DwdApps.orderDetail remains the low-latency
    * primary.
    */
  def boundedLeftOuterJoin(left: DataFrame, right: DataFrame, key: String,
                           leftTs: String, rightTs: String,
                           watermark: String, bound: String): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermark) else right
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $bound") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $bound"),
      "left_outer")
  }

  /** J4/J5/J7 — lookup join against a slowly-changing dimension.
    * Reference: FOR SYSTEM_TIME AS OF proc_time HBase lookups
    * (DwdInteractionCommentInfo.lookUpJoin:53-69) and the async/cached
    * variants (DimAsyncFunction.java:22-91). Spark: stream-static left
    * join; the static side is re-resolved every micro-batch, giving
    * "as of processing time" freshness; broadcast because dims are
    * small. The Redis cache + async I/O of the reference exist only to
    * hide per-record RPC latency — a set-oriented broadcast join has no
    * per-record RPC to hide.
    */
  def lookupJoin(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left_outer")
}
