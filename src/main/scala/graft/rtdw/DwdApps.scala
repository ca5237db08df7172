package graft.rtdw

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's DWD-layer apps (SURVEY.md §2, realtime-dwd module)
  * as pure transforms over a parsed CDC envelope DataFrame
  * (columns: database/table/type/ts/data map/old map — see
  * Schemas.cdcEnvelope, parsed by DimPipeline.parseCdc).
  *
  * Each function is usable identically in batch tests and inside a
  * streaming foreachBatch — per SURVEY §2.4 J1 the multi-table joins
  * run per micro-batch (all tables of one `topic_db` batch arrive
  * together), which sidesteps stream-stream outer-join watermark
  * latency while preserving semantics.
  */
object DwdApps {

  private def tbl(cdc: DataFrame, table: String): DataFrame =
    cdc.filter(col("table") === table)

  /** DwdTradeCartAdd (reference DwdTradeCartAdd.java:29-49):
    * P3 transition predicate + P6 conditional delta — keep inserts and
    * sku_num-increase updates; emit the incremental quantity.
    */
  def cartAdd(cdc: DataFrame): DataFrame =
    tbl(cdc, "cart_info")
      .filter(col("type") === "insert" ||
        (col("type") === "update" && col("old")("sku_num").isNotNull &&
          col("data")("sku_num").cast("long") > col("old")("sku_num").cast("long")))
      .select(
        col("data")("id").as("id"),
        col("data")("user_id").as("user_id"),
        col("data")("sku_id").as("sku_id"),
        when(col("type") === "insert", col("data")("sku_num").cast("long"))
          .otherwise(col("data")("sku_num").cast("long") - col("old")("sku_num").cast("long"))
          .as("sku_num"),
        col("ts"))

  /** DwdTradeOrderDetail (reference :68-151): order_detail ⋈ order_info
    * ⟕ order_detail_activity ⟕ order_detail_coupon — J1, P2, P4.
    */
  def orderDetail(cdc: DataFrame): DataFrame = {
    val od = tbl(cdc, "order_detail").filter(col("type") === "insert")
      .select(col("data")("id").as("id"),
        col("data")("order_id").as("order_id"),
        col("data")("sku_id").as("sku_id"),
        col("data")("sku_num").as("sku_num"),
        col("data")("split_total_amount").as("split_total_amount"),
        col("ts"))
    val oi = tbl(cdc, "order_info").filter(col("type") === "insert")
      .select(col("data")("id").as("order_id"),
        col("data")("user_id").as("user_id"),
        col("data")("province_id").as("province_id"))
    val oda = tbl(cdc, "order_detail_activity").filter(col("type") === "insert")
      .select(col("data")("order_detail_id").as("id"),
        col("data")("activity_id").as("activity_id"))
    val odc = tbl(cdc, "order_detail_coupon").filter(col("type") === "insert")
      .select(col("data")("order_detail_id").as("id"),
        col("data")("coupon_id").as("coupon_id"))
    od.join(oi, Seq("order_id"))
      .join(oda, Seq("id"), "left_outer")
      .join(odc, Seq("id"), "left_outer")
  }

  /** DwdTradeOrderCancelDetail (reference :48-81): order_info updates
    * 1001→1003 (P3) joined to the order-detail facts (J2).
    */
  def orderCancel(cdc: DataFrame, orderDetailDf: DataFrame): DataFrame = {
    val cancels = tbl(cdc, "order_info")
      .filter(col("type") === "update" &&
        col("old")("order_status") === "1001" &&
        col("data")("order_status") === "1003")
      .select(col("data")("id").as("order_id"),
        col("data")("operate_time").as("cancel_time"),
        col("ts").as("cancel_ts"))
    orderDetailDf.join(cancels, Seq("order_id"))
  }

  /** DwdTradeOrderPaySucDetail (reference :123-192): payment_info
    * transitions to 1602 (P3), joined to order detail (J3 interval in
    * streaming; equi per batch) and the payment-type dictionary (J4).
    */
  def paySuccess(cdc: DataFrame, orderDetailDf: DataFrame, baseDic: DataFrame): DataFrame = {
    val pays = tbl(cdc, "payment_info")
      .filter(col("type") === "update" &&
        col("old")("payment_status").isNotNull &&
        col("data")("payment_status") === "1602")
      .select(col("data")("order_id").as("order_id"),
        col("data")("payment_type").as("payment_type"),
        col("data")("callback_time").as("callback_time"),
        col("ts").as("pay_ts"))
    pays.join(orderDetailDf, Seq("order_id"))
      .join(broadcast(baseDic.select(col("dic_code").as("payment_type"),
        col("dic_name").as("payment_type_name"))), Seq("payment_type"), "left_outer")
  }

  /** DwdInteractionCommentInfo (reference :53-93): comment inserts
    * (P2) + appraise-code dictionary lookup (J4).
    */
  def commentInfo(cdc: DataFrame, baseDic: DataFrame): DataFrame =
    tbl(cdc, "comment_info").filter(col("type") === "insert")
      .select(col("data")("id").as("id"),
        col("data")("user_id").as("user_id"),
        col("data")("sku_id").as("sku_id"),
        col("data")("appraise").as("appraise"),
        col("data")("comment_txt").as("comment_txt"),
        col("ts"))
      .join(broadcast(baseDic.select(col("dic_code").as("appraise"),
        col("dic_name").as("appraise_name"))), Seq("appraise"), "left_outer")

  /** DwdBaseDb (reference DwdBaseDb.java:79-145): config-driven routing
    * of everything not handled by a dedicated app — J8 + P5 + K2: join
    * with the routing config, prune `data` to whitelisted columns,
    * stamp `sink_table` for the dynamic-topic sink.
    */
  def baseDb(cdc: DataFrame, config: DataFrame): DataFrame = {
    val cfg = broadcast(config.select(
      col("source_table"), col("sink_table"), col("columns")))
    cdc.join(cfg, cdc("table") === cfg("source_table"))
      .select(col("table"), col("type"), col("ts"), col("sink_table"),
        map_filter(col("data"),
          (k, _) => array_contains(split(col("columns"), ","), k)).as("data"))
  }
}
