package graft

import org.apache.spark.sql.DataFrame
import graft.rtdw.DwdApps
import graft.streaming.DimPipeline

class DwdAppsSpec extends SparkSpec {
  import spark.implicits._

  private def cdc(rows: (String, String, Long, Map[String, String], Map[String, String])*): DataFrame = {
    val lines = rows.map { case (table, op, ts, data, old) =>
      def m(x: Map[String, String]) =
        x.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
      val oldPart = if (old.nonEmpty) s""","old":${m(old)}""" else ""
      s"""{"database":"gmall","table":"$table","type":"$op","ts":$ts,"data":${m(data)}$oldPart}"""
    }
    DimPipeline.parseCdc(lines.toDF("value"))
  }

  private val baseDic = Seq(
    ("1101", "bank card"), ("1201", "good"), ("1202", "mid"), ("1203", "bad"))
    .toDF("dic_code", "dic_name")

  test("cartAdd: inserts pass whole, sku_num increases emit delta, decreases dropped") {
    val out = DwdApps.cartAdd(cdc(
      ("cart_info", "insert", 1L, Map("id" -> "c1", "user_id" -> "u1", "sku_id" -> "s1", "sku_num" -> "2"), Map()),
      ("cart_info", "update", 2L, Map("id" -> "c1", "sku_num" -> "5", "user_id" -> "u1", "sku_id" -> "s1"), Map("sku_num" -> "2")),
      ("cart_info", "update", 3L, Map("id" -> "c1", "sku_num" -> "1", "user_id" -> "u1", "sku_id" -> "s1"), Map("sku_num" -> "5")),
      ("order_info", "insert", 4L, Map("id" -> "o1"), Map())))
    val rows = out.select("id", "sku_num").as[(String, Long)].collect().sorted
    assert(rows.toSeq == Seq(("c1", 2L), ("c1", 3L))) // insert 2 + delta 3; decrease dropped
  }

  test("orderDetail: inner join to order_info, left join activity/coupon") {
    val out = DwdApps.orderDetail(cdc(
      ("order_detail", "insert", 1L, Map("id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1", "sku_num" -> "1", "split_total_amount" -> "10.00"), Map()),
      ("order_detail", "insert", 1L, Map("id" -> "d2", "order_id" -> "o1", "sku_id" -> "s2", "sku_num" -> "2", "split_total_amount" -> "20.00"), Map()),
      ("order_detail", "insert", 1L, Map("id" -> "d3", "order_id" -> "oX", "sku_id" -> "s3", "sku_num" -> "1", "split_total_amount" -> "5.00"), Map()),
      ("order_info", "insert", 1L, Map("id" -> "o1", "user_id" -> "u1", "province_id" -> "p1"), Map()),
      ("order_detail_activity", "insert", 1L, Map("order_detail_id" -> "d1", "activity_id" -> "a1"), Map())))
    val rows = out.select("id", "user_id", "activity_id", "coupon_id")
      .as[(String, String, Option[String], Option[String])].collect().toSet
    assert(rows == Set(
      ("d1", "u1", Some("a1"), None),
      ("d2", "u1", None, None))) // d3 dropped: no order_info
  }

  test("orderCancel: only 1001->1003 transitions join the facts") {
    val od = DwdApps.orderDetail(cdc(
      ("order_detail", "insert", 1L, Map("id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1", "sku_num" -> "1", "split_total_amount" -> "10.00"), Map()),
      ("order_info", "insert", 1L, Map("id" -> "o1", "user_id" -> "u1", "province_id" -> "p1"), Map())))
    val out = DwdApps.orderCancel(cdc(
      ("order_info", "update", 2L, Map("id" -> "o1", "order_status" -> "1003", "operate_time" -> "2024-01-01 10:00:00"), Map("order_status" -> "1001")),
      ("order_info", "update", 2L, Map("id" -> "o1", "order_status" -> "1004"), Map("order_status" -> "1002"))), od)
    assert(out.count() == 1)
    assert(out.select("cancel_time").as[String].head() == "2024-01-01 10:00:00")
  }

  test("paySuccess: 1602 transitions enriched with dictionary name") {
    val od = DwdApps.orderDetail(cdc(
      ("order_detail", "insert", 1L, Map("id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1", "sku_num" -> "1", "split_total_amount" -> "10.00"), Map()),
      ("order_info", "insert", 1L, Map("id" -> "o1", "user_id" -> "u1", "province_id" -> "p1"), Map())))
    val out = DwdApps.paySuccess(cdc(
      ("payment_info", "update", 3L, Map("order_id" -> "o1", "payment_type" -> "1101", "payment_status" -> "1602", "callback_time" -> "2024-01-01 10:05:00"), Map("payment_status" -> "1601")),
      ("payment_info", "update", 3L, Map("order_id" -> "o1", "payment_type" -> "1101", "payment_status" -> "1601"), Map())), od, baseDic)
    val rows = out.select("id", "payment_type_name").as[(String, Option[String])].collect()
    assert(rows.toSeq == Seq(("d1", Some("bank card"))))
  }

  test("commentInfo: inserts with appraise lookup, unmatched code kept (left)") {
    val out = DwdApps.commentInfo(cdc(
      ("comment_info", "insert", 1L, Map("id" -> "cm1", "user_id" -> "u1", "sku_id" -> "s1", "appraise" -> "1201", "comment_txt" -> "nice"), Map()),
      ("comment_info", "insert", 1L, Map("id" -> "cm2", "user_id" -> "u2", "sku_id" -> "s2", "appraise" -> "9999", "comment_txt" -> "??"), Map()),
      ("comment_info", "update", 2L, Map("id" -> "cm1", "appraise" -> "1203"), Map("appraise" -> "1201"))), baseDic)
    val rows = out.select("id", "appraise_name").as[(String, Option[String])].collect().toMap
    assert(rows == Map("cm1" -> Some("good"), "cm2" -> None))
  }

  test("baseDb: config routing + map column pruning + sink_table stamp") {
    val config = Seq(("favor_info", "dwd_interaction_favor_add", "id,user_id,sku_id"))
      .toDF("source_table", "sink_table", "columns")
    val out = DwdApps.baseDb(cdc(
      ("favor_info", "insert", 1L, Map("id" -> "f1", "user_id" -> "u1", "sku_id" -> "s1", "secret" -> "x"), Map()),
      ("unrouted", "insert", 1L, Map("id" -> "z"), Map())), config)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("sink_table") == "dwd_interaction_favor_add")
    val data = rows.head.getAs[Map[String, String]]("data")
    assert(data == Map("id" -> "f1", "user_id" -> "u1", "sku_id" -> "s1")) // secret pruned
  }
}
