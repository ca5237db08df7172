package graft

import graft.streaming.LogSplit

class LogSplitSpec extends SparkSpec {
  import spark.implicits._

  // Golden fixture: page log w/ displays+actions, start log, err log,
  // corrupt line, and a structurally-invalid record (no page/start).
  private val lines = Seq(
    """{"common":{"mid":"m1","uid":"u1","vc":"v1","ch":"app","ar":"110000","is_new":"1"},
       "page":{"page_id":"good_detail","last_page_id":"home","item":"sku1","item_type":"sku_id","during_time":4000},
       "displays":[{"item":"sku2","item_type":"sku_id","pos_id":1},{"item":"sku3","item_type":"sku_id","pos_id":2}],
       "actions":[{"action_id":"cart_add","item":"sku1","ts":1704067201000},{"action_id":"favor_add","item":"sku1","ts":1704067202000}],
       "ts":1704067200000}""".replaceAll("\n\\s*", ""),
    """{"common":{"mid":"m2","uid":"u2","vc":"v1","ch":"web","ar":"120000","is_new":"0"},
       "start":{"entry":"icon","loading_time":300},"ts":1704067210000}""".replaceAll("\n\\s*", ""),
    """{"common":{"mid":"m3","uid":null,"vc":"v2","ch":"app","ar":"130000","is_new":"0"},
       "page":{"page_id":"home","last_page_id":null,"item":null,"item_type":null,"during_time":1000},
       "err":{"error_code":101,"msg":"boom"},"ts":1704067220000}""".replaceAll("\n\\s*", ""),
    """not json at all""",
    """{"common":{"mid":"m4","uid":"u4","vc":"v1","ch":"app","ar":"140000","is_new":"0"},"ts":1704067230000}""")

  private lazy val parsed = LogSplit.parse(lines.toDF("value")).cache()

  test("etl drops corrupt and structurally-invalid records") {
    assert(parsed.count() == 3) // m4 (no page/start) and garbage dropped
  }

  test("5-way split routes each record family") {
    val splits = LogSplit.splitAll(parsed)
    assert(splits("dwd_traffic_page").count() == 2)   // m1, m3
    assert(splits("dwd_traffic_start").count() == 1)  // m2
    assert(splits("dwd_traffic_err").count() == 1)    // m3
    assert(splits("dwd_traffic_display").count() == 2) // m1's two displays
    assert(splits("dwd_traffic_action").count() == 2)  // m1's two actions, per-element
  }

  test("display explosion carries page context") {
    val d = LogSplit.displayDf(parsed).collect()
    assert(d.forall(_.getAs[String]("page_id") == "good_detail"))
    assert(d.map(_.getAs[Long]("pos_id")).toSet == Set(1L, 2L))
  }

  test("action explosion emits one row per action element (reference bug fixed)") {
    val a = LogSplit.actionDf(parsed).collect()
    assert(a.map(_.getAs[String]("action_id")).toSet == Set("cart_add", "favor_add"))
    assert(a.map(_.getAs[Long]("ts")).toSet == Set(1704067201000L, 1704067202000L))
  }
}
