package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.{StreamingJoins, WindowedAggs}

class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("intervalJoin keeps only rows inside [left-before, left+after]") {
    val pay = Seq(("p1", "u1", ts("2024-01-01 10:00:00")))
      .toDF("pay_id", "uid", "pts")
    val clicks = Seq(
      ("c_in", "u1", ts("2024-01-01 09:50:00")),   // inside 15 min before
      ("c_edge", "u1", ts("2024-01-01 09:45:00")), // exactly at bound: inside
      ("c_out", "u1", ts("2024-01-01 09:40:00")),  // too early
      ("c_after", "u1", ts("2024-01-01 10:00:04")),// inside 5 s after
      ("c_late", "u1", ts("2024-01-01 10:00:06")), // too late
      ("c_other", "u2", ts("2024-01-01 09:55:00"))) // wrong key
      .toDF("click_id", "uid", "cts")
    val out = StreamingJoins.intervalJoin(pay, clicks, "uid", "pts", "cts",
      watermark = "10 seconds", before = "15 minutes", after = "5 seconds")
      .select("click_id").as[String].collect().toSet
    assert(out == Set("c_in", "c_edge", "c_after"))
  }

  test("lookupJoin enriches stream rows and keeps unmatched (left outer)") {
    val stream = Seq(("o1", "1001"), ("o2", "9999")).toDF("order_id", "dic_code")
    val dim = Seq(("1001", "pending")).toDF("dic_code", "dic_name")
    val out = StreamingJoins.lookupJoin(stream, dim, Seq("dic_code"))
      .select("order_id", "dic_name").as[(String, Option[String])].collect().toMap
    assert(out == Map("o1" -> Some("pending"), "o2" -> None))
  }

  test("windowed agg emits finals in append mode with watermark (streaming)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val events = ms.toDF().toDF("ts", "event_type", "value")
    val agged = WindowedAggs.keyedWindowAgg(events, "ts", "10 seconds", "5 seconds",
      Seq("event_type"), Seq(count(lit(1)).as("ct"), sum($"value").as("v")))
    val q = agged.writeStream.format("memory").queryName("wagg")
      .outputMode("append").start()
    try {
      ms.addData((ts("2024-01-01 00:00:01"), "click", 1.0),
        (ts("2024-01-01 00:00:03"), "click", 2.0))
      q.processAllAvailable()
      // window [00:00:00,00:00:10) not final yet: watermark hasn't passed
      assert(spark.table("wagg").count() == 0)
      ms.addData((ts("2024-01-01 00:00:30"), "view", 1.0)) // advances watermark
      q.processAllAvailable()
      val rows = spark.table("wagg").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[String]("stt") == "2024-01-01 00:00:00")
      assert(r.getAs[String]("edt") == "2024-01-01 00:00:10")
      assert(r.getAs[Long]("ct") == 2L)
    } finally q.stop()
  }

  test("boundedLeftOuterJoin emits null-padded unmatched rows after watermark (streaming)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val lms = MemoryStream[(String, Timestamp, String)]
    val rms = MemoryStream[(String, Timestamp, String)]
    val left = lms.toDF().toDF("k", "lts", "lv")
    val right = rms.toDF().toDF("k", "rts", "rv")
    val joined = StreamingJoins.boundedLeftOuterJoin(
      left, right, "k", "lts", "rts", watermark = "0 seconds", bound = "5 seconds")
    val q = joined.writeStream.format("memory").queryName("loj")
      .outputMode("append").start()
    try {
      lms.addData(("a", ts("2024-01-01 00:00:01"), "L_match"),
        ("b", ts("2024-01-01 00:00:02"), "L_lonely"))
      rms.addData(("a", ts("2024-01-01 00:00:03"), "R1"))
      q.processAllAvailable()
      // push both watermarks far past the join window
      lms.addData(("z", ts("2024-01-01 01:00:00"), "wm"))
      rms.addData(("z2", ts("2024-01-01 01:00:00"), "wm"))
      q.processAllAvailable()
      lms.addData(("z3", ts("2024-01-01 02:00:00"), "wm"))
      rms.addData(("z4", ts("2024-01-01 02:00:00"), "wm"))
      q.processAllAvailable()
      val rows = spark.table("loj").select("lv", "rv")
        .as[(String, Option[String])].collect().toMap
      assert(rows("L_match") == Some("R1"))
      assert(rows.get("L_lonely").exists(_.isEmpty), s"no null emission: $rows")
    } finally q.stop()
  }

  test("boundedInnerJoin equals reference J2 semantics in batch") {
    val l = Seq(("k1", ts("2024-01-01 00:00:00"), "L1")).toDF("k", "lts", "lv")
    val r = Seq(
      ("k1", ts("2024-01-01 00:00:03"), "R_in"),
      ("k1", ts("2024-01-01 00:00:20"), "R_out")).toDF("k", "rts", "rv")
    val out = StreamingJoins.boundedInnerJoin(l, r, "k", "lts", "rts",
      watermark = "5 seconds", bound = "5 seconds")
      .select("rv").as[String].collect().toSet
    assert(out == Set("R_in"))
  }
}
