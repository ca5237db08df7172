package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{PageViewRow, TrafficPageView}

class TrafficPageViewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def row(mid: String, t: String, lastPage: String = null,
                  vc: String = "v1", dur: Long = 1000) =
    PageViewRow(mid, vc, "app", "110000", "1", lastPage, dur, ts(t))

  test("annotate: uv only on first view of day, sv on session start") {
    val out = TrafficPageView.annotate(Seq(
      row("m1", "2024-01-01 00:00:01"),                    // uv=1 sv=1
      row("m1", "2024-01-01 00:00:05", lastPage = "home"), // uv=0 sv=0
      row("m1", "2024-01-02 09:00:00"),                    // new day: uv=1 sv=1
      row("m2", "2024-01-01 00:00:02", lastPage = "home")) // uv=1 sv=0
      .toDS()).collect()
    val m1d1 = out.filter(b => b.mid == "m1" && b.ts.toString.startsWith("2024-01-01"))
    assert(m1d1.map(_.uvCt).sum == 1 && m1d1.map(_.svCt).sum == 1 && m1d1.map(_.pvCt).sum == 2)
    assert(out.filter(_.mid == "m2").head.uvCt == 1)
    assert(out.filter(_.mid == "m2").head.svCt == 0)
  }

  test("full app streaming: stateful flags + windowed agg emit correct finals") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[PageViewRow]
    val q = TrafficPageView(ms.toDS())
      .writeStream.format("memory").queryName("tpv").outputMode("append").start()
    try {
      ms.addData(
        row("m1", "2024-01-01 00:00:01"),
        row("m1", "2024-01-01 00:00:03", lastPage = "home"),
        row("m2", "2024-01-01 00:00:04"))
      q.processAllAvailable()
      ms.addData(row("m3", "2024-01-01 00:01:00")) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("tpv").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[String]("stt") == "2024-01-01 00:00:00")
      assert(r.getAs[Long]("uv_ct") == 2L)  // m1 first + m2 first
      assert(r.getAs[Long]("sv_ct") == 2L)  // two null last_page sessions
      assert(r.getAs[Long]("pv_ct") == 3L)
      assert(r.getAs[Long]("dur_sum") == 3000L)
    } finally q.stop()
  }
}
