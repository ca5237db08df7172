package graft

import java.sql.Timestamp
import java.nio.file.Files
import graft.streaming.StreamDedup

/** dropDuplicatesWithinWatermark semantics pinned: first arrival per
  * key wins, duplicates inside the watermark window are dropped even
  * ACROSS micro-batches, and the state that makes that possible is
  * evicted once the watermark passes (so a key can legitimately
  * reappear after the window — the bounded-state trade documented on
  * the operator).
  */
case class DupEvt(event_id: String, ts: Timestamp, payload: String)

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cross-micro-batch duplicates inside the watermark are dropped; " +
       "state evicts after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("sdedup").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DupEvt]
    val deduped = StreamDedup.dedupWithinWatermark(
      ms.toDF(), Seq("event_id"), "ts", "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup_out")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    try {
      // batch 1: first arrivals + an in-batch duplicate
      ms.addData(
        DupEvt("a", ts("2024-01-01 10:00:00"), "first"),
        DupEvt("a", ts("2024-01-01 10:00:30"), "dup-in-batch"),
        DupEvt("b", ts("2024-01-01 10:01:00"), "first"))
      q.processAllAvailable()
      // batch 2: replay of "a" within the watermark window → dropped,
      // plus a watermark-advancing event far in the future
      ms.addData(
        DupEvt("a", ts("2024-01-01 10:03:00"), "dup-cross-batch"),
        DupEvt("c", ts("2024-01-01 11:00:00"), "advances-wm"))
      q.processAllAvailable()
      // batch 3: watermark is now ~10:50 — key "a"'s state (event time
      // 10:00) is evicted, so a late re-arrival of "a" is kept as new
      ms.addData(DupEvt("a", ts("2024-01-01 11:05:00"), "after-eviction"))
      q.processAllAvailable()
      val out = spark.table("sdedup_out")
        .select("event_id", "payload").as[(String, String)].collect().toSet
      assert(out == Set(
        ("a", "first"), ("b", "first"), ("c", "advances-wm"),
        ("a", "after-eviction")),
        s"got $out")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sdedup_out")
    }
  }

  test("batch fallback keeps one row per key") {
    val df = Seq(
      DupEvt("a", ts("2024-01-01 10:00:00"), "x"),
      DupEvt("a", ts("2024-01-01 10:00:30"), "y"),
      DupEvt("b", ts("2024-01-01 10:01:00"), "z")).toDF()
    val out = StreamDedup.dedupWithinWatermark(df, Seq("event_id"), "ts", "10 minutes")
    assert(out.count() == 2)
    assert(out.select("event_id").as[String].collect().toSet == Set("a", "b"))
  }
}
