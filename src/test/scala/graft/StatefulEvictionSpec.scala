package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model._
import graft.streaming.Stateful

/** VERDICT r2 #1 — dormant-key eviction for the A6 state family.
  *
  * With eviction ON: (a) active keys behave exactly as without it;
  * (b) a key idle past the event-time TTL is PHYSICALLY removed from
  * the state store (numRowsTotal tracks active keys, not all-time
  * keys); (c) a returning evicted key re-counts — one extra emission,
  * the reference's own 1-day StateTtlConfig semantics
  * (DwsTrafficVcChArIsNewPageViewWindow.java:133-136).
  */
class StatefulEvictionSpec extends SparkSpec {
  import spark.implicits._

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.lastProgress.stateOperators.map(_.numRowsTotal).sum

  test("idle key is evicted from the store and re-counts on return; active keys unaffected") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyDay]
    val q = Stateful.firstSeenPerDayEvicting(ms.toDS(), idleTtlDays = 7)
      .writeStream.format("memory").queryName("fsd_evict").outputMode("append").start()
    try {
      // batch 1: two keys on day 1 → both emit, 2 state rows
      ms.addData(KeyDay("u1", "2024-01-01"), KeyDay("u2", "2024-01-01"))
      q.processAllAvailable()

      // batch 2: only u2 stays active, 20 days later — the watermark
      // jumps past u1's (day1 + 7d) timeout
      ms.addData(KeyDay("u2", "2024-01-20"))
      q.processAllAvailable()

      // batch 3: new key u3; by now u1 must have timed out and been
      // REMOVED — state holds only the keys active inside the TTL
      ms.addData(KeyDay("u3", "2024-01-21"))
      q.processAllAvailable()
      assert(stateRows(q) == 2, s"expected {u2,u3} in state, got ${stateRows(q)} rows")

      // batch 4: u1 RETURNS on a current day → counted again from
      // empty state and re-enters the store. (A return carrying an
      // already-counted OLD day is dropped as late by the watermark —
      // so unlike the reference's TTL, eviction here can never produce
      // a visible double-count; the trade is purely state size.)
      ms.addData(KeyDay("u1", "2024-01-22"))
      q.processAllAvailable()

      val rows = spark.table("fsd_evict").as[FirstSeen].collect().toSeq
      assert(rows.count(_.key == "u1") == 2, s"returning evicted key must count anew: $rows")
      // active keys' emissions are exactly the no-eviction set
      assert(rows.count(r => r.key == "u2") == 2 && rows.count(r => r.key == "u3") == 1)
      assert(stateRows(q) == 3, "returned key re-enters the store")
    } finally q.stop()
  }

  test("no key idle past the TTL ⇒ emissions identical to the non-evicting operator") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyDay]
    val q = Stateful.firstSeenPerDayEvicting(ms.toDS(), idleTtlDays = 7)
      .writeStream.format("memory").queryName("fsd_evict_quiet").outputMode("append").start()
    try {
      ms.addData(KeyDay("u1", "2024-01-01"), KeyDay("u2", "2024-01-01"))
      q.processAllAvailable()
      ms.addData(KeyDay("u1", "2024-01-01"), // dup: still suppressed
        KeyDay("u1", "2024-01-03"), KeyDay("u2", "2024-01-05"))
      q.processAllAvailable()
      val rows = spark.table("fsd_evict_quiet").as[FirstSeen].collect().toSet
      assert(rows == Set(FirstSeen("u1", "2024-01-01"), FirstSeen("u2", "2024-01-01"),
        FirstSeen("u1", "2024-01-03"), FirstSeen("u2", "2024-01-05")))
      assert(stateRows(q) == 2)
    } finally q.stop()
  }

  test("eviction works identically on the RocksDB store across a restart (100 TB posture)") {
    val root = java.nio.file.Files.createTempDirectory("evict_rocks").toString
    val in = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def startQuery() =
        Stateful.firstSeenPerDayEvicting(
          spark.readStream.schema("key STRING, day STRING").json(in).as[KeyDay],
          idleTtlDays = 7)
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ck)
          .outputMode("append").start()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b1.json"),
        """{"key":"u1","day":"2024-01-01"}
          |{"key":"u2","day":"2024-01-01"}""".stripMargin.getBytes)
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      // restart from checkpoint; u2 stays active far past u1's TTL
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b2.json"),
        """{"key":"u2","day":"2024-01-20"}""".getBytes)
      val q2 = startQuery(); q2.processAllAvailable()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b3.json"),
        """{"key":"u3","day":"2024-01-21"}""".getBytes)
      q2.processAllAvailable()
      assert(q2.lastProgress.stateOperators.map(_.numRowsTotal).sum == 2,
        "u1 must be evicted from the RocksDB store after restart")
      q2.stop()
      val rows = spark.read.parquet(outDir).select("key", "day")
        .as[(String, String)].collect().toSet
      assert(rows == Set(("u1", "2024-01-01"), ("u2", "2024-01-01"),
        ("u2", "2024-01-20"), ("u3", "2024-01-21")))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("batch runs of the evicting variants equal their non-evicting twins") {
    val days = Seq(
      KeyDay("u1", "2024-01-01"), KeyDay("u1", "2024-01-01"),
      KeyDay("u1", "2024-03-01"), KeyDay("u2", "2024-02-01"))
    assert(Stateful.firstSeenPerDayEvicting(days.toDS()).collect().toSet ==
      Stateful.firstSeenPerDay(days.toDS()).collect().toSet)

    val hits = Seq(VisitorHit("m1", "2024-01-01", "1"), VisitorHit("m1", "2024-01-02", "1"),
      VisitorHit("m2", "2024-01-02", "0"))
    assert(Stateful.isNewFixEvicting(hits.toDS()).collect().toSet ==
      Stateful.isNewFix(hits.toDS()).collect().toSet)

    val logins = Seq(
      graft.rtdw.LoginEvent("a", "2024-01-01", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      graft.rtdw.LoginEvent("a", "2024-01-20", java.sql.Timestamp.valueOf("2024-01-20 10:00:00")),
      graft.rtdw.LoginEvent("b", "2024-01-02", java.sql.Timestamp.valueOf("2024-01-02 10:00:00")))
    assert(graft.rtdw.DwsApps.loginFlagsEvicting(logins.toDS()).collect().toSet ==
      graft.rtdw.DwsApps.loginFlags(logins.toDS()).collect().toSet)

    val pages = Seq(
      graft.streaming.PageViewRow("m1", "v1", "ch", "ar", "1", null, 10L,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      graft.streaming.PageViewRow("m1", "v1", "ch", "ar", "1", "home", 20L,
        java.sql.Timestamp.valueOf("2024-01-02 10:00:00")))
    assert(graft.streaming.TrafficPageView.annotateEvicting(pages.toDS()).collect().toSet ==
      graft.streaming.TrafficPageView.annotate(pages.toDS()).collect().toSet)
  }

  test("upsertDeltasEvicting: within-TTL corrections telescope; state tracks the correction window") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[VersionedAmount]
    val q = Stateful.upsertDeltasEvicting(ms.toDS(), ttl = "30 seconds")
      .writeStream.format("memory").queryName("ud_evict").outputMode("append").start()
    try {
      val t0 = 1704067200000L
      ms.addData(VersionedAmount("d1", t0, 1000L), VersionedAmount("d2", t0, 500L))
      q.processAllAvailable()
      // correction INSIDE the 30s window telescopes: +300, not +1300
      ms.addData(VersionedAmount("d1", t0 + 10000, 1300L))
      q.processAllAvailable()
      // far-future key pushes the watermark past both ids' TTLs
      ms.addData(VersionedAmount("d9", t0 + 600000, 42L))
      q.processAllAvailable()
      ms.addData(VersionedAmount("d8", t0 + 610000, 1L)) // triggers the eviction batch
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum == 2,
        "d1/d2 must be evicted after the correction window passes")
      val sums = spark.table("ud_evict").groupBy("key")
        .agg(org.apache.spark.sql.functions.sum("delta").as("s"))
        .as[(String, Long)].collect().toMap
      assert(sums("d1") == 1300L && sums("d2") == 500L, s"telescoping broke: $sums")
      // batch parity with the non-evicting operator
      val batchIn = Seq(VersionedAmount("a", 1L, 10L), VersionedAmount("a", 2L, 15L),
        VersionedAmount("b", 1L, 7L))
      assert(Stateful.upsertDeltasEvicting(batchIn.toDS()).collect().toSet ==
        Stateful.upsertDeltas(batchIn.toDS()).collect().toSet)
    } finally q.stop()
  }

  test("evicting isNewFix drops a dormant mid and re-fixes a returning one from scratch") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[VisitorHit]
    val q = Stateful.isNewFixEvicting(ms.toDS(), idleTtlDays = 7)
      .writeStream.format("memory").queryName("inf_evict").outputMode("append").start()
    try {
      ms.addData(VisitorHit("m1", "2024-01-01", "1"), VisitorHit("m2", "2024-01-01", "1"))
      q.processAllAvailable()
      ms.addData(VisitorHit("m2", "2024-01-20", "1")) // watermark jumps past m1's TTL
      q.processAllAvailable()
      ms.addData(VisitorHit("m3", "2024-01-21", "0"))
      q.processAllAvailable()
      assert(stateRows(q) == 2, "dormant m1 must be evicted")
      // m1 returns claiming new: with state evicted the forged-flag
      // check restarts — it is accepted as new once more (bounded
      // re-count, the reference's trade)
      ms.addData(VisitorHit("m1", "2024-01-22", "1"))
      q.processAllAvailable()
      val m1 = spark.table("inf_evict").as[VisitorHitFixed].collect()
        .filter(_.mid == "m1").toSeq
      assert(m1.count(_.isNew == "1") == 2)
    } finally q.stop()
  }
}
