package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model.{FirstSeen, KeyDay}
import graft.streaming.StatefulV2
import graft.model.{VersionedAmount, VisitorHit, VisitorHitFixed}

class StatefulV2Spec extends SparkSpec {
  import spark.implicits._

  /** Batch transformWithState asks the driver's StateStoreCoordinator,
    * which only streaming execution registers — bootstrap it with a
    * no-op streaming query once per suite.
    */
  private lazy val coordinatorReady: Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyDay]
    val q = graft.streaming.Stateful.firstSeenPerDay(ms.toDS())
      .writeStream.format("memory").queryName("twsboot").outputMode("append").start()
    ms.addData(KeyDay("boot", "2024-01-01"))
    q.processAllAvailable(); q.stop()
  }

  test("transformWithState firstSeenPerDayTtl: batch semantics match reference ValueState") {
    coordinatorReady
    val out = StatefulV2.firstSeenPerDayTtl(Seq(
      KeyDay("u1", "2024-01-01"), KeyDay("u1", "2024-01-01"),
      KeyDay("u1", "2024-01-02"), KeyDay("u2", "2024-01-03")).toDS())
      .collect().toSet
    assert(out == Set(
      FirstSeen("u1", "2024-01-01"), FirstSeen("u1", "2024-01-02"),
      FirstSeen("u2", "2024-01-03")))
  }

  test("V2 == V1 on identical batch replays for the whole state family (VERDICT r3 #5)") {
    coordinatorReady
    // A6 first-seen
    val days = Seq(KeyDay("u1", "2024-01-01"), KeyDay("u1", "2024-01-01"),
      KeyDay("u1", "2024-01-03"), KeyDay("u2", "2024-02-01"), KeyDay("u2", "2024-01-31"))
    assert(StatefulV2.firstSeenPerDayTtl(days.toDS()).collect().toSet ==
      graft.streaming.Stateful.firstSeenPerDay(days.toDS()).collect().toSet)
    // A8 is_new repair: forged flag, legit new, pre-pipeline visitor
    val hits = Seq(
      VisitorHit("m1", "2024-01-01", "1"), VisitorHit("m1", "2024-01-02", "1"),
      VisitorHit("m1", "2024-01-01", "1"), VisitorHit("m2", "2024-01-02", "0"),
      VisitorHit("m3", "2024-01-05", "0"), VisitorHit("m3", "2024-01-06", "1"))
    assert(StatefulV2.isNewFixTtl(hits.toDS()).collect().toSet ==
      graft.streaming.Stateful.isNewFix(hits.toDS()).collect().toSet)
    // login uu/back-flow: strict-advance guard + gap detection
    def le(u: String, d: String) =
      graft.rtdw.LoginEvent(u, d, java.sql.Timestamp.valueOf(s"$d 10:00:00"))
    val logins = Seq(le("a", "2024-01-01"), le("a", "2024-01-01"), le("a", "2024-01-20"),
      le("b", "2024-01-02"), le("b", "2024-01-01"))
    assert(StatefulV2.loginFlagsTtl(logins.toDS()).collect().toSet ==
      graft.rtdw.DwsApps.loginFlags(logins.toDS()).collect().toSet)
    // A7 upsert deltas: corrections telescope, stale versions ignored
    val amts = Seq(VersionedAmount("d1", 1L, 1000L), VersionedAmount("d1", 5L, 1300L),
      VersionedAmount("d1", 3L, 1100L), VersionedAmount("d2", 2L, 500L))
    assert(StatefulV2.upsertDeltasTtl(amts.toDS()).collect().toSet ==
      graft.streaming.Stateful.upsertDeltas(amts.toDS()).collect().toSet)
  }

  test("V2 state family survives a RocksDB checkpoint restart with V1-identical output") {
    val root = java.nio.file.Files.createTempDirectory("v2_rocks").toString
    val in = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def startQuery() =
        StatefulV2.isNewFixTtl(
          spark.readStream.schema("mid STRING, day STRING, isNew STRING")
            .json(in).as[VisitorHit])
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ck)
          .outputMode("append").start()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b1.json"),
        """{"mid":"m1","day":"2024-01-01","isNew":"1"}
          |{"mid":"m2","day":"2024-01-01","isNew":"0"}""".stripMargin.getBytes)
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      // restart from checkpoint: m1's forged "new" flag on a later day
      // must flip to 0 — provable only if firstDay survived the restart
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b2.json"),
        """{"mid":"m1","day":"2024-01-02","isNew":"1"}
          |{"mid":"m2","day":"2024-01-02","isNew":"0"}""".stripMargin.getBytes)
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(outDir).as[VisitorHitFixed].collect().toSet
      val replayed = Seq(
        VisitorHit("m1", "2024-01-01", "1"), VisitorHit("m2", "2024-01-01", "0"),
        VisitorHit("m1", "2024-01-02", "1"), VisitorHit("m2", "2024-01-02", "0"))
      assert(got == graft.streaming.Stateful.isNewFix(replayed.toDS()).collect().toSet)
      assert(got.contains(VisitorHitFixed("m1", "2024-01-02", "0")),
        "forged flag must flip via state restored from the checkpoint")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("declarative TTL: an idle key's value expires from the store and re-counts on return") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[KeyDay]
      // TimeMode.ProcessingTime keeps micro-batches firing to advance
      // the TTL clock, so processAllAvailable never drains — poll the
      // sink with a deadline instead (the cadence a real deployment
      // runs on anyway).
      val q = StatefulV2.firstSeenPerDayTtl(ms.toDS(), ttl = java.time.Duration.ofSeconds(2))
        .writeStream.format("memory").queryName("fsd2_ttl").outputMode("append").start()
      def rowsNow(): Seq[FirstSeen] = spark.table("fsd2_ttl").as[FirstSeen].collect().toSeq
      def awaitRows(n: Int, deadlineMs: Long = 60000L): Seq[FirstSeen] = {
        val t0 = System.currentTimeMillis()
        var r = rowsNow()
        while (r.size < n && System.currentTimeMillis() - t0 < deadlineMs) {
          Thread.sleep(200); r = rowsNow()
        }
        r
      }
      try {
        ms.addData(KeyDay("u1", "2024-01-01"))
        assert(awaitRows(1).size == 1)
        Thread.sleep(3000) // let u1's value pass its 2 s TTL
        // u1 returns with the SAME day: with its value expired the dup
        // suppression restarts, so it re-emits — the reference's own
        // StateTtlConfig re-count trade, now via declarative TTL
        ms.addData(KeyDay("u1", "2024-01-01"))
        val rows = awaitRows(2)
        assert(rows.count(_ == FirstSeen("u1", "2024-01-01")) == 2,
          s"expired key must re-count: $rows")
        // eviction is visible in the store: only the fresh value remains
        val totalState = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
        assert(totalState <= 1, s"expired value must leave the store, saw $totalState rows")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("event-time eviction V2: idle key evicted and re-counts on return, " +
       "active keys unaffected — same scenario as the V1 evicting operator") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[KeyDay]
      val q = StatefulV2.firstSeenPerDayEvictingV2(ms.toDS(), idleTtlDays = 7)
        .writeStream.format("memory").queryName("fsd2_evict").outputMode("append").start()
      try {
        // the exact StatefulEvictionSpec feed: u1 goes idle past its
        // event-time TTL while u2 stays active, then u1 returns
        ms.addData(KeyDay("u1", "2024-01-01"), KeyDay("u2", "2024-01-01"))
        q.processAllAvailable()
        ms.addData(KeyDay("u2", "2024-01-20"))
        q.processAllAvailable()
        ms.addData(KeyDay("u3", "2024-01-21"))
        q.processAllAvailable()
        ms.addData(KeyDay("u1", "2024-01-22"))
        q.processAllAvailable()
        val rows = spark.table("fsd2_evict").as[FirstSeen].collect().toSeq
        // identical emissions to Stateful.firstSeenPerDayEvicting on this feed:
        // evicted u1 counts anew; u2/u3 exactly their no-eviction sets
        assert(rows.count(_.key == "u1") == 2, s"returning evicted key must count anew: $rows")
        assert(rows.count(_.key == "u2") == 2 && rows.count(_.key == "u3") == 1, s"$rows")
        // eviction is physical: state rows (values + timers) track the
        // 3 live keys, not a 4-key all-time history
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(stateRows <= 6, s"dormant key must leave the store, saw $stateRows rows")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("event-time eviction V2 == V1 evicting twins on batch runs (no watermark ⇒ no timers)") {
    coordinatorReady
    val days = Seq(KeyDay("u1", "2024-01-01"), KeyDay("u1", "2024-01-01"),
      KeyDay("u1", "2024-03-01"), KeyDay("u2", "2024-02-01"))
    assert(StatefulV2.firstSeenPerDayEvictingV2(days.toDS()).collect().toSet ==
      graft.streaming.Stateful.firstSeenPerDayEvicting(days.toDS()).collect().toSet)
    val hits = Seq(
      VisitorHit("m1", "2024-01-01", "1"), VisitorHit("m1", "2024-01-02", "1"),
      VisitorHit("m2", "2024-01-02", "0"), VisitorHit("m3", "2024-01-05", "0"),
      VisitorHit("m3", "2024-01-06", "1"))
    assert(StatefulV2.isNewFixEvictingV2(hits.toDS()).collect().toSet ==
      graft.streaming.Stateful.isNewFixEvicting(hits.toDS()).collect().toSet)
    val amts = Seq(VersionedAmount("d1", 1000L, 1000L), VersionedAmount("d1", 5000L, 1300L),
      VersionedAmount("d1", 3000L, 1100L), VersionedAmount("d2", 2000L, 500L))
    assert(StatefulV2.upsertDeltasEvictingV2(amts.toDS()).collect().toSet ==
      graft.streaming.Stateful.upsertDeltasEvicting(amts.toDS()).collect().toSet)
  }

  test("event-time eviction V2: correction window — inside-TTL corrections telescope, " +
       "post-eviction corrections re-count (reference StateTtlConfig 30 s semantics)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[VersionedAmount]
      val q = StatefulV2.upsertDeltasEvictingV2(ms.toDS(), ttl = "30 seconds")
        .writeStream.format("memory").queryName("ud2_evict").outputMode("append").start()
      try {
        ms.addData(VersionedAmount("d1", 10000L, 1000L))
        q.processAllAvailable()
        // +5 s: inside the window — telescopes to the delta
        ms.addData(VersionedAmount("d1", 15000L, 1300L))
        q.processAllAvailable()
        // +10 min: far past d1's (15 s + 30 s) timer — watermark advance
        // evicts d1, so its next correction re-counts the FULL amount
        ms.addData(VersionedAmount("d2", 615000L, 50L))
        q.processAllAvailable()
        ms.addData(VersionedAmount("d1", 620000L, 1500L))
        q.processAllAvailable()
        val rows = spark.table("ud2_evict").as[graft.model.AmountDelta].collect().toSeq
        val d1 = rows.filter(_.key == "d1").sortBy(_.ts).map(_.delta)
        assert(d1 == Seq(1000L, 300L, 1500L),
          s"expected telescoped then re-counted deltas, got $rows")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("event-time eviction V2: timers survive a RocksDB checkpoint restart " +
       "and still evict the idle key") {
    val root = java.nio.file.Files.createTempDirectory("v2_evict_rocks").toString
    val in = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def startQuery() =
        StatefulV2.firstSeenPerDayEvictingV2(
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
      // restart; u2's activity pushes the watermark past u1's restored timer
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b2.json"),
        """{"key":"u2","day":"2024-01-20"}""".getBytes)
      val q2 = startQuery(); q2.processAllAvailable()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b3.json"),
        """{"key":"u1","day":"2024-01-22"}""".getBytes)
      q2.processAllAvailable(); q2.stop()
      val rows = spark.read.parquet(outDir).as[FirstSeen].collect().toSeq
      // u1's checkpointed timer fired after the restart, so its return re-counts
      assert(rows.count(_.key == "u1") == 2,
        s"timer restored from checkpoint must evict u1, forcing a re-count: $rows")
      assert(rows.count(_.key == "u2") == 2, s"$rows")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState streaming: cross-batch state under RocksDB provider") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[KeyDay]
      val q = StatefulV2.firstSeenPerDayTtl(ms.toDS())
        .writeStream.format("memory").queryName("fsd2").outputMode("append").start()
      try {
        ms.addData(KeyDay("u1", "2024-01-01"))
        q.processAllAvailable()
        ms.addData(KeyDay("u1", "2024-01-01"), KeyDay("u1", "2024-01-02"))
        q.processAllAvailable()
        val rows = spark.table("fsd2").as[FirstSeen].collect().toSeq
        assert(rows.size == 2) // same-day dup across batches suppressed by state
        assert(rows.toSet == Set(FirstSeen("u1", "2024-01-01"), FirstSeen("u1", "2024-01-02")))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
