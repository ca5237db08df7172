package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model.{FirstSeen, KeyDay}
import graft.streaming.StatefulV2

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
