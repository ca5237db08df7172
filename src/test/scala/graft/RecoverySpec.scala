package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.model.KeyDay
import graft.streaming.Stateful

/** Checkpoint/restart hardening (SURVEY.md §7.2 step 7): a stateful
  * streaming query stopped and restarted from its checkpoint must
  * restore per-key state — no duplicate emissions, no lost input.
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("state survives restart under the RocksDB state store (100 TB posture)") {
    val root = Files.createTempDirectory("graft_rocks").toString
    val in = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    Files.createDirectories(Paths.get(in))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def startQuery() =
        Stateful.firstSeenPerDay(
          spark.readStream.schema("key STRING, day STRING").json(in).as[KeyDay])
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ck)
          .outputMode("append").start()
      Files.write(Paths.get(s"$in/b1.json"), """{"key":"u1","day":"2024-01-01"}""".getBytes)
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      Files.write(Paths.get(s"$in/b2.json"),
        """{"key":"u1","day":"2024-01-01"}
          |{"key":"u1","day":"2024-01-02"}""".stripMargin.getBytes)
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
      val rows = spark.read.parquet(outDir).select("key", "day")
        .as[(String, String)].collect().toSet
      assert(rows == Set(("u1", "2024-01-01"), ("u1", "2024-01-02")))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("RocksDB + changelog checkpointing soak: 50k keys, multi-day, out-of-order replay stays exact") {
    val root = Files.createTempDirectory("graft_soak").toString
    val in = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    Files.createDirectories(Paths.get(in))
    val n = 50000
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    try {
      def keys = spark.range(n).select(concat(lit("k"), col("id")).as("key"))
      def startQuery() =
        Stateful.firstSeenPerDay(
          spark.readStream.schema("key STRING, day STRING").json(in).as[KeyDay])
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ck)
          .outputMode("append").start()

      // wave 1: every key on day 5
      keys.withColumn("day", lit("2024-01-05")).write.mode("append").json(in)
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

      // wave 2 (restart from checkpoint): exact duplicates of day 5,
      // a new day 6, and an OUT-OF-ORDER day 4 (inside the retain
      // window → must emit exactly once, not be dropped or doubled)
      keys.withColumn("day", lit("2024-01-05")).write.mode("append").json(in)
      keys.withColumn("day", lit("2024-01-06")).write.mode("append").json(in)
      keys.withColumn("day", lit("2024-01-04")).write.mode("append").json(in)
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

      val out = spark.read.parquet(outDir)
      assert(out.count() == 3L * n, "expected one emission per (key, day)")
      assert(out.distinct().count() == 3L * n, "duplicate emissions detected")
      val perDay = out.groupBy("day").count()
        .as[(String, Long)].collect().toMap
      assert(perDay == Map("2024-01-04" -> n.toLong, "2024-01-05" -> n.toLong,
        "2024-01-06" -> n.toLong))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("firstSeenPerDay state survives a query restart from checkpoint") {
    val root = Files.createTempDirectory("graft_recovery").toString
    val in = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    Files.createDirectories(Paths.get(in))

    def startQuery() =
      Stateful.firstSeenPerDay(
        spark.readStream.schema("key STRING, day STRING").json(in).as[KeyDay])
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ck)
        .outputMode("append").start()

    Files.write(Paths.get(s"$in/b1.json"),
      """{"key":"u1","day":"2024-01-01"}
        |{"key":"u2","day":"2024-01-01"}""".stripMargin.getBytes)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // new input after shutdown: u1 same day (dup — must be suppressed by
    // RESTORED state), u1 new day, u3 new key
    Files.write(Paths.get(s"$in/b2.json"),
      """{"key":"u1","day":"2024-01-01"}
        |{"key":"u1","day":"2024-01-02"}
        |{"key":"u3","day":"2024-01-01"}""".stripMargin.getBytes)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(outDir).select("key", "day")
      .as[(String, String)].collect().toSeq
    assert(rows.size == rows.toSet.size, s"duplicate emissions: $rows")
    assert(rows.toSet == Set(
      ("u1", "2024-01-01"), ("u2", "2024-01-01"),
      ("u1", "2024-01-02"), ("u3", "2024-01-01")))
  }
}
