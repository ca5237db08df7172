package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.{Sinks, Tables}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned gold table prunes partitions on date filters") {
    val root = Files.createTempDirectory("gold").toString
    val daily = Tables.events(spark, sf)
      .withColumn("cur_date", date_format(col("ts"), "yyyy-MM-dd"))
    Sinks.writeGold(daily, s"$root/gold_events", Seq("cur_date"))
    val read = spark.read.parquet(s"$root/gold_events")
      .filter(col("cur_date") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cur_date"),
      s"no partition filter pushed:\n$plan")
    val expected = daily.filter(col("cur_date") === "2024-01-05").count()
    assert(read.count() == expected && expected > 0)
  }

  test("routed write creates one directory per sink_table (K2)") {
    val root = Files.createTempDirectory("routed").toString
    val routed = graft.ops.Relational.j8ConfigRouting(spark, sf)
    Sinks.writeRouted(routed, s"$root/dwd")
    val dirs = new java.io.File(s"$root/dwd").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("sink_table=dwd_trade_purchase",
      "sink_table=dwd_traffic_click", "sink_table=dwd_user_signup"))
    // reading one route back returns only its rows
    val clicks = spark.read.parquet(s"$root/dwd")
      .filter(col("sink_table") === "dwd_traffic_click").count()
    assert(clicks == routed.filter(col("sink_table") === "dwd_traffic_click").count())
  }

  test("exactlyOnceBatch: a replayed micro-batch commits nothing twice (K1)") {
    val root = Files.createTempDirectory("eos").toString + "/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Sinks.exactlyOnceBatch(b0, root, batchId = 0L))
    // failure replay: same batch id arrives again (possibly recomputed)
    assert(!Sinks.exactlyOnceBatch(b0, root, batchId = 0L))
    assert(Sinks.exactlyOnceBatch(Seq((3L, "c")).toDF("id", "v"), root, batchId = 1L))
    val rows = spark.read.parquet(root).select("id", "v", "commit")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L)),
      s"replay duplicated or lost rows: $rows")
  }

  test("approx distinct stays within rsd of exact (sketch path for A5)") {
    val approx = graft.ops.Relational.a5ApproxDistinct(spark, sf)
      .select("event_type", "approx_user_ct").as[(String, Long)].collect().toMap
    val exact = graft.ops.Relational.a5DistinctAgg(spark, sf)
      .select("event_type", "user_ct").as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.1, s"$k: approx $ap vs exact $ex")
    }
  }
}
