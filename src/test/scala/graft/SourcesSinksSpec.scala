package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.io.{SinkConf, Sinks, SourceConf, Sources}

/** The config-only connector swap (VERDICT r1 #6): apps never construct
  * a transport inline — Sources/Sinks pick file/kafka/console from
  * config. The file path runs end-to-end here; the kafka branch is
  * asserted WIRED (the config reaches Spark's kafka DataSource lookup,
  * which is absent in this container by design).
  */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  test("file source → routed file sink honors the topic column end-to-end (K2)") {
    val root = Files.createTempDirectory("srcsink").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(s"$in/part-000.json"),
      Seq("""{"k":"a","topic":"t_click"}""",
        """{"k":"b","topic":"t_order"}""",
        """{"k":"c","topic":"t_click"}""").mkString("\n").getBytes)

    val src = Sources.stream(spark, SourceConf("file", path = Some(in)))
    assert(src.isStreaming && src.columns.toSeq == Seq("value"))
    val parsed = src.select(
      get_json_object(col("value"), "$.k").as("k"),
      get_json_object(col("value"), "$.topic").as("sink_topic"))
    val q = Sinks.stream(parsed, SinkConf("file", checkpoint = s"$root/ck",
      path = Some(s"$root/out"), topicColumn = Some("sink_topic")))
    q.processAllAvailable(); q.stop()

    val dirs = new java.io.File(s"$root/out").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_ == "_spark_metadata").toSet
    assert(dirs == Set("sink_topic=t_click", "sink_topic=t_order"))
    val clicks = spark.read.parquet(s"$root/out")
      .filter(col("sink_topic") === "t_click").select("k").as[String].collect().toSet
    assert(clicks == Set("a", "c"))
  }

  test("batch replay of the same source config returns identical rows") {
    val root = Files.createTempDirectory("replay").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(s"$in/f.txt"), "x\ny\nz".getBytes)
    val conf = SourceConf("file", path = Some(in))
    val batch = Sources.batch(spark, conf).as[String].collect().toSet
    assert(batch == Set("x", "y", "z"))
  }

  test("kafka source branch is wired: config reaches the kafka DataSource lookup") {
    val err = intercept[Exception] {
      Sources.stream(spark, SourceConf("kafka",
        brokers = Some("broker:9092"), topic = Some("topic_log")))
    }
    assert(err.getMessage.toLowerCase.contains("kafka"),
      s"expected kafka DataSource resolution failure, got: ${err.getMessage}")
  }

  test("kafka sink branch is wired: topic column renamed and lookup attempted") {
    val root = Files.createTempDirectory("ksink").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(s"$in/f.txt"), "x".getBytes)
    val src = Sources.stream(spark, SourceConf("file", path = Some(in)))
      .withColumn("sink_table", lit("t1"))
    val err = intercept[Exception] {
      Sinks.stream(src, SinkConf("kafka", checkpoint = s"$root/ck",
        brokers = Some("broker:9092"), topicColumn = Some("sink_table")))
    }
    assert(err.getMessage.toLowerCase.contains("kafka"),
      s"expected kafka DataSource resolution failure, got: ${err.getMessage}")
  }

  test("jdbc batch branch is wired: config reaches the JDBC driver lookup (S6)") {
    val err = intercept[Exception] {
      Sources.batch(spark, SourceConf("jdbc", options = Map(
        "url" -> "jdbc:mysql://db:3306/gmall", "dbtable" -> "table_process")))
        .count()
    }
    val m = err.getMessage.toLowerCase
    assert(m.contains("driver") || m.contains("jdbc"),
      s"expected JDBC driver resolution failure, got: ${err.getMessage}")
  }

  test("unknown formats fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      Sources.stream(spark, SourceConf("carrier-pigeon"))
    }
    intercept[IllegalArgumentException] {
      Sinks.stream(spark.readStream.format("rate").load(),
        SinkConf("carrier-pigeon", checkpoint = "/tmp/x"))
    }
  }
}
