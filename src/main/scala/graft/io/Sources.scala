package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connector selection as CONFIG, not code (SURVEY §2.1 S1-S4).
  *
  * Reference: FlinkSourceUtil.getKafkaSource (FlinkSourceUtil.java:18-44)
  * builds every app's source from (topic, groupId); no app constructs a
  * connector inline. graft mirrors that contract: apps call
  * `Sources.stream(spark, conf)` and receive the reference's
  * Kafka-String shape — a streaming DataFrame with a single string
  * `value` column — regardless of the physical transport.
  *
  * The `kafka` branch is the real Structured-Streaming Kafka source
  * configuration; this container ships no kafka-sql jars, so it can
  * compile and be selected but not run here (SinksSpec pins the file
  * branch end-to-end and asserts the kafka branch is wired). Deploying
  * against a cluster with spark-sql-kafka on the classpath makes the
  * swap literally a one-line config change, which is the claim this
  * object exists to make true.
  */
case class SourceConf(
    format: String, // "file" | "kafka" | "rate"
    path: Option[String] = None, // file: input directory
    brokers: Option[String] = None, // kafka: bootstrap servers
    topic: Option[String] = None, // kafka: subscription
    options: Map[String, String] = Map.empty)

object Sources {

  /** Open a streaming source per config; output schema is always
    * a single string column `value` (the topic payload).
    */
  def stream(spark: SparkSession, conf: SourceConf): DataFrame = conf.format match {
    case "file" =>
      spark.readStream.text(conf.path.getOrElse(
        throw new IllegalArgumentException("file source requires path")))
        .toDF("value")
    case "kafka" =>
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", conf.brokers.getOrElse(
          throw new IllegalArgumentException("kafka source requires brokers")))
        .option("subscribe", conf.topic.getOrElse(
          throw new IllegalArgumentException("kafka source requires topic")))
        .options(conf.options)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    case "rate" => // synthetic load generator for soak tests
      spark.readStream.format("rate").options(conf.options).load()
        .selectExpr("CAST(value AS STRING) AS value")
    case other =>
      throw new IllegalArgumentException(s"unknown source format: $other")
  }

  /** Batch variant for replay/backfill over the same config (the
    * stream/batch unification the reference lacks: identical app code
    * reprocesses history by swapping readStream for read). The `jdbc`
    * branch is S6 (the reference's test-only JDBC source,
    * FlinkSQLTestRead.java): Spark's built-in JDBC relation with
    * url/dbtable from `options` — compiles and resolves here, connects
    * once a driver jar is deployed (none in this container).
    */
  def batch(spark: SparkSession, conf: SourceConf): DataFrame = conf.format match {
    case "file" => spark.read.text(conf.path.get).toDF("value")
    case "jdbc" =>
      require(conf.options.contains("url") && conf.options.contains("dbtable"),
        "jdbc source requires url and dbtable options")
      spark.read.format("jdbc").options(conf.options).load()
    case other =>
      throw new IllegalArgumentException(s"batch replay supports file/jdbc, got: $other")
  }
}
