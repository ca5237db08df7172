package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Sink layer (SURVEY.md §2.2) for the parquet lakehouse substitute.
  *
  * Gold tables are written DATE-PARTITIONED so every downstream read
  * with a date predicate scans only its partitions (partition pruning —
  * proven in SinksSpec) — at 100 TB this is the difference between
  * scanning a day and scanning a year. K4's Doris stream-load becomes
  * an append writeStream; K2's dynamic topic routing becomes
  * partitionBy(sink_table).
  */
object Sinks {

  /** Batch append to a date-partitioned gold table. */
  def writeGold(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** Streaming append to a date-partitioned gold table (K4). */
  def streamGold(df: DataFrame, path: String, checkpoint: String,
                 partitionCols: Seq[String]): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)
      .outputMode("append").start()

  /** K2 — dynamic destination per record: rows carry `sink_table`;
    * partitioned layout gives one directory per logical topic (the
    * Kafka sink's `topic` column equivalent for files).
    */
  def writeRouted(df: DataFrame, path: String): Unit =
    df.write.mode("append").partitionBy("sink_table").parquet(path)

  /** K1 — exactly-once foreachBatch append: Spark REPLAYS a micro-batch
    * after failure (same batchId, same data), so a bare
    * `write.mode("append")` inside foreachBatch duplicates rows on
    * retry. Writing each batch to its own `_batch=<id>` subdirectory
    * via stage-and-rename makes the replay a no-op: if the directory
    * already exists the batch is already committed (rename is the
    * atomic commit point). Readers just read the parent directory.
    * This is the parquet equivalent of the reference's Kafka
    * transactional sink (FlinkSinkUtil.java:22-50, EXACTLY_ONCE +
    * transactional.id per sink) — idempotence from deterministic
    * (batchId → path) addressing instead of transactions. Readers see
    * an extra `commit` partition column (the batch id) — provenance
    * for free; drop it when unwanted.
    */
  def exactlyOnceBatch(df: DataFrame, path: String, batchId: Long): Boolean = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(s"$path/commit=$batchId")
    val fs = target.getFileSystem(conf)
    if (fs.exists(target)) return false // replayed batch: already committed
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.batch-$batchId.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(target.getParent)
    // A failed rename MUST fail the micro-batch: returning normally here
    // would let the streaming checkpoint advance with the data stranded
    // in the .tmp dir — the silent-loss mode this wrapper exists to stop.
    FsOps.renameOrThrow(fs, tmp, target)
    true
  }

  /** Open a streaming sink per config (K1/K2/K4/K7 — the
    * FlinkSinkUtil.java:22-50 contract as config):
    *  - file: parquet append; `topicColumn` partitions one directory
    *    per logical topic (K2's dynamic destination);
    *  - kafka: the real Kafka sink — when `topicColumn` is set it is
    *    renamed to the `topic` column Spark's Kafka sink routes by
    *    (exactly K2), otherwise `topic` is fixed from config. Needs
    *    spark-sql-kafka jars at deploy (absent in this container);
    *  - console: K7 debug sink.
    */
  def stream(df: DataFrame, conf: SinkConf): StreamingQuery = conf.format match {
    case "file" =>
      val w = df.writeStream.format("parquet")
        .option("path", conf.path.getOrElse(
          throw new IllegalArgumentException("file sink requires path")))
        .option("checkpointLocation", conf.checkpoint)
        .options(conf.options)
        .outputMode("append")
      conf.topicColumn.fold(w)(tc => w.partitionBy(tc)).start()
    case "kafka" =>
      val payload = conf.topicColumn match {
        case Some(tc) =>
          df.select(to_json(struct(df.columns.filter(_ != tc).toIndexedSeq.map(col): _*)).as("value"),
            col(tc).as("topic"))
        case None =>
          df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
      }
      val w = payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", conf.brokers.getOrElse(
          throw new IllegalArgumentException("kafka sink requires brokers")))
        .option("checkpointLocation", conf.checkpoint)
        .options(conf.options)
      conf.topic.fold(w)(t => w.option("topic", t)).start()
    case "console" =>
      df.writeStream.format("console")
        .option("checkpointLocation", conf.checkpoint)
        .options(conf.options).start()
    case other =>
      throw new IllegalArgumentException(s"unknown sink format: $other")
  }
}

/** Sink config mirroring [[SourceConf]]: format + transport addressing.
  * `topicColumn` is K2's per-record dynamic destination — a column
  * whose value names the target topic/directory.
  */
case class SinkConf(
    format: String, // "file" | "kafka" | "console"
    checkpoint: String,
    path: Option[String] = None,
    brokers: Option[String] = None,
    topic: Option[String] = None,
    topicColumn: Option[String] = None,
    options: Map[String, String] = Map.empty)
