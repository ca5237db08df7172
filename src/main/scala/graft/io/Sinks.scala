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
}
