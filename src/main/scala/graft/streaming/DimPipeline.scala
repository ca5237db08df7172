package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Upsert
import graft.model.Schemas

/** DimApp — config-driven dimension maintenance (SURVEY.md §3.3).
  *
  * Reference: DimApp.java + DimBroadcastFunction.java:17-93 +
  * DimHBaseSinkFunction.java:50-104: a broadcast config stream (from
  * MySQL CDC) routes `topic_db` CDC rows into HBase dim tables,
  * pruning columns per config, honoring delete ops, creating tables as
  * config arrives (HBaseUtil.createTable:80-103).
  *
  * Spark shape (per SURVEY §3.3): one streaming query over the CDC
  * source; per micro-batch (foreachBatch) re-read the config table
  * (tiny, slowly-changing — the honest replacement for Flink broadcast
  * state), inner-join/route rows per config, prune columns, and MERGE
  * into one parquet dim table per sink. Config is data, not code.
  */
case class DimConfig(sourceTable: String, sinkTable: String,
                     columns: Seq[String], rowKey: String)

object DimPipeline {

  /** Parse a raw CDC JSON batch into the typed envelope + P1 etl filter.
    * Reference filter: DimApp.etl (DimApp.java:179-195).
    */
  def parseCdc(raw: DataFrame, database: String = "gmall"): DataFrame =
    raw.select(from_json(col("value"), Schemas.cdcEnvelope).as("m"))
      .select("m.*")
      .filter(col("database") === database &&
        !col("type").isin("bootstrap-start", "bootstrap-complete") &&
        col("data").isNotNull)

  /** Process one micro-batch of parsed CDC rows against the current
    * config: route per source table, prune to whitelisted columns
    * (P5 — DimApp.filterColumn:75-88), and merge/delete into the sink
    * (K5/K6). Returns the per-sink row counts for observability.
    */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   configs: Seq[DimConfig], warehouseDir: String): Map[String, Long] = {
    val cached = batch.cache()
    try {
      configs.map { cfg =>
        val rows = cached.filter(col("table") === cfg.sourceTable)
        val projected = rows.select(
          (cfg.columns.map(c => col("data")(c).as(c)) :+
            col("type").as("__op") :+ col("ts").as("__ts")): _*)
        val n = projected.count()
        if (n > 0) {
          // bloom=true: CDC dim batches are exactly the point-merge
          // case the per-file sidecars serve — a handful of keys reads
          // candidate files, not whole buckets (io.Blooms)
          Upsert.merge(spark, s"$warehouseDir/${cfg.sinkTable}", projected,
            pk = Seq(cfg.rowKey), versionCol = "__ts", deleteFlagCol = Some("__op"),
            bloom = true)
          // a config-managed dim IS the dim-scale declaration: joins
          // against it broadcast even when a fresh snapshot has no
          // stats (core.DimBroadcastRule)
          graft.core.DimRegistry.register(spark, s"$warehouseDir/${cfg.sinkTable}")
        }
        cfg.sinkTable -> n
      }.toMap
    } finally { cached.unpersist(); () }
  }

  /** Wire the full streaming pipeline: raw CDC stream → foreachBatch
    * routing with per-batch config re-read. `readConfig` is called
    * every batch so config changes apply without restart (the
    * broadcast-state equivalence argued in SURVEY §2.4 J8).
    */
  def run(spark: SparkSession, rawStream: DataFrame,
          readConfig: () => Seq[DimConfig], warehouseDir: String,
          checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    parseCdc(rawStream).writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, readConfig(), warehouseDir); ()
      }
      .start()
}
