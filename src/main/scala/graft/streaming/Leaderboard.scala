package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Upsert

/** Streaming top-N per group — the DWS leaderboard the reference
  * serves from Doris over its windowed aggregates (VERDICT r5 #5):
  * the stream maintains the (group, day) aggregate table; the
  * leaderboard is a RANK over that small table, refreshed per batch.
  *
  * Reference shape: DWS window apps write per-window rows to Doris
  * (e.g. DwsTradeSkuOrderWindow), and the serving layer ranks them
  * (ADS "top N" queries). Spark shape: event-time tumbling windows
  * with a watermark (append mode → one FINAL row per window per key),
  * foreachBatch folds those finals into an [[Upsert]] day-aggregate
  * table keyed (event_type, day), then rewrites the top-N snapshot
  * from it — both manifest-committed. The ranking is literally
  * [[graft.ops.Relational.topNPerGroupDf]], the oracled batch
  * operator, so streaming and batch leaderboards cannot drift.
  *
  * Idempotent under replay: the day-aggregate merge is LWW on
  * `__v = batchId` (a replayed batch re-merges identical finals — a
  * no-op) and the leaderboard snapshot is a pure function of the
  * aggregate table. At 100 TB the fact stream never reaches the rank:
  * the only shuffle is the windowed aggregation; the rank runs over
  * |groups × days| rows.
  */
object Leaderboard {

  private def aggDir(dir: String) = s"${dir.stripSuffix("/")}/day_agg"
  private def topDir(dir: String) = s"${dir.stripSuffix("/")}/topn"

  /** The windowed-finals stream: 1-day tumbling windows per event_type
    * over an evented stream (ts, event_type, value) — one final row per
    * (day, event_type) once the watermark passes the day.
    */
  def dailyFinals(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    WindowedAggs.keyedWindowAgg(events, "event_time", "1 day", watermark,
      Seq("event_type"),
      Seq(sum(floor(col("value") * 100).cast("long")).as("day_cents")))
      .select(col("cur_date").as("day"), col("event_type"), col("day_cents"))

  /** foreachBatch body: fold this batch's finalized windows into the
    * day-aggregate table and refresh the top-N snapshot. Append-mode
    * finals are complete per window (every key of a window emits in
    * the batch whose watermark closed it), so the merge is a plain
    * LWW upsert — no partial-window reconciliation needed.
    */
  def fold(spark: SparkSession, dir: String, finals: DataFrame,
           batchId: Long, n: Int = 3): Unit = {
    // persist across the emptiness probe and the merge: a foreachBatch
    // DataFrame re-executes its plan per action
    val f = finals.persist()
    try {
      if (!f.isEmpty)
        Upsert.merge(spark, aggDir(dir),
          f.withColumn("__v", lit(batchId)),
          pk = Seq("event_type", "day"), versionCol = "__v")
    } finally { f.unpersist(); () }
    Upsert.readIfExists(spark, aggDir(dir)).foreach { agg =>
      Upsert.overwriteSnapshot(spark, topDir(dir),
        graft.ops.Relational.topNPerGroupDf(
          agg.select(col("event_type"), col("day"), col("day_cents")), n))
      Upsert.vacuum(spark, topDir(dir), keepManifests = 2)
    }
  }

  /** The served leaderboard (empty-safe). */
  def current(spark: SparkSession, dir: String): Option[DataFrame] =
    Upsert.readIfExists(spark, topDir(dir))
}
