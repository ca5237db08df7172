package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Upsert

/** Streaming legs for the two newest batch serving heads (VERDICT r7
  * #6): the daily event-type PIVOT (`a_pivot_daily`) and the per-type
  * daily PERCENTILES (approx path of `a_percentile_exact`), maintained
  * incrementally the [[Leaderboard]] way — event-time tumbling windows
  * with a watermark produce one FINAL row per closed window (append
  * mode), and foreachBatch folds those finals into a manifest-committed
  * [[Upsert]] table the serving layer reads.
  *
  * Reference shape: the DWS window apps each maintain a per-window
  * aggregate row in Doris (e.g. DwsTrafficVcChArIsNewPageViewWindow
  * writes window sums per key); the ADS layer pivots/ranks those small
  * tables at serve time. Spark shape: the pivot's conditional counts
  * and the percentile sketch are computed INSIDE the windowed streaming
  * aggregation — the fact stream is touched exactly once, and the
  * served tables stay |days| and |days × types| rows no matter the
  * stream volume.
  *
  * Percentiles stream the APPROX path by design: exact per-group
  * percentiles need the group's full value set (the batch head sorts
  * it), which an incremental final cannot carry; `percentile_approx`'s
  * sketch buffer is mergeable streaming state. With `accuracy` at or
  * above the group size the sketch degenerates to the exact value set,
  * so small groups lose nothing — DailyServingSpec pins streaming
  * finals == the batch `percentile_approx` twin over the same waves.
  *
  * Idempotent under replay like Leaderboard: merges are LWW on
  * `__v = batchId` — a replayed batch re-merges identical finals.
  */
object DailyServing {

  private def pivotDir(dir: String) = s"${dir.stripSuffix("/")}/pivot_daily"
  private def pctDir(dir: String) = s"${dir.stripSuffix("/")}/pct_daily"

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** One-pass pivot finals: a single GLOBAL 1-day window whose aggregate
    * list is the conditional counts — one exchange, one final row per
    * day, the same single-exchange shape the batch head uses (built-in
    * `pivot` would plan two agg phases).
    */
  def pivotFinals(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    def ct(v: String) =
      sum(when(col("event_type") === v, 1L).otherwise(0L)).as(v)
    WindowedAggs.globalWindowAgg(events, "event_time", "1 day", watermark,
      eventTypes.map(ct))
      .select(col("cur_date").as("day") +: eventTypes.map(col): _*)
  }

  /** Percentile finals: per (day, event_type) p50/p90/p99 of `value`
    * cents from one `percentile_approx` sketch per group (one buffer
    * serves all three probes), plus the group count.
    */
  def percentileFinals(events: DataFrame, watermark: String = "1 hour",
                       accuracy: Int = 10000): DataFrame =
    WindowedAggs.keyedWindowAgg(events, "event_time", "1 day", watermark,
      Seq("event_type"),
      Seq(percentile_approx(floor(col("value") * 100).cast("long"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy)).as("pcts"),
          count(lit(1)).as("n")))
      .select(col("cur_date").as("day"), col("event_type"),
        element_at(col("pcts"), 1).as("p50_cents"),
        element_at(col("pcts"), 2).as("p90_cents"),
        element_at(col("pcts"), 3).as("p99_cents"), col("n"))

  /** foreachBatch body for the pivot leg: LWW-merge this batch's closed
    * days into the served table (append-mode finals are complete per
    * window, so no partial-window reconciliation is needed).
    */
  def foldPivot(spark: SparkSession, dir: String, finals: DataFrame,
                batchId: Long): Unit =
    foldInto(spark, pivotDir(dir), finals, batchId, Seq("day"))

  /** foreachBatch body for the percentile leg. */
  def foldPercentiles(spark: SparkSession, dir: String, finals: DataFrame,
                      batchId: Long): Unit =
    foldInto(spark, pctDir(dir), finals, batchId, Seq("day", "event_type"))

  /** A foreachBatch DataFrame re-executes its plan per action, so the
    * finals are persisted across the emptiness probe and the merge —
    * one windowed aggregation per micro-batch, not two.
    */
  private def foldInto(spark: SparkSession, dir: String, finals: DataFrame,
                       batchId: Long, pk: Seq[String]): Unit = {
    val f = finals.persist()
    try {
      if (!f.isEmpty)
        Upsert.merge(spark, dir, f.withColumn("__v", lit(batchId)),
          pk = pk, versionCol = "__v")
    } finally { f.unpersist(); () }
  }

  /** The served tables (empty-safe). */
  def currentPivot(spark: SparkSession, dir: String): Option[DataFrame] =
    Upsert.readIfExists(spark, pivotDir(dir))

  def currentPercentiles(spark: SparkSession, dir: String): Option[DataFrame] =
    Upsert.readIfExists(spark, pctDir(dir))
}
