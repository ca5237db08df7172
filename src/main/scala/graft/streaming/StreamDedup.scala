package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — drop replayed/duplicated events by
  * key while keeping state BOUNDED by the watermark.
  *
  * The reference's pipelines assume Kafka at-least-once delivery and
  * tolerate duplicates downstream (its DWS upsert sinks absorb them by
  * PK); the honest streaming-side primitive is dedup-at-ingest:
  *
  *  - [[dedupWithinWatermark]] wraps Spark's
  *    `dropDuplicatesWithinWatermark` (Spark 3.5+): keeps the FIRST
  *    arrival per key, drops any duplicate arriving within the
  *    watermark delay of that first arrival's event time, and evicts
  *    the key's state once the watermark passes it. State is
  *    O(active keys inside the watermark window) — the property that
  *    holds at 100 TB/day, where an unbounded `dropDuplicates` would
  *    grow state with all-time key cardinality and OOM.
  *
  * Duplicates straddling a delivery gap larger than the watermark
  * delay are NOT caught here — that is the io layer's job
  * ([[graft.io.Upsert]] merges by PK; [[graft.llm.Dedup.ingestDeduped]]
  * for content identity), the same division of labor as the
  * reference's Kafka → Doris-aggregate pipeline.
  */
object StreamDedup {

  /** First-arrival-wins dedup on `keys`, state evicted by the
    * watermark on `tsCol`. Works on a streaming OR batch frame (batch
    * falls back to plain dropDuplicates — same keep-semantics, no
    * state to bound).
    */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String], tsCol: String,
                           watermark: String): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)
    else
      df.dropDuplicates(keys.map(identity))
}
