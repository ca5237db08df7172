package graft.rtdw

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.{Tables, Upsert}

/** Type-2 slowly-changing dimensions — the history-keeping extension of
  * the reference's dim layer.
  *
  * Reference: the dim pipeline keeps only the LATEST image per key —
  * DimHBaseSinkFunction.java:84,100 (HBase put overwrites, delete
  * removes). That loses history: a fact that arrives (or is reprocessed)
  * after a dim change joins against the NEW dim row and silently gets
  * attributes that were not true at event time. SCD2 is the standard
  * warehouse fix: every change opens a new version row
  * `[effective_from, effective_to)` and facts join the version valid at
  * their own timestamp.
  *
  * Three surfaces, all over one derivation:
  *  - [[fromHistory]]: batch — raw change log → compressed version rows
  *    (consecutive identical attribute images collapse into one run,
  *    the standard SCD2 no-op-update rule). One shuffle on the key; the
  *    run-compression lag and the interval lead share that single
  *    exchange+sort (PlanSpec-pinned).
  *  - [[temporalJoin]]: facts ⟕ the version valid at fact time. Version
  *    tables are dim-sized (|changes|, not |facts|) → broadcast hash
  *    join on the key with the interval predicate as the residual —
  *    never a BNLJ, never a per-key cross product. For a version table
  *    too big to broadcast, the same semantics are an as-of join on
  *    `effective_from` ([[graft.plans.AsOfJoin]] is the partitioned-
  *    merge path; Scd2Spec pins the two formulations equal).
  *  - [[ingest]]: incremental maintenance on the [[Upsert]] layer — the
  *    production shape. The raw change log is the system of record
  *    (merged LWW, replay no-op); per batch only the TOUCHED keys'
  *    histories are re-derived and their version rows upserted, with
  *    rows that compressed away tombstoned. Re-deriving from the raw
  *    log (not from the previous version rows) is what makes LATE
  *    changes correct: inserting a change inside an existing run can
  *    resurrect a previously-compressed row, which no
  *    versions-table-only rewrite can reconstruct.
  *
  * 100 TB shape: the change log and version table are dimension-sized.
  * The only per-batch work is one LWW merge plus a key-local
  * re-derivation bounded by |touched keys' history|; facts never enter
  * any SCD2 job. The temporal join adds zero shuffles to the fact side.
  */
object Scd2 {

  /** Derive SCD2 version rows from a raw change history.
    *
    * @param changes  one row per observed change: key, ts, tieBreak,
    *                 attribute columns (anything else is dropped)
    * @param attrs    tracked attribute columns; a row opens a new
    *                 version iff any tracked attribute differs
    *                 (null-safely) from the previous row's
    * @return key, attrs, effective_from, effective_to (null = open),
    *         is_current — intervals are half-open `[from, to)`
    */
  def fromHistory(changes: DataFrame, key: String, ts: String,
                  tieBreak: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    // a key's FIRST change always opens a version — lag's null default
    // is indistinguishable from a genuinely-null previous attribute, so
    // the first row needs its own test (row_number shares the same
    // partition/order spec → same Window node, no extra shuffle or sort)
    val differs = attrs.map(a => !(lag(col(a), 1).over(w) <=> col(a)))
      .reduce(_ || _) || row_number().over(w) === 1
    // the filter preserves the (key) partitioning and (ts, tieBreak)
    // ordering, so the lead window reuses the lag window's exchange
    // AND sort — one shuffle for the whole derivation
    changes
      .select(col(key) +: col(ts) +: col(tieBreak) +: attrs.map(col): _*)
      .withColumn("__new_run", differs)
      .filter(col("__new_run"))
      .withColumn("effective_from", col(ts))
      .withColumn("effective_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__new_run", ts, tieBreak)
  }

  /** Estimated broadcast bytes per version row when only a row COUNT is
    * known: schema defaultSize (20 B per string, 8 B numerics, element-
    * estimated containers) + row overhead, floored at 64 B. The old
    * fixed 64 B floor under-counted wide tables (many attrs / long
    * strings), letting a >budget table slip onto the broadcast path.
    */
  private[graft] def estRowBytes(schema: org.apache.spark.sql.types.StructType): Long =
    math.max(64L, schema.map(_.dataType.defaultSize.toLong).sum + 16L)

  /** Enrich facts with the dim version valid at fact time: left join on
    * the key with `effective_from <= factTs < effective_to` (open
    * current version matches everything from its start).
    *
    * Two physical paths with identical semantics (Scd2Spec pins them
    * equal), chosen by `mode`:
    *  - `"broadcast"`: BHJ on the key whose residual interval predicate
    *    admits EXACTLY ONE version per fact (intervals partition the
    *    key's timeline), so the left join never duplicates facts. Right
    *    for dim-sized version tables.
    *  - `"asof"`: the partitioned-merge [[graft.plans.AsOfJoin]] on
    *    `effective_from` — each side shuffles once on the key, O(1)
    *    memory per partition. Right when the version table is too big
    *    to broadcast (billions of versions). An attached version that
    *    has EXPIRED at fact time (gapped custom tables; never produced
    *    by [[fromHistory]]) is nulled out, so the two paths agree on
    *    arbitrary inputs, not just tiled ones.
    *  - `"auto"` (default): METADATA-ONLY gate, the cosineNearDup
    *    pattern — optimizer statistics (catalog row count when present,
    *    else file-listing sizeInBytes), never a count() job: broadcast
    *    below `maxBroadcastBytes` (64 MB, the session's auto-broadcast
    *    ceiling), as-of above it.
    */
  def temporalJoin(facts: DataFrame, versions: DataFrame,
                   key: String, factTs: String,
                   mode: String = "auto",
                   maxBroadcastBytes: Long = 64L * 1024 * 1024): DataFrame = {
    // A version payload column sharing a fact column's name would emit
    // ambiguous duplicates on the broadcast path and throw deep inside
    // the as-of nulling loop — mode="auto" would then make the SAME
    // call succeed or fail depending on table SIZE. Reject the overlap
    // identically on every path instead (ADVICE r7): the caller renames
    // one side, which is the only unambiguous contract anyway.
    val overlap = versions.columns.toSet
      .intersect(facts.columns.toSet) - key - "effective_from" - "effective_to"
    require(overlap.isEmpty,
      s"temporalJoin: version payload column(s) ${overlap.mkString(", ")} collide " +
        s"with fact columns — rename one side before joining")
    val broadcastPath = mode match {
      case "broadcast" => true
      case "asof" => false
      case "auto" =>
        val stats = versions.queryExecution.optimizedPlan.stats
        stats.rowCount match {
          // per-row width from the SCHEMA (defaultSize: 20 B per string,
          // 8 B numerics/timestamps, element-estimated containers) + row
          // overhead, floored at 64 B — a fixed 64 B floor under-counted
          // wide version tables (many attrs / long strings) and let a
          // >64 MB table slip onto the broadcast path (ADVICE r7)
          case Some(rows) =>
            rows * estRowBytes(versions.schema) <= BigInt(maxBroadcastBytes)
          case None => stats.sizeInBytes <= BigInt(maxBroadcastBytes)
        }
      case other => throw new IllegalArgumentException(
        s"temporalJoin mode must be auto|broadcast|asof, got $other")
    }
    val v = versions
      .withColumnRenamed(key, "__dim_key")
      .withColumnRenamed("effective_from", "__ef")
      .withColumnRenamed("effective_to", "__et")
    if (broadcastPath) {
      facts.join(broadcast(v),
          facts(key) === col("__dim_key") &&
            facts(factTs) >= col("__ef") &&
            (col("__et").isNull || facts(factTs) < col("__et")),
          "left_outer")
        .drop("__dim_key", "__ef", "__et")
    } else {
      // as-of needs the join key under ONE name on both sides; restore
      // it for the probe, then strip the history copy positionally
      val hist = v.withColumnRenamed("__dim_key", key)
      val joined = graft.plans.AsOfJoin.asOf(facts, hist, key, factTs, "__ef")
      val names = facts.columns ++ hist.columns.map(c => if (c == key) "__dim_key" else c)
      val r = joined.toDF(names.toIndexedSeq: _*)
      // null out an attached-but-expired version (half-open [ef, et)):
      // as-of alone attaches the latest ef <= ts even past its et
      val valid = col("__ef").isNotNull && (col("__et").isNull || col(factTs) < col("__et"))
      // __ef/__et stay untouched: `valid` reads them, and they drop below
      val histPayload = hist.columns.filterNot(c => c == key || c == "__ef" || c == "__et")
      histPayload.foldLeft(r)((df, c) => df.withColumn(c, when(valid, col(c))))
        .drop("__dim_key", "__ef", "__et")
    }
  }

  // ---- incremental maintenance (foreachBatch body) -------------------

  def changesDir(dir: String): String = s"${dir.stripSuffix("/")}/changes"
  def versionsDir(dir: String): String = s"${dir.stripSuffix("/")}/versions"

  /** Fold one batch of raw changes into the SCD2 store. Usable directly
    * as a `foreachBatch` body; idempotent under replay (change-log merge
    * is LWW on (key, tieBreak); the version rewrite is a pure function
    * of the change log, so a replayed batch re-writes identical rows and
    * tombstones nothing).
    *
    * Version rows carry the pk `(key, __ef_us)` — the version's identity is
    * its key and start instant; a late change that splits or shifts a
    * run produces new pk rows and tombstones the stale ones.
    */
  def ingest(spark: SparkSession, dir: String, batch: DataFrame,
             batchId: Long, key: String = "user_id", ts: String = "ts",
             tieBreak: String = "event_id",
             attrs: Seq[String] = Seq("seg")): Unit = {
    if (batch.isEmpty) return
    // 1. raw change log — the system of record. LWW on the change's
    //    natural identity so a replayed batch is a no-op.
    Upsert.merge(spark, changesDir(dir),
      batch.select(col(key) +: col(ts) +: col(tieBreak) +: attrs.map(col): _*)
        .withColumn("__v", lit(batchId)),
      pk = Seq(key, tieBreak), versionCol = "__v",
      commitId = Some(s"scd2-chg-$batchId"))

    // 2. re-derive versions for TOUCHED keys only, from the full raw
    //    history of those keys (late-change correct — see scaladoc)
    val touched = batch.select(col(key)).distinct()
    val hist = Upsert.read(spark, changesDir(dir))
      .join(broadcast(touched), Seq(key), "left_semi")
    val fresh = fromHistory(hist, key, ts, tieBreak, attrs)
      .withColumn("__ef_us", unix_micros(col("effective_from")))

    // 3. tombstone version rows of touched keys that no longer exist
    //    (their run compressed away or their start moved), then upsert
    //    the fresh set — one LWW merge with delete flags
    val stale = Upsert.readIfExists(spark, versionsDir(dir)) match {
      case Some(existing) =>
        existing.join(broadcast(touched), Seq(key), "left_semi")
          .join(fresh.select(col(key), col("__ef_us")), Seq(key, "__ef_us"), "left_anti")
      case None => fresh.limit(0)
    }
    Upsert.merge(spark, versionsDir(dir),
      fresh.withColumn("__op", lit("upsert"))
        .unionByName(stale.drop("__v", "__op").withColumn("__op", lit("delete")))
        .withColumn("__v", lit(batchId)),
      pk = Seq(key, "__ef_us"), versionCol = "__v",
      deleteFlagCol = Some("__op"),
      commitId = Some(s"scd2-ver-$batchId"))
  }

  /** The maintained version table (empty-safe). */
  def versions(spark: SparkSession, dir: String): Option[DataFrame] =
    Upsert.readIfExists(spark, versionsDir(dir))
      .map(_.drop("__ef_us", "__op", "__v"))

  /** The serving-layer current snapshot — what the reference's HBase dim
    * table holds (latest image per key), derived instead of overwritten.
    */
  def currentSnapshot(spark: SparkSession, dir: String): Option[DataFrame] =
    versions(spark, dir).map(_.filter(col("is_current")))

  // ---- oracled query heads ------------------------------------------

  /** The events-derived segment dimension: each non-purchase event sets
    * the user's activity segment; consecutive identical segments
    * collapse (SCD2 no-op rule). Purchases are excluded — they are the
    * FACTS the temporal join enriches.
    */
  private def segChanges(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("seg"))

  /** `scd2_versions`: the full SCD2 dimension over the events history. */
  def scd2Versions(spark: SparkSession, sfDir: String): DataFrame =
    fromHistory(segChanges(spark, sfDir), "user_id", "ts", "event_id", Seq("seg"))
      .select(col("user_id"), col("seg"),
        date_format(col("effective_from"), "yyyy-MM-dd HH:mm:ss").as("effective_from"),
        coalesce(date_format(col("effective_to"), "yyyy-MM-dd HH:mm:ss"),
          lit("current")).as("effective_to"),
        col("is_current"))

  /** `scd2_temporal_join`: purchases attributed to the segment the user
    * was in AT PURCHASE TIME (not the segment they're in now — the
    * at-event-time semantics the reference's latest-image dim cannot
    * express), rolled up per segment. Purchases before a user's first
    * segment version report as 'unknown'.
    */
  def scd2TemporalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val v = fromHistory(segChanges(spark, sfDir),
      "user_id", "ts", "event_id", Seq("seg"))
    val facts = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        floor(col("value") * 100).cast("long").as("cents"))
    temporalJoin(facts, v, "user_id", "ts")
      .groupBy(coalesce(col("seg"), lit("unknown")).as("seg"))
      .agg(count(lit(1)).as("purchase_ct"), sum(col("cents")).as("sum_cents"))
  }
}
