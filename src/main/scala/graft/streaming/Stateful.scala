package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model._

/** The arbitrary-stateful operator family (SURVEY.md §2.5 A6/A7/A8) —
  * the one part of the reference that genuinely needs Spark's
  * flatMapGroupsWithState rather than declarative aggregation.
  *
  * All three operators shuffle once on their key and keep O(1) state
  * per key (a date string / a long), so state size scales with key
  * cardinality only — the property that lets them run at 100 TB with a
  * RocksDB state store. Works identically over streaming Datasets
  * (micro-batch, state across batches) and batch Datasets (single
  * group pass), which is how the specs pin their semantics.
  */
object Stateful {

  /** A6 — first-seen-per-day dedup (UV derivation).
    * Reference: DwsTrafficVcChArIsNewPageViewWindow.mapUvBean
    * (DwsTrafficVcChArIsNewPageViewWindow.java:120-179) and four
    * sibling apps: keyed ValueState<lastSeenDate>, emit only when the
    * day changes. Emits every (key, day) exactly once; downstream
    * windowed counts of the emissions are exact daily UVs.
    *
    * State is [[BoundedDays]]: the max day ever seen plus the days
    * within [[StateLogic.DefaultRetainDays]] of it — ≤ retainDays+1
    * entries per key FOREVER, independent of stream lifetime (the
    * property that lets this run for years against a RocksDB store).
    * Out-of-order days within the retain window still dedup exactly;
    * older stragglers are dropped as already-seen (the watermark
    * contract). The reference expires its ValueState after 1 day and
    * re-counts a returning key (:133-136); keeping the max day (one
    * string) avoids that double-count — divergence documented in
    * SURVEY §7.4. Transitions live in [[StateLogic.firstSeenStep]] so
    * the bound is property-tested without a Spark job (StatefulProps).
    */
  def firstSeenPerDay(ds: Dataset[KeyDay]): Dataset[FirstSeen] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[BoundedDays, FirstSeen](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyDay], state: GroupState[BoundedDays]) =>
          var st = state.getOption
          // ascending day order within the batch: every distinct day is
          // strictly greater than the running max, so a single batch
          // emits exactly the distinct (key, day) set regardless of
          // arrival order; the retain window only governs cross-batch
          // stragglers.
          val out = rows.map(_.day).toSet.toSeq.sorted.flatMap { d =>
            val (emit, next) = StateLogic.firstSeenStep(st, d)
            st = Some(next)
            if (emit) Some(FirstSeen(key, d)) else None
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Epoch millis at which a key whose newest day is `maxDay` becomes
    * idle-evictable under an `idleDays` TTL (UTC day arithmetic —
    * matches the UTC session timezone every entry point sets).
    */
  private[graft] def dayExpiryMs(maxDay: String, idleDays: Int): Long =
    (java.time.LocalDate.parse(maxDay).toEpochDay + idleDays) * 86400000L

  /** A6 with DORMANT-KEY EVICTION (VERDICT r2 #1): same emissions as
    * [[firstSeenPerDay]] while a key stays active, but a key idle for
    * `idleTtlDays` of event time is dropped from the state store via
    * an event-time timeout — total state tracks ACTIVE keys, not
    * all-time key cardinality. A key returning after eviction
    * re-counts (one extra emission), exactly the reference's 1-day
    * StateTtlConfig semantics
    * (DwsTrafficVcChArIsNewPageViewWindow.java:133-136). Pure model:
    * [[StateLogic.expireIfIdle]], property-tested in StatefulProps;
    * store-level eviction + re-count proven in StatefulEvictionSpec.
    * Batch runs (no watermark ⇒ no timeouts) behave exactly like
    * [[firstSeenPerDay]].
    */
  def firstSeenPerDayEvicting(dsIn: Dataset[KeyDay], idleTtlDays: Int = 7,
                              watermarkDelay: String = "1 second"): Dataset[FirstSeen] = {
    import dsIn.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val streaming = dsIn.isStreaming
    val typed = dsIn
      .select(col("key"), col("day"), to_timestamp(col("day")).as("ts")).as[KeyDayTs]
    val src = if (streaming) typed.withWatermark("ts", watermarkDelay) else typed
    src.groupByKey(_.key)
      .flatMapGroupsWithState[BoundedDays, FirstSeen](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyDayTs], state: GroupState[BoundedDays]) =>
          if (streaming && state.hasTimedOut) {
            state.remove() // dormant key: physically evicted from the store
            Iterator.empty
          } else {
            var st = state.getOption
            val out = rows.map(_.day).toSet.toSeq.sorted.flatMap { d =>
              val (emit, next) = StateLogic.firstSeenStep(st, d)
              st = Some(next)
              if (emit) Some(FirstSeen(key, d)) else None
            }
            st.foreach { s =>
              state.update(s)
              if (streaming) state.setTimeoutTimestamp(
                // never behind the watermark (Spark rejects that); +1 so
                // a straggler key still gets one full TTL from "now"
                math.max(dayExpiryMs(s.maxDay, idleTtlDays),
                  state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** A8 — is_new repair.
    * Reference: DwdBaseLog.isNewFix (DwdBaseLog.java:143-186):
    *  - is_new=1 but the visitor's first-seen day is earlier → flip to 0
    *    (forged "new" flag);
    *  - is_new=0 but we've never seen the visitor → they predate the
    *    pipeline: backfill state with "yesterday" (any day < today) so
    *    they never count as new.
    */
  def isNewFix(ds: Dataset[VisitorHit]): Dataset[VisitorHitFixed] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.mid)
      .flatMapGroupsWithState[String, VisitorHitFixed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (mid: String, rows: Iterator[VisitorHit], state: GroupState[String]) =>
          // process in day order within the group for deterministic batch runs
          val sorted = rows.toSeq.sortBy(_.day)
          var firstDay = state.getOption.orNull
          val out = sorted.map { h =>
            val fixed =
              if (h.isNew == "1") {
                if (firstDay == null) { firstDay = h.day; "1" }
                else if (firstDay == h.day) "1"
                else "0"
              } else {
                if (firstDay == null) {
                  // old visitor from before state existed: mark first day
                  // strictly before any observed day
                  firstDay = ""
                }
                "0"
              }
            VisitorHitFixed(h.mid, h.day, fixed)
          }
          if (firstDay != null) state.update(firstDay)
          out.iterator
      }
  }

  /** A8 with dormant-key eviction (see [[firstSeenPerDayEvicting]]):
    * a mid idle past `idleTtlDays` is evicted; if it returns, the fix
    * logic restarts from empty state — the visitor may be re-flagged
    * new once, the same bounded re-count the reference's state TTL
    * accepts for every A6/A8-family app.
    */
  def isNewFixEvicting(dsIn: Dataset[VisitorHit], idleTtlDays: Int = 7,
                       watermarkDelay: String = "1 second"): Dataset[VisitorHitFixed] = {
    import dsIn.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val streaming = dsIn.isStreaming
    val typed = dsIn.select(col("mid"), col("day"), col("isNew"),
      to_timestamp(col("day")).as("ts")).as[VisitorHitTs]
    val src = if (streaming) typed.withWatermark("ts", watermarkDelay) else typed
    src.groupByKey(_.mid)
      .flatMapGroupsWithState[String, VisitorHitFixed](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout) {
        (mid: String, rows: Iterator[VisitorHitTs], state: GroupState[String]) =>
          if (streaming && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(_.day)
            var firstDay = state.getOption.orNull
            val out = sorted.map { h =>
              val fixed =
                if (h.isNew == "1") {
                  if (firstDay == null) { firstDay = h.day; "1" }
                  else if (firstDay == h.day) "1"
                  else "0"
                } else {
                  if (firstDay == null) firstDay = ""
                  "0"
                }
              VisitorHitFixed(h.mid, h.day, fixed)
            }
            if (firstDay != null) {
              state.update(firstDay)
              if (streaming && sorted.nonEmpty) state.setTimeoutTimestamp(
                math.max(dayExpiryMs(sorted.last.day, idleTtlDays),
                  state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** A7-lite — watermark-bounded exact-duplicate drop: Spark's
    * dropDuplicatesWithinWatermark keeps per-key state only for the
    * watermark window (the reference's 30 s StateTtlConfig at
    * DwsTradeSkuOrderWindow.java:165 is exactly this contract). Use
    * when only the FIRST version of a key matters; upsertDeltas below
    * when later versions must correct earlier ones.
    */
  def dropDupsWithinWatermark(df: org.apache.spark.sql.DataFrame,
                              keys: Seq[String], tsCol: String,
                              watermark: String): org.apache.spark.sql.DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    if (df.isStreaming) wm.dropDuplicatesWithinWatermark(keys)
    else wm.dropDuplicates(keys)
  }

  /** A7 — upsert-correction: per-key retract emulation.
    * Reference: DwsTradeSkuOrderWindow.processBeanStream (:158-201):
    * MapState of last amounts; each re-emission of an order-detail id
    * emits (new − last) so downstream window sums telescope to the
    * latest value without retract streams.
    */
  def upsertDeltas(ds: Dataset[VersionedAmount]): Dataset[AmountDelta] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), AmountDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[VersionedAmount], state: GroupState[(Long, Long)]) =>
          var (lastTs, lastAmt) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = rows.toSeq.sortBy(v => (v.ts, v.amount)).flatMap { v =>
            if (v.ts >= lastTs) {
              val d = AmountDelta(key, v.ts, v.amount - lastAmt)
              lastTs = v.ts; lastAmt = v.amount
              Some(d)
            } else None // stale out-of-order version: ignore
          }
          state.update((lastTs, lastAmt))
          out.iterator
      }
  }

  /** A7 with CORRECTION-WINDOW eviction — the reference's exact
    * contract: its per-id last-amount MapState carries a 30 s
    * StateTtlConfig (DwsTradeSkuOrderWindow.java:165), accepting that
    * a correction arriving after the TTL re-counts the full amount.
    * Without eviction this state grows with ALL-TIME order-detail-id
    * cardinality — the single fastest-growing key space in the whole
    * warehouse (one key per order line ever). With it, state is
    * O(ids within the correction window). Corrections inside the TTL
    * telescope exactly like [[upsertDeltas]]; later ones re-count —
    * spec'd in StatefulEvictionSpec, and the TTL is the caller's
    * correction-lateness bound exactly as in the reference.
    */
  def upsertDeltasEvicting(ds: Dataset[VersionedAmount],
                           ttl: String = "30 seconds",
                           watermarkDelay: String = "1 second"): Dataset[AmountDelta] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val streaming = ds.isStreaming
    val ttlMs = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(ttl)).microseconds / 1000L
    val typed = ds.select(col("key"), col("ts"), col("amount"),
      timestamp_millis(col("ts")).as("et")).as[VersionedAmountTs]
    val src = if (streaming) typed.withWatermark("et", watermarkDelay) else typed
    src.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), AmountDelta](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[VersionedAmountTs], state: GroupState[(Long, Long)]) =>
          if (streaming && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (lastTs, lastAmt) = state.getOption.getOrElse((Long.MinValue, 0L))
            val out = rows.toSeq.sortBy(v => (v.ts, v.amount)).flatMap { v =>
              if (v.ts >= lastTs) {
                val d = AmountDelta(key, v.ts, v.amount - lastAmt)
                lastTs = v.ts; lastAmt = v.amount
                Some(d)
              } else None
            }
            state.update((lastTs, lastAmt))
            if (streaming && lastTs != Long.MinValue) state.setTimeoutTimestamp(
              math.max(lastTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
