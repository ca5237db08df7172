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
}
