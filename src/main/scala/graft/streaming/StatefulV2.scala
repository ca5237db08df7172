package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.model.{FirstSeen, KeyDay}

/** The A6 family on Spark 4's transformWithState — the modern
  * arbitrary-state API. Unlike flatMapGroupsWithState (Stateful.scala),
  * state TTL is declarative (TTLConfig), which maps 1:1 onto the
  * reference's StateTtlConfig (1-day UV state at
  * DwsTrafficVcChArIsNewPageViewWindow.java:133-136): expired per-key
  * days are evicted by the state store itself — no timer bookkeeping —
  * so state size is bounded by (active keys × TTL window) at any scale.
  *
  * Streaming runs require the RocksDB state store provider (the same
  * provider a 100 TB deployment uses); batch runs work everywhere.
  */
class FirstSeenProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[String, KeyDay, FirstSeen] {

  @transient private var lastDay: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val cfg = if (ttl == null) TTLConfig.NONE else TTLConfig(ttl)
    lastDay = getHandle.getValueState[String]("lastDay", Encoders.STRING, cfg)
  }

  override def handleInputRows(key: String, rows: Iterator[KeyDay],
                               timers: TimerValues): Iterator[FirstSeen] = {
    // reference semantics (mapUvBean): emit when the day advances past
    // the last seen day; equal or older days within state are dups
    var last = lastDay.get()
    val out = rows.toSeq.sortBy(_.day).flatMap { e =>
      if (last == null || e.day > last) { last = e.day; Some(FirstSeen(key, e.day)) }
      else None
    }
    if (last != null) lastDay.update(last)
    out.iterator
  }
}

object StatefulV2 {

  /** First-seen-per-day via transformWithState. State is only the LAST
    * seen day (exactly the reference's ValueState<String>), so
    * out-of-order days older than the newest are treated as seen —
    * the same divergence the reference has.
    *
    * Pass a ttl to enable declarative state expiry (the reference's
    * 1-day StateTtlConfig). TTL switches the query to
    * TimeMode.ProcessingTime, which keeps triggering micro-batches to
    * advance the TTL clock — correct on a real trigger cadence,
    * unsuitable for processAllAvailable-style test loops, hence the
    * no-TTL default here.
    */
  def firstSeenPerDayTtl(ds: Dataset[KeyDay],
                         ttl: java.time.Duration = null): Dataset[FirstSeen] = {
    import ds.sparkSession.implicits._
    val timeMode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(_.key)
      .transformWithState(new FirstSeenProcessor(ttl), timeMode, OutputMode.Append())
  }
}
