package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Durable consumer registry for a table's change feed: which named
  * subscribers exist and how far each has APPLIED the feed, so
  * producer-side maintenance (feed compaction/GC, bounded MOR delta
  * folds) can advance exactly to the slowest registered consumer and
  * no further — feed batches age out once every subscriber has folded
  * them, instead of accumulating forever (NOTES backlog: "feed dirs
  * only net-compact today, never age out"; ADVICE r14: gate the
  * in-stream paired compact on the minimum watermark across
  * registered subscribers).
  *
  * Reference analog: Kafka consumer-group committed offsets bound
  * `log.retention` decisions for the reference's DWD topics
  * (`FlinkSourceUtil.java:18-42` reads from a GROUP id precisely so
  * the broker can track the group's progress); on bare parquet this
  * registry IS that group-offset surface.
  *
  * Storage: zero-byte marker files `sub-<name>=<batch>` under
  * `<tableDir>_subscribers/`. The FILENAME is the whole datum —
  * creation either lands or it doesn't, so there is no torn-content
  * state to misread. Updates NEVER remove higher-numbered markers
  * (a crash-replayed consumer recording a lower batch cannot regress
  * the watermark: max-per-name wins) and delete lower ones only after
  * the new marker exists (a crash mid-record leaves the OLD marker —
  * stale-LOW, which only holds maintenance back, never advances it
  * past a live reader). Every failure direction is conservative.
  *
  * The watermark UNIT is whatever the feed counts batches in: CoW
  * change-feed batch ids for [[ChangeFeed]] consumers, fact delta
  * batch ids for [[MergeOnRead]] subscriptions. One table's
  * subscribers must share a unit, which they do by construction —
  * the registry lives next to ONE feed.
  *
  * A registered-but-dead subscriber pins maintenance forever by
  * design (the safe direction); [[unsubscribe]] is the explicit
  * release, and [[list]] exposes each watermark's age so an operator
  * policy can DECIDE to drop a stale one — the registry never does so
  * silently.
  */
object Subscribers {

  /** Registry root for a table: `<tableDir>_subscribers`. */
  def dirFor(tableDir: String): String =
    tableDir.stripSuffix("/") + "_subscribers"

  /** One subscriber's registered position. `updatedAtMs` is the
    * winning marker's filesystem mtime — freshness, not correctness.
    */
  final case class Subscription(name: String, appliedBatch: Long,
                                updatedAtMs: Long)

  private val MarkerRe = "sub-(.+)=(-?\\d+)".r

  private def validate(name: String): Unit =
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"subscriber name '$name' must be non-empty [A-Za-z0-9._-] " +
        "(':' would parse as a URI scheme in the marker Path)")

  /** Record that `name` has applied the feed through `appliedBatch`
    * (inclusive; −1 = registered but nothing applied yet, which pins
    * all maintenance — how a fresh consumer reserves its bootstrap
    * window). Idempotent; never regresses the name's watermark.
    */
  def record(spark: SparkSession, tableDir: String, name: String,
             appliedBatch: Long): Unit = {
    validate(name)
    require(appliedBatch >= -1L,
      s"appliedBatch $appliedBatch < -1 for subscriber '$name'")
    val root = new Path(dirFor(tableDir))
    val fs = FsOps.fs(spark, root)
    fs.mkdirs(root)
    fs.create(new Path(root, s"sub-$name=$appliedBatch"), true).close()
    // sweep lower markers of the SAME name only after the new one
    // exists (idempotent GC; a crash before this leaves max-wins dups)
    fs.listStatus(root).foreach { st =>
      st.getPath.getName match {
        case MarkerRe(n, b) if n == name && b.toLong < appliedBatch =>
          fs.delete(st.getPath, false); ()
        case _ => ()
      }
    }
  }

  /** All registered subscribers, one row per name (max batch wins). */
  def list(spark: SparkSession, tableDir: String): Seq[Subscription] = {
    val root = new Path(dirFor(tableDir))
    val fs = FsOps.fs(spark, root)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case MarkerRe(n, b) =>
            Some(Subscription(n, b.toLong, st.getModificationTime))
          case _ => None
        }
      }
      .groupBy(_.name).values.map(_.maxBy(_.appliedBatch)).toSeq
      .sortBy(_.name)
  }

  /** The applied watermark of one subscriber, if registered. */
  def appliedOf(spark: SparkSession, tableDir: String,
                name: String): Option[Long] =
    list(spark, tableDir).find(_.name == name).map(_.appliedBatch)

  /** The slowest registered subscriber's applied batch — the highest
    * id producer-side maintenance may fold/GC. None when the registry
    * is empty (no consumer ever registered): the caller must then fall
    * back to an EXPLICIT bound, never assume "nobody is reading".
    */
  def minWatermark(spark: SparkSession, tableDir: String): Option[Long] =
    list(spark, tableDir) match {
      case Nil => None
      case subs => Some(subs.map(_.appliedBatch).min)
    }

  /** Drop `name` from the registry, releasing whatever it pinned. */
  def unsubscribe(spark: SparkSession, tableDir: String,
                  name: String): Unit = {
    val root = new Path(dirFor(tableDir))
    val fs = FsOps.fs(spark, root)
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        st.getPath.getName match {
          case MarkerRe(n, _) if n == name => fs.delete(st.getPath, false); ()
          case _ => ()
        }
      }
  }
}
