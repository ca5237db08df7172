package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Poor-man's change-data-feed for [[Upsert]] tables.
  *
  * Each merge with changeLog=true appends one retract-encoded batch:
  *
  *   <table>_changes/batch=K/part-*.parquet
  *     … data columns …, __change ∈ {retract, add}
  *
  * `retract` rows are the pre-image of every key the merge touched,
  * `add` rows the surviving post-image — the file-based equivalent of
  * the reference's upsert-kafka retract topics (SQLUtil.java:46-54,
  * consumed by the DWS layer at DwdTradeOrderDetail.java:46-66). A
  * downstream SUM/COUNT aggregate refreshes from batches alone:
  * Σ(add) − Σ(retract) telescopes to the table's current content, so
  * per-refresh I/O is O(new changes), never O(table) — the property
  * that makes continuously-maintained DWS aggregates viable at 100 TB.
  * On a lakehouse deployment this object is replaced by the format's
  * native CDF; [[graft.rtdw.IncrementalDws]] doesn't change shape.
  */
object ChangeFeed {

  val ChangeCol = "__change"

  def dirFor(tableDir: String): String = tableDir.stripSuffix("/") + "_changes"

  private val NetRe = """net=(\d+)""".r
  private val BatchRe = """batch=(\d+)""".r

  /** Name-era marker (r14): feed batches are plain name-consumed
    * parquet, so after `RENAME COLUMN` a feed spans files under BOTH
    * names. Each batch/net dir carries `_nameera-K` — the table's
    * rename-chain length when the dir was WRITTEN (underscore-prefixed:
    * invisible to parquet readers, committed atomically inside the
    * dir's own publishing rename). Readers substitute exactly the
    * chain suffix `K..` the dir has not seen: markerless dirs are era
    * 0 (every pre-rename batch — renames refused on live feeds before
    * this existed), and a net COMPACTED after a rename records the
    * current era so its current-name rows are never mis-translated.
    */
  private val NameEraRe = """_nameera-(\d+)""".r

  private[graft] def nameEraOf(names: Iterable[String]): Int =
    names.collectFirst { case NameEraRe(k) => k.toInt }.getOrElse(0)

  private def currentEra(spark: SparkSession, tableDir: String): Int =
    Upsert.currentManifest(spark, tableDir)
      .map(Upsert.renameChainOf(_).length).getOrElse(0)

  private def writeEraMarker(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
                             era: Int): Unit =
    if (era > 0) fs.create(new Path(dir, s"_nameera-$era"), true).close()

  /** Translate a batch dir's columns to the table's CURRENT names:
    * presence-based against the collapsed rename map (tombstones
    * guarantee an old and its new name never coexist in one file, and
    * renamed-away names are refused at the write door, so presence is
    * unambiguous). Used by every BATCH read; the streaming source
    * does the same per-file via era-substituted read schemas.
    */
  private def translateRenames(spark: SparkSession, tableDir: String,
                               df: DataFrame,
                               renames: Map[String, String]): DataFrame = {
    if (renames.isEmpty) df
    else {
      def canon(n: String) = SchemaEvolution.canon(spark, n)
      val have = df.columns.map(canon).toSet
      df.columns.foldLeft(df) { (d, c) =>
        renames.get(canon(c)) match {
          case Some(n) if !have.contains(canon(n)) => d.withColumnRenamed(c, n)
          case Some(n) => throw new IllegalStateException(
            s"feed batch of $tableDir carries both '$c' and its renamed " +
              s"form '$n' — the rename tombstones should have refused this")
          case None => d
        }
      }
    }
  }

  /** (batchId, path) for every VISIBLE change batch, ascending. A
    * `net=K` directory is a compacted prefix 0..K (see [[compact]]):
    * the highest net present is authoritative and every `batch=` or
    * lower `net=` it covers is invisible — from the single atomic
    * rename that commits a net, readers resolve a complete feed at
    * every instant, so this is a PURE read (no recovery mutation; a
    * crashed compaction leaves only invisible covered dirs for the
    * next compact to sweep).
    */
  def batches(spark: SparkSession, tableDir: String): Seq[(Long, String)] = {
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val named = fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(s => (s.getPath.getName, s.getPath.toString))
    val nets = named.collect { case (NetRe(k), p) => (k.toLong, p) }
    val maxNet = nets.map(_._1).maxOption
    val plain = named.collect { case (BatchRe(k), p) => (k.toLong, p) }
    (nets.filter(n => maxNet.contains(n._1)) ++
      plain.filter(b => maxNet.forall(b._1 > _)))
      .sortBy(_._1)
  }

  /** The batch already committed under `commitId`, if any. The marker
    * file rides INSIDE the batch directory (underscore-prefixed, so
    * parquet readers ignore it) and therefore commits atomically with
    * the batch's own rename.
    */
  def committedBatchFor(spark: SparkSession, tableDir: String,
                        commitId: String): Option[Long] = {
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    batches(spark, tableDir).find { case (_, p) =>
      fs.exists(new Path(p, s"_commit-$commitId"))
    }.map(_._1)
  }

  /** Commit `changes` as the next batch (staging dir + rename, so a
    * half-written batch is never visible). Returns the batch id.
    *
    * `commitId` makes the append IDEMPOTENT: when a batch carrying the
    * same id already exists (a replayed foreachBatch, a crash between
    * the feed commit and the caller's own commit) the append is a no-op
    * returning the existing batch id — downstream delta folds never see
    * the same change twice. Compaction keeps the markers of the batches
    * it nets (single-writer discipline: only compact past every
    * consumer's — and any possible replay's — watermark).
    */
  def append(spark: SparkSession, tableDir: String, changes: DataFrame,
             commitId: Option[String] = None): Long = {
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    commitId.flatMap(committedBatchFor(spark, tableDir, _)) match {
      case Some(existing) => existing // replay: already committed
      case None =>
        val next = batches(spark, tableDir).lastOption.map(_._1 + 1).getOrElse(0L)
        // feed batches are PLAIN name-consumed parquet: strip any
        // parquet field-id metadata the frame picked up from an
        // id-stamped table scan, or the footers would mix stamped and
        // unstamped files across batches and Spark refuses such reads
        // (VERDICT r13 #2 — the post-image leg re-reads freshly staged
        // id-stamped files, the pre-image leg reads bare)
        val bare = FieldIds.stripIds(changes)
        val era = currentEra(spark, tableDir)
        FsOps.stageAndCommitBatch(fs, root, next, commitId) { tmp =>
          bare.write.mode("overwrite").parquet(tmp.toString)
          writeEraMarker(fs, tmp, era)
        }
        next
    }
  }

  /** All change batches with id > `afterBatch`, with the max id read —
    * None when the consumer is already caught up.
    */
  def since(spark: SparkSession, tableDir: String,
            afterBatch: Long): Option[(DataFrame, Long)] = {
    val fresh = batches(spark, tableDir).filter(_._1 > afterBatch)
    if (fresh.isEmpty) None
    else {
      // a net=K selected PAST a live watermark re-delivers the folded
      // prefix 0..K — silently double-counting at every since()
      // consumer (IncrementalDws.refresh, MV maintenance). Compaction
      // past a live consumer is the producer-side contract violation
      // [[compact]] documents; fail loudly, exactly as the streaming
      // source does (ChangeFeedSource.planInputPartitions).
      if (afterBatch >= 0)
        fresh.find { case (_, p) =>
          new Path(p).getName.startsWith("net=") }.foreach { case (id, _) =>
          throw new IllegalStateException(
            s"change feed of $tableDir was compacted to net=$id past this " +
              s"consumer's watermark $afterBatch — compaction must stay " +
              "behind every consumer (ChangeFeed.compact contract); rebuild " +
              "the consumer from scratch")
        }
      Some((readBatchDirs(spark, tableDir, fresh.map(_._2)), fresh.map(_._1).max))
    }
  }

  /** BOUNDED batch CDC read — the copy-on-write twin of
    * [[graft.rtdw.MorChangeFeed.changes]]: the retract/add rows of
    * feed batch range `(fromExclusive, to]`. Unlike [[since]] (which
    * reads "everything new now"), the upper bound makes the read
    * REPRODUCIBLE — an incremental job can catch up to a recorded
    * point and get the identical frame on retry, however many batches
    * landed meanwhile.
    *
    * Net-batch rules are [[since]]'s: `fromExclusive = -1` may start
    * at a net (the net IS the telescoped prefix — the bootstrap form);
    * a net PAST a live watermark refuses loudly (re-delivering the
    * folded prefix would double-count), and a range reaching past the
    * newest batch, or whose batches were GC'd by a later net, refuses
    * naming the ids rather than serving a silently partial feed.
    */
  def changes(spark: SparkSession, tableDir: String, fromExclusive: Long,
              to: Long): DataFrame = {
    require(to > fromExclusive,
      s"changes($fromExclusive, $to] on the feed of $tableDir: empty or " +
        "inverted range")
    val all = batches(spark, tableDir)
    val maxKnown = all.map(_._1).maxOption.getOrElse(-1L)
    require(to <= maxKnown,
      s"changes($fromExclusive, $to] on the feed of $tableDir: batch $to " +
        s"does not exist (newest is $maxKnown)")
    val inRange = all.filter { case (id, _) => id > fromExclusive && id <= to }
    if (fromExclusive >= 0)
      inRange.find { case (_, p) => new Path(p).getName.startsWith("net=") }
        .foreach { case (id, _) =>
          throw new IllegalStateException(
            s"change feed of $tableDir was compacted to net=$id past " +
              s"watermark $fromExclusive — the net replaces the prefix this " +
              "range expects as deltas; re-bootstrap from changes(-1, ...)")
        }
    // visible ids are the newest net + every later batch. A bounded
    // range must cover every id it promises: from >= 0 promises
    // from+1..to verbatim; from = -1 promises history-from-birth,
    // which the earliest VISIBLE id starts (a net batch IS the
    // telescoped prefix below it). Anything promised but not visible
    // was folded into a newer net — refuse, never serve partial.
    val have = inRange.map(_._1).toSet
    val expectedStart =
      if (fromExclusive < 0) math.max(all.map(_._1).min, 0L)
      else fromExclusive + 1
    val missing = (expectedStart to to).filterNot(have.contains)
    if (missing.nonEmpty || inRange.isEmpty)
      throw new IllegalStateException(
        s"changes($fromExclusive, $to] on the feed of $tableDir is not " +
          s"reconstructible: batch(es) " +
          s"${(if (missing.nonEmpty) missing else (fromExclusive + 1) to to).mkString(", ")} " +
          "were folded into a newer net batch — re-bootstrap from changes(-1, ...)")
    readBatchDirs(spark, tableDir, inRange.map(_._2))
  }

  /** Union batch dirs BY NAME: the table may have evolved between
    * batches, and a multi-path parquet read would silently impose one
    * batch's schema on all of them. Missing columns fill with NULL;
    * pre-rename batches translate to the current names per dir BEFORE
    * the union (so old-name and new-name batches fold into one
    * column). Each dir's inferred schema is stripped of any field-id
    * metadata a legacy (r13-era) stamped batch may carry, so
    * downstream unions, folds, and net rewrites never re-emit ids
    * into the feed.
    */
  private def readBatchDirs(spark: SparkSession, tableDir: String,
                            paths: Seq[String]): DataFrame = {
    // ONE manifest read for the whole range (a deep backlog is many
    // dirs; the rename map is the same for all of them)
    val renames = Upsert.currentManifest(spark, tableDir)
      .map(Upsert.renamedFromOf).getOrElse(Map.empty)
    paths.map(p => translateRenames(spark, tableDir,
        FieldIds.stripIds(spark.read.parquet(p)), renames))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Compact the batch prefix `0..upTo` into one net batch at id
    * `upTo`, so a FRESH consumer bootstraps from O(table-touched-keys)
    * rows instead of replaying the full merge history. The net of the
    * prefix is computed without schema knowledge: identical rows cancel
    * retract-against-add (for a PK table the per-row net is 0 or 1; the
    * general multiset case is expanded). Only compact up to the
    * slowest consumer's applied watermark — a consumer whose watermark
    * is INSIDE the compacted range would double-count.
    *
    * Crash/concurrency contract: the ONE atomic rename committing
    * `net=upTo` is the visibility switch — before it, readers see the
    * intact prefix; after it, the prefix is covered and invisible, so
    * there is no instant at which a reader can list a truncated feed
    * and no recovery phase a second runner could re-execute
    * destructively (the old two-phase delete-then-swap allowed both).
    * Racing compacts to the same id: one rename wins, the loser throws.
    * A racing [[append]] always lists at least the committed net, so
    * batch numbering can never reset. The post-commit sweep of covered
    * dirs is idempotent garbage collection; a crash there just leaves
    * invisible dirs for the next compact.
    */
  def compact(spark: SparkSession, tableDir: String, upTo: Long): Unit = {
    import org.apache.spark.sql.functions._
    val prefix = batches(spark, tableDir).filter(_._1 <= upTo)
    if (prefix.size <= 1) return
    val df = readBatchDirs(spark, tableDir, prefix.map(_._2))
    val dataCols = df.columns.filterNot(_ == ChangeCol).toSeq
    val net = df
      .groupBy(dataCols.map(col): _*)
      .agg(sum(when(col(ChangeCol) === "add", 1L).otherwise(-1L)).as("__net"))
      .filter(col("__net") > 0)
      .withColumn("__i", explode(sequence(lit(1L), col("__net"))))
      .select(dataCols.map(col): _*)
      .withColumn(ChangeCol, lit("add"))
    val root = new Path(dirFor(tableDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(root, s".compact-$upTo.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    net.write.mode("overwrite").parquet(tmp.toString)
    // the net holds CURRENT-name rows (readBatchDirs translated), so
    // it records the CURRENT era — even though its id sits below
    // pre-rename batches it replaced
    writeEraMarker(fs, tmp, currentEra(spark, tableDir))
    // carry the prefix's idempotence markers into the net so a very
    // late replayed append still dedupes after compaction
    prefix.foreach { case (_, p) =>
      fs.listStatus(new Path(p)).iterator
        .filter(_.getPath.getName.startsWith("_commit-"))
        .foreach(m => fs.create(new Path(tmp, m.getPath.getName), true).close())
    }
    // COMMIT POINT (see contract above)
    FsOps.renameOrThrow(fs, tmp, new Path(root, s"net=$upTo"))
    // idempotent GC of everything the new net covers
    fs.listStatus(root).foreach { s =>
      s.getPath.getName match {
        case BatchRe(k) if k.toLong <= upTo => fs.delete(s.getPath, true)
        case NetRe(k) if k.toLong < upTo => fs.delete(s.getPath, true)
        case _ => ()
      }
    }
  }
}
