package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed upsert (the K3/K5 MERGE substitute — SURVEY.md §2.2).
  *
  * The reference terminates DWD facts in upsert-kafka / HBase puts
  * keyed by PK (SQLUtil.getUpsertKafkaSQL:46-54,
  * DimHBaseSinkFunction.java:50-104). The Spark-native design is
  * `MERGE INTO` on an ACID table format; this container ships bare
  * parquet, so we implement last-writer-wins merge over a
  * HASH-BUCKETED layout:
  *
  *   dir/__bucket=0/part-*.parquet ... dir/__bucket=N-1/...
  *
  * with `__bucket = pmod(xxhash64(pk), numBuckets)` — a stable,
  * data-independent placement. A merge batch rewrites ONLY the buckets
  * its keys hash into: per-batch I/O is O(touched buckets × bucket
  * size), not O(table). For random PKs, touched ≈ min(batch keys,
  * numBuckets), so the pruning gain (numBuckets / touched) is real
  * exactly when a batch carries far fewer keys than there are buckets
  * — the CDC dim-maintenance case this layout serves (DimPipeline
  * micro-batches touch a handful of rows; a 50-key batch against 4096
  * buckets reads ~1% of the table instead of 100%). A firehose of
  * random-key fact upserts touches every bucket per batch and needs
  * merge-on-read instead — that is [[MergeOnRead]]: O(batch) delta
  * appends resolved at read, compacted in the background (measured in
  * ScaleProbe: ~70× cheaper per firehose batch). Untouched
  * buckets' files are never opened, rewritten, or moved (proved
  * byte-identical in UpsertSpec). With `bloom=true` a second skipping
  * level kicks in BELOW bucket pruning: each bucket carries a per-file
  * key Bloom sidecar ([[Blooms]]), so a point merge reads only the
  * files that might hold its keys and metadata-moves the rest — reads
  * files, not whole buckets. Each touched bucket is written to a
  * `.tmp` staging dir and swapped in with a directory rename — readers
  * of a bucket see either the old or the new version, never a
  * half-written one (per-bucket snapshot; the global-snapshot upgrade
  * is exactly what `MERGE INTO` on a lakehouse format buys, and this
  * object is the single swap point for it).
  */
object Upsert {

  /** Buckets per table. Sized so one bucket of a continuously-merged
    * table stays comfortably inside one executor's scan budget
    * (~table_size / numBuckets); raise for bigger tables — placement
    * is stable for a given value. Small here for local test data.
    */
  val DefaultNumBuckets = 16

  private val BucketCol = "__bucket"

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Raw read of the table (includes the `__bucket` partition column
    * when the table is bucketed).
    */
  def readIfExists(spark: SparkSession, dir: String): Option[DataFrame] =
    if (exists(spark, dir)) { recoverSwaps(spark, dir); Some(spark.read.parquet(dir)) }
    else None

  /** Read the table's logical content (bucket column dropped). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    recoverSwaps(spark, dir)
    spark.read.parquet(dir).drop(BucketCol)
  }

  // ---- two-phase bucket swap (crash-safe) -------------------------------
  // A bucket swap must delete the old bucket dir and rename the staged
  // one in; a naive delete-then-rename loses the bucket if the process
  // dies between the two (and a bloom-preserve merge additionally moves
  // kept files out of the live bucket first). The COMMIT POINT is a
  // durable marker `.swap-<b>.ready` at the table root listing the
  // preserved file names: once it exists the remaining steps are
  // deterministic and idempotent, and every entry point (read/lookup/
  // merge) finishes them first — the same .ready pattern as
  // ChangeFeed.compact.

  private val SwapRe = """\.swap-(\d+)\.ready""".r

  private def markerPath(dir: String, b: Int) = new Path(dir, s".swap-$b.ready")

  private def finishBucketSwap(spark: SparkSession, dir: String, b: Int): Unit = {
    val fs = FsOps.fs(spark, new Path(dir))
    val marker = markerPath(dir, b)
    if (!fs.exists(marker)) return
    val kept = FsOps.readTextOpt(spark, marker)
      .map(_.linesIterator.filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    val oldB = new Path(dir, s"$BucketCol=$b")
    val stageB = new Path(dir + ".tmp", s"$BucketCol=$b")
    if (kept.nonEmpty && !fs.exists(stageB)) fs.mkdirs(stageB)
    kept.foreach { f =>
      val src = new Path(oldB, f)
      if (fs.exists(src)) FsOps.renameOrThrow(fs, src, new Path(stageB, f))
    }
    if (fs.exists(oldB)) fs.delete(oldB, true)
    if (fs.exists(stageB)) FsOps.renameOrThrow(fs, stageB, oldB)
    fs.delete(marker, false)
  }

  /** Finish any interrupted bucket swaps — a cheap no-op (one listing)
    * when no `.swap-*.ready` markers exist. Called from every reader
    * and writer entry point.
    */
  def recoverSwaps(spark: SparkSession, dir: String): Unit = {
    val root = new Path(dir)
    val fs = FsOps.fs(spark, root)
    if (!fs.exists(root)) return
    fs.listStatus(root).map(_.getPath.getName)
      .collect { case SwapRe(b) => b.toInt }
      .foreach(finishBucketSwap(spark, dir, _))
  }

  /** Point lookup by PK values: the read-path payoff of the bucketed
    * layout. Key values hash to their buckets driver-side, the scan is
    * partition-pruned to exactly those buckets (asserted in
    * UpsertSpec), so a dim Get touches O(keys) buckets out of
    * numBuckets — the HBase-Get shape (DimHBaseSinkFunction reads)
    * without a serving store.
    */
  def lookup(spark: SparkSession, dir: String, pkCol: String,
             values: Seq[String],
             numBuckets: Int = DefaultNumBuckets): DataFrame = {
    import spark.implicits._
    recoverSwaps(spark, dir)
    val buckets = values.toDF("v")
      .select(pmod(xxhash64(col("v")), lit(numBuckets)).cast("int").as("b"))
      .distinct().as[Int].collect().toSeq
    // file-level bloom skipping below the bucket pruning, when every
    // target bucket carries a sidecar (written by bloom=true merges)
    val prunedFiles: Option[Seq[String]] = {
      val per = buckets.map(b => bloomCandidates(spark, dir, b, values))
      if (per.exists(_.isEmpty)) None
      else Some(buckets.zip(per.flatten).flatMap { case (b, (cand, _)) =>
        cand.map(f => s"$dir/$BucketCol=$b/$f")
      })
    }
    prunedFiles match {
      case Some(files) if files.nonEmpty =>
        spark.read.option("basePath", dir).parquet(files: _*)
          .filter(col(pkCol).isin(values: _*))
          .drop(BucketCol)
      case Some(_) => // blooms prove no file can hold any key
        spark.read.parquet(dir).filter(lit(false)).drop(BucketCol)
      case None =>
        spark.read.parquet(dir)
          .filter(col(BucketCol).isin(buckets: _*)) // partition-pruned
          .filter(col(pkCol).isin(values: _*))
          .drop(BucketCol)
    }
  }

  /** The canonical PK string every placement/bloom hash is keyed on
    * (\u0001-joined so multi-column keys can't collide by concatenation).
    */
  private[io] def keyStr(pk: Seq[String]) =
    concat_ws("\u0001", pk.map(c => col(c).cast("string")): _*)

  private def withBucket(df: DataFrame, pk: Seq[String], numBuckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(xxhash64(keyStr(pk)), lit(numBuckets)).cast("int"))

  /** Bloom-pruned file split for one bucket: (candidate, preserved)
    * file names — candidates MIGHT contain one of `keys` and must be
    * read/rewritten by a merge; preserved files provably contain none
    * and are carried over untouched (metadata move, no I/O). None when
    * the bucket has no sidecar (fall back to whole-bucket). `keys` are
    * canonical PK strings (single-column PK: the value itself).
    */
  def bloomCandidates(spark: SparkSession, dir: String, bucket: Int,
                      keys: Seq[String]): Option[(Seq[String], Seq[String])] = {
    val bDir = new Path(dir, s"$BucketCol=$bucket")
    val fs = FsOps.fs(spark, bDir)
    if (!fs.exists(bDir)) return Some((Seq.empty, Seq.empty))
    Blooms.read(fs, bDir).map { entries =>
      val dataFiles = fs.listStatus(bDir).toSeq.map(_.getPath.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
      // a file absent from the sidecar is conservatively a candidate
      dataFiles.partition(f =>
        entries.get(f).forall(w => keys.exists(k => Blooms.mightContain(w, k))))
    }
  }

  /** Per-file Blooms for one plain directory (no partition column):
    * the same no-UDF aggregation as [[buildBlooms]], keyed by file only.
    */
  private def fileBlooms(spark: SparkSession, path: String,
                         pk: Seq[String]): Map[String, Array[Long]] = {
    val posCols = (0 until Blooms.K).map(i =>
      pmod(xxhash64(keyStr(pk), lit(i)), lit(Blooms.Bits)))
    val rows = spark.read.parquet(path)
      .select(input_file_name().as("f"), explode(array(posCols: _*)).as("p"))
      .select(col("f"), (col("p") / 64).cast("int").as("wi"),
        expr("shiftleft(1L, cast(p % 64 as int))").as("bits"))
      .groupBy(col("f"), col("wi"))
      .agg(expr("bit_or(bits)").as("w"))
      .collect()
    rows.groupBy(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1))
      .map { case (name, frs) =>
        val words = new Array[Long](Blooms.Words)
        frs.foreach(r => words(r.getInt(1)) = r.getLong(2))
        name -> words
      }
  }

  /** Compact buckets that accumulated files (every bloom point merge
    * adds one file and preserves the rest — the price of not rewriting
    * key-disjoint data). Buckets holding more than `maxFilesPerBucket`
    * data files are rewritten as a single file (a bucket is sized to
    * one executor's scan budget by design) with a fresh Bloom sidecar,
    * swapped in per bucket. Content is untouched — this is pure file-
    * count maintenance, the analog of a lakehouse OPTIMIZE, run out of
    * band of the merge path.
    */
  def compactBuckets(spark: SparkSession, dir: String, pk: Seq[String],
                     maxFilesPerBucket: Int = 8,
                     bloom: Boolean = true): Unit = {
    val root = new Path(dir)
    val fs = FsOps.fs(spark, root)
    if (!fs.exists(root)) return
    val bucketDirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$BucketCol="))
    bucketDirs.foreach { st =>
      val dataFiles = fs.listStatus(st.getPath).toSeq.map(_.getPath.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
      if (dataFiles.size > maxFilesPerBucket) {
        val b = st.getPath.getName.stripPrefix(s"$BucketCol=")
        val tmp = new Path(root, s".compact-bucket-$b.tmp")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        spark.read.parquet(st.getPath.toString).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        if (bloom) Blooms.write(fs, tmp, fileBlooms(spark, tmp.toString, pk))
        fs.delete(st.getPath, true)
        FsOps.renameOrThrow(fs, tmp, st.getPath)
      }
    }
  }

  /** Per-file Blooms for every bucket under `stagedDir`, built with a
    * no-UDF distributed aggregation: each row contributes its K bit
    * positions (the codegen'd pmod(xxhash64(key, i), Bits) — the exact
    * expression [[Blooms.positions]] mirrors), positions fold to words
    * via bit_or, and only files × Words rows reach the driver.
    */
  private[io] def buildBlooms(spark: SparkSession, stagedDir: String,
                          pk: Seq[String]): Map[Int, Map[String, Array[Long]]] = {
    val posCols = (0 until Blooms.K).map(i =>
      pmod(xxhash64(keyStr(pk), lit(i)), lit(Blooms.Bits)))
    val rows = spark.read.parquet(stagedDir)
      .select(col(BucketCol).cast("int").as("b"), input_file_name().as("f"),
        explode(array(posCols: _*)).as("p"))
      .select(col("b"), col("f"), (col("p") / 64).cast("int").as("wi"),
        expr("shiftleft(1L, cast(p % 64 as int))").as("bits"))
      .groupBy(col("b"), col("f"), col("wi"))
      .agg(expr("bit_or(bits)").as("w"))
      .collect()
    rows.groupBy(_.getInt(0)).map { case (b, rs) =>
      b -> rs.groupBy(r => r.getString(1).substring(r.getString(1).lastIndexOf('/') + 1))
        .map { case (name, frs) =>
          val words = new Array[Long](Blooms.Words)
          frs.foreach(r => words(r.getInt(2)) = r.getLong(3))
          name -> words
        }
    }
  }

  /** Merge `updates` into the bucketed parquet table at `dir`.
    *  - rows with type='delete' remove their key;
    *  - otherwise newest `versionCol` per `pk` wins (ties: updates win).
    * Only the buckets present in `updates` are read and rewritten.
    *
    * With `changeLog=true` each merge also appends a retract-encoded
    * change batch under `<dir>_changes/batch=K/` (see [[ChangeFeed]]):
    * the PRE-image of every key the batch touched as `__change=retract`
    * rows and the surviving POST-image as `__change=add` rows — the
    * parquet equivalent of the reference's upsert-kafka retract stream
    * (SQLUtil.getUpsertKafkaSQL:46-54), which is what lets DWS
    * aggregates refresh incrementally instead of re-reading the table.
    */
  def merge(spark: SparkSession, dir: String, updates: DataFrame,
            pk: Seq[String], versionCol: String,
            deleteFlagCol: Option[String] = None,
            numBuckets: Int = DefaultNumBuckets,
            changeLog: Boolean = false,
            commitId: Option[String] = None,
            bloom: Boolean = false,
            maxPointKeys: Int = 1024): Unit = {
    val tagged = withBucket(updates, pk, numBuckets).withColumn("__src", lit(1))
    val bloomPk = if (bloom) Some(pk) else None
    if (!exists(spark, dir)) {
      // first write: full table create via staging-dir rename
      val merged = resolve(tagged, pk, versionCol, deleteFlagCol)
      val cached = if (changeLog) merged.cache() else merged
      writeBucketsAtomic(spark, dir, cached, touched = None, bloomPk = bloomPk)
      if (changeLog) {
        ChangeFeed.append(spark, dir,
          cached.drop(BucketCol).withColumn(ChangeFeed.ChangeCol, lit("add")),
          commitId)
        cached.unpersist()
      }
      return
    }
    recoverSwaps(spark, dir) // current state must be complete before we read it
    // buckets this batch touches — bounded by numBuckets, so the
    // driver-side collect is O(numBuckets), never O(rows)
    val touched = tagged.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return
    // Bloom file pruning (VERDICT r2 #7): for a POINT batch (≤
    // maxPointKeys distinct keys) against sidecar-carrying buckets,
    // read only the files that might hold a batch key; every other
    // file is carried into the new bucket by a metadata rename — a
    // point merge reads files, not whole buckets.
    val pointKeys: Option[Seq[String]] =
      if (!bloom) None
      else {
        val ks = tagged.select(keyStr(pk).as("k")).distinct()
          .limit(maxPointKeys + 1)
          .collect().map(_.getString(0)).toSeq
        if (ks.size > maxPointKeys) None else Some(ks)
      }
    val pruned: Option[(Seq[String], Map[Int, Seq[String]])] =
      pointKeys.flatMap { keys =>
        val perBucket = touched.toSeq.map(b =>
          bloomCandidates(spark, dir, b, keys).map(b -> _))
        if (perBucket.exists(_.isEmpty)) None // some bucket lacks a sidecar
        else {
          val m = perBucket.flatten.toMap
          Some((
            m.toSeq.flatMap { case (b, (cand, _)) =>
              cand.map(f => s"$dir/$BucketCol=$b/$f") },
            m.map { case (b, (_, keep)) => b -> keep }))
        }
      }
    val cur = (pruned match {
      case Some((candPaths, _)) if candPaths.nonEmpty =>
        spark.read.option("basePath", dir).parquet(candPaths: _*)
      case Some(_) => // zero candidate files: schema-only empty current
        spark.read.parquet(dir).filter(lit(false))
      case None =>
        spark.read.parquet(dir)
          .filter(col(BucketCol).isin(touched.toSeq: _*)) // partition-pruned scan
    }).withColumn("__src", lit(0))
    val preserve = pruned.map(_._2).getOrElse(Map.empty)
    val aligned = tagged.select(cur.columns.toIndexedSeq.map(col): _*)
    val merged = resolve(cur.unionByName(aligned), pk, versionCol, deleteFlagCol)
    if (!changeLog) {
      writeBucketsAtomic(spark, dir, merged, touched = Some(touched),
        preserve = preserve, bloomPk = bloomPk)
    } else {
      val cached = merged.cache()
      // pre/post-images restricted to the keys this batch carried —
      // both sides are bounded by the batch, never by the table. The
      // feed commits BEFORE the bucket swap: it reads the pre-image
      // from the files the swap is about to replace. A crash between
      // the two steps, or a replayed foreachBatch re-calling merge, is
      // handled by `commitId`: the feed append dedupes on it (no double
      // delta), and re-merging the same updates into the table is
      // naturally idempotent (same keys, same versions, updates win
      // ties), so replay converges to the same table + feed state.
      val keys = tagged.select(pk.map(col): _*).distinct()
      val pre = cur.drop(BucketCol, "__src")
        .join(keys, pk, "left_semi")
        .withColumn(ChangeFeed.ChangeCol, lit("retract"))
      val post = cached.drop(BucketCol)
        .join(keys, pk, "left_semi")
        .withColumn(ChangeFeed.ChangeCol, lit("add"))
      ChangeFeed.append(spark, dir, pre.unionByName(post), commitId)
      writeBucketsAtomic(spark, dir, cached, touched = Some(touched),
        preserve = preserve, bloomPk = bloomPk)
      cached.unpersist()
    }
  }

  /** Last-writer-wins + delete resolution over a `__src`-tagged union. */
  private def resolve(combined: DataFrame, pk: Seq[String], versionCol: String,
                      deleteFlagCol: Option[String]): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    val merged0 = combined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
    deleteFlagCol match {
      case Some(f) => merged0.filter(col(f) =!= "delete" || col(f).isNull)
      case None => merged0
    }
  }

  /** Stage `merged` (which carries `__bucket`) under `<dir>.tmp`
    * partitioned by bucket, then swap bucket directories into place.
    * touched=None swaps the whole table (initial create); Some(set)
    * swaps exactly those buckets — the rest of the table is untouched
    * on disk.
    *
    * `preserve` (bucket → file names) lists files of touched buckets
    * that a bloom-pruned merge proved key-disjoint from the batch:
    * they move into the staged bucket with a filesystem rename (no
    * read, no rewrite) before the swap. `bloomPk` (when set) writes a
    * per-file Bloom sidecar into every staged bucket — new files get
    * freshly built blooms, preserved files keep their existing entries
    * — committing with the same bucket rename.
    */
  private def writeBucketsAtomic(spark: SparkSession, dir: String,
                                 merged: DataFrame, touched: Option[Set[Int]],
                                 preserve: Map[Int, Seq[String]] = Map.empty,
                                 bloomPk: Option[Seq[String]] = None): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(dir)
    val tmp = new Path(dir + ".tmp")
    val fs = target.getFileSystem(conf)
    recoverSwaps(spark, dir) // an interrupted swap still owns files under tmp
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merged.write.mode("overwrite").partitionBy(BucketCol).parquet(tmp.toString)
    // an all-deleted batch stages no bucket dirs at all — nothing to bloom
    val stagedBuckets = fs.listStatus(tmp)
      .exists(_.getPath.getName.startsWith(s"$BucketCol="))
    val newBlooms: Map[Int, Map[String, Array[Long]]] =
      if (stagedBuckets)
        bloomPk.map(pk => buildBlooms(spark, tmp.toString, pk)).getOrElse(Map.empty)
      else Map.empty
    touched match {
      case None =>
        bloomPk.foreach { _ =>
          newBlooms.foreach { case (b, entries) =>
            Blooms.write(fs, new Path(tmp, s"$BucketCol=$b"), entries)
          }
        }
        if (fs.exists(target)) fs.delete(target, true)
        FsOps.renameOrThrow(fs, tmp, target)
      case Some(buckets) =>
        buckets.foreach { b =>
          val oldB = new Path(target, s"$BucketCol=$b")
          val newB = new Path(tmp, s"$BucketCol=$b")
          val kept = preserve.getOrElse(b, Seq.empty)
          if (kept.nonEmpty && !fs.exists(newB)) fs.mkdirs(newB)
          // carry over the preserved files' existing bloom entries
          val keptBlooms: Map[String, Array[Long]] =
            if (bloomPk.isEmpty || kept.isEmpty) Map.empty
            else Blooms.read(fs, oldB).map(_.filter(e => kept.contains(e._1)))
              .getOrElse(Map.empty)
          if (bloomPk.isDefined && fs.exists(newB))
            Blooms.write(fs, newB, newBlooms.getOrElse(b, Map.empty) ++ keptBlooms)
          // COMMIT POINT: once the marker (listing the preserved file
          // names) is durable, the rest of the swap — move kept files,
          // drop the old bucket, rename the staged one in — is
          // deterministic and idempotent; a crash anywhere after this
          // line is finished by recoverSwaps from any entry point.
          FsOps.writeTextAtomic(spark, markerPath(dir, b), kept.mkString("\n"))
          finishBucketSwap(spark, dir, b)
        }
        fs.delete(tmp, true)
        // keep the table readable if every bucket emptied out: leave a
        // zero-row file carrying the schema
        val status = fs.listStatus(target)
        if (!status.exists(_.getPath.getName.startsWith(s"$BucketCol="))) {
          merged.drop(BucketCol).limit(0).coalesce(1)
            .write.mode("overwrite").parquet(new Path(target, s"$BucketCol=-1").toString)
        }
    }
  }

  /** Write df to `<dir>.tmp` then swap directories (readers of the old
    * data finish against already-open files; new readers see the new
    * version — the poor man's snapshot isolation). Used for
    * non-keyed/full-refresh tables; keyed merges go through `merge`.
    *
    * `extraFiles` (name → content) are staged INSIDE the table dir
    * before the swap, so table data and metadata (e.g. an applied-
    * watermark file) commit in the same rename — name them with a
    * leading underscore so parquet readers ignore them.
    */
  def overwriteAtomic(spark: SparkSession, dir: String, df: DataFrame,
                      extraFiles: Map[String, String] = Map.empty): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(dir)
    val tmp = new Path(dir + ".tmp")
    val fs = target.getFileSystem(conf)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    extraFiles.foreach { case (name, content) =>
      val out = fs.create(new Path(tmp, name), true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    if (fs.exists(target)) fs.delete(target, true)
    FsOps.renameOrThrow(fs, tmp, target)
  }
}
