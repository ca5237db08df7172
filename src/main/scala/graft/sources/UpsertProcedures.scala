package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.io.{Maintenance, Upsert}

/** SQL `CALL` surface for table maintenance — the operational half of
  * the lakehouse layer, reachable from pure SQL the way Iceberg's
  * `CALL catalog.system.*` procedures are:
  *
  * {{{
  *   CALL graft.history(table => '/data/warehouse/orders')
  *   CALL graft.stats('/data/warehouse/orders')
  *   CALL graft.compact('/data/warehouse/orders')
  *   CALL graft.vacuum('/data/warehouse/orders', keep_manifests => 2)
  *   CALL graft.rebucket('/data/warehouse/orders', num_buckets => 64)
  *   CALL graft.maintain('/data/warehouse/orders')   -- full policy pass
  * }}}
  *
  * Every procedure takes the table PATH only — the merge contract
  * (placement pk, version column) comes from the table's own manifest,
  * so SQL callers cannot contradict it. Mutating procedures return the
  * actions taken (empty result = healthy table, zero Spark jobs);
  * read-only ones ([[Upsert.history]], [[Upsert.stats]]) return the
  * metadata rows. All of them delegate to the exact API entry points
  * the spec suite pins — the procedure layer adds argument binding and
  * a result relation, never new semantics.
  *
  * Reference equivalence: the reference operates its warehouse with
  * out-of-band scripts against Doris/HBase admin APIs; here the
  * operational surface is IN the query language, transactional under
  * the same writer lease as every other write.
  */
private[sources] object UpsertProcedures {

  private def spark: SparkSession = SparkSession.active

  /** Recorded contract of `dir` — procedures never accept pk/version
    * arguments, the manifest is authoritative.
    */
  private def contract(dir: String): (Seq[String], Option[String]) = {
    val man = Upsert.currentManifest(spark, dir).getOrElse(
      throw new Upsert.NoTableException(s"no committed manifest under $dir"))
    (man.props.get(Upsert.PkColsProp).map(_.split(",").toSeq).getOrElse(Nil),
      man.props.get(Upsert.VersionColProp))
  }

  /** Mutating procedures on a MISSING table must fail loudly, exactly
    * like the read-only ones — "freed 0 files" on a typo'd path reads
    * as a healthy real table.
    */
  private def requireTable(dir: String): Unit =
    if (Upsert.currentManifest(spark, dir).isEmpty)
      throw new Upsert.NoTableException(s"no committed manifest under $dir")

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def result(schema: StructType, out: Seq[InternalRow]): util.Iterator[Scan] = {
    val arr = out.toArray
    util.List.of[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = arr
    }).iterator()
  }

  private val actionSchema = new StructType().add("action", StringType)

  private def actionsResult(actions: Seq[String]): util.Iterator[Scan] =
    result(actionSchema, actions.map(a => InternalRow(utf8(a))))

  /** One procedure = name, parameters, and the call body. */
  private final case class Proc(procName: String, procDescription: String,
                                params: Seq[ProcedureParameter],
                                body: InternalRow => util.Iterator[Scan])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false // reads/mutates table state
    override def call(input: InternalRow): util.Iterator[Scan] = body(input)
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private val procs: Map[String, Proc] = Seq(
    Proc("history",
      "commit history (DESCRIBE HISTORY equivalent): manifest generations (Upsert) or delta batches + compactions (merge-on-read)",
      Seq(in("table", StringType)),
      { input =>
        val dir = input.getString(0).stripSuffix("/")
        // STRUCTURAL layout probe (recorded contract / committed base
        // manifest / committed delta batch) — a child merely NAMED
        // base/delta must not reroute a real Upsert table's history
        val df =
          if (graft.io.MergeOnRead.isMorRoot(spark, dir))
            graft.io.MergeOnRead.history(spark, dir)
          else Upsert.history(spark, dir)
        result(df.schema, df.queryExecution.executedPlan.executeCollect().toSeq)
      }),

    Proc("stats",
      "storage stats: live/reclaimable files and bytes, sidecar coverage (Upsert) or base + delta backlog (merge-on-read)",
      Seq(in("table", StringType)),
      { input =>
        val dir = input.getString(0).stripSuffix("/")
        if (graft.io.MergeOnRead.isMorRoot(spark, dir)) {
          val m = graft.io.MergeOnRead.stats(spark, dir)
          result(new StructType()
            .add("base_generation", LongType).add("base_files", LongType)
            .add("base_bytes", LongType).add("compacted_upto", LongType)
            .add("live_delta_batches", IntegerType)
            .add("live_delta_bytes", LongType),
            Seq(InternalRow(m.base.map(_.gen).getOrElse(-1L),
              m.base.map(_.liveFiles).getOrElse(0L),
              m.base.map(_.liveBytes).getOrElse(0L),
              m.compactedUpto, m.liveDeltaBatches, m.liveDeltaBytes)))
        } else {
          val s = Upsert.stats(spark, dir).getOrElse(
            throw new Upsert.NoTableException(s"no committed manifest under $dir"))
          // live_rows: sum of the manifest's per-file footer counts —
          // null unless EVERY live file carries one; computed by
          // stats() from the SAME manifest the other fields report
          val liveRows: Any = s.liveRows.map(Long.box).orNull
          result(new StructType()
            .add("generation", LongType).add("snapshots_retained", IntegerType)
            .add("num_buckets", IntegerType)
            .add("live_files", LongType).add("live_bytes", LongType)
            .add("live_rows", LongType)
            .add("reclaimable_files", LongType).add("reclaimable_bytes", LongType)
            .add("bloom_buckets", IntegerType).add("zone_buckets", IntegerType),
            Seq(InternalRow(s.gen, s.snapshotsRetained, s.numBuckets,
              s.liveFiles, s.liveBytes, liveRows,
              s.reclaimableFiles, s.reclaimableBytes,
              s.bloomBuckets, s.zoneBuckets)))
        }
      }),

    Proc("compact",
      "fold buckets over max_files_per_bucket files into one file each; " +
        "cluster_by re-sorts rows within buckets and writes zone sidecars " +
        "(the OPTIMIZE ZORDER analog)",
      Seq(in("table", StringType),
        inDefault("max_files_per_bucket", IntegerType, "8"),
        inDefault("cluster_by", StringType, "''"),
        inDefault("files_per_bucket", IntegerType, "1")),
      { input =>
        val dir = input.getString(0)
        val (pk, _) = contract(dir)
        require(pk.nonEmpty, s"$dir records no placement pk — not a merge table")
        val clusterBy = Option(input.getString(2)).filter(_.nonEmpty)
          .map(_.split(",").toSeq).getOrElse(Nil)
        val before = Upsert.currentManifest(spark, dir).map(
          _.files.count { case (b, fs) => b >= 0 && fs.size > input.getInt(1) })
          .getOrElse(0)
        Upsert.compactBuckets(spark, dir, pk,
          maxFilesPerBucket = input.getInt(1),
          clusterBy = clusterBy,
          filesPerBucket = input.getInt(3))
        actionsResult(
          if (before == 0) Nil
          else Seq(s"compacted $before buckets over ${input.getInt(1)} files" +
            (if (clusterBy.nonEmpty)
              s", clustered by ${clusterBy.mkString(",")}" else "")))
      }),

    Proc("vacuum",
      "drop superseded MVCC generations, keeping the newest keep_manifests snapshots",
      Seq(in("table", StringType),
        inDefault("keep_manifests", IntegerType, "2")),
      { input =>
        val dir = input.getString(0)
        requireTable(dir)
        val keep = input.getInt(1)
        val (files, bytes) = Upsert.freeableBy(spark, dir, keep)
        Upsert.vacuum(spark, dir, keep)
        actionsResult(Seq(s"freed $files files ($bytes B), kept $keep manifests"))
      }),

    Proc("expire_snapshots",
      "drop MVCC generations committed before older_than, keeping the newest keep_last",
      Seq(in("table", StringType),
        in("older_than", org.apache.spark.sql.types.TimestampType),
        inDefault("keep_last", IntegerType, "2")),
      { input =>
        val dir = input.getString(0)
        val cutoffMs = Math.floorDiv(input.getLong(1), 1000L) // micros -> ms
        val kept = Upsert.expireSnapshots(spark, dir, cutoffMs, input.getInt(2))
        actionsResult(Seq(s"retained $kept generations at-or-after cutoff"))
      }),

    Proc("rebucket",
      "re-place the table under num_buckets buckets (converging hot-bucket fix)",
      Seq(in("table", StringType), in("num_buckets", IntegerType)),
      { input =>
        val dir = input.getString(0)
        val n = input.getInt(1)
        Upsert.rebucket(spark, dir, n)
        actionsResult(Seq(s"rebucketed to $n buckets"))
      }),

    Proc("maintain",
      "full policy pass: compact / rebucket / vacuum (Upsert) or delta-fold (merge-on-read) as table health requires; sort_base=false skips the pk-sorted staging of MOR folds",
      Seq(in("table", StringType),
        inDefault("max_bucket_bytes", LongType, "0"),
        inDefault("sort_base", BooleanType, "true")),
      { input =>
        val dir = input.getString(0).stripSuffix("/")
        val policy = Maintenance.Policy(maxBucketBytes = input.getLong(1))
        val isMor = graft.io.MergeOnRead.isMorRoot(spark, dir)
        val actions =
          if (isMor) {
            // MOR roots carry their contract in _contract (recorded by
            // the first compact); a policy pass that knows only the
            // path binds to it — or refuses until one exists
            val (pk, vc, del, n) = graft.io.MergeOnRead.contract(spark, dir)
              .getOrElse(throw new Upsert.NoTableException(
                s"$dir is a merge-on-read table with no recorded contract — " +
                  "run one MergeOnRead.compact (or recordContract) first"))
            Maintenance.runMor(spark, dir, pk, vc, del, n, policy = policy,
              sortBase = input.getBoolean(2))
          } else {
            val (pk, versionCol) = contract(dir)
            require(pk.nonEmpty,
              s"$dir records no placement pk — not a merge table")
            Maintenance.run(spark, dir, pk, versionCol.getOrElse(""),
              policy = policy)
          }
        actionsResult(actions)
      })
  ).map(p => p.procName -> p).toMap

  def load(ident: Identifier): Option[UnboundProcedure] =
    if (ident.namespace().nonEmpty) None else procs.get(ident.name())

  def list: Array[Identifier] =
    procs.keys.toArray.sorted.map(n => Identifier.of(Array.empty, n))
}
