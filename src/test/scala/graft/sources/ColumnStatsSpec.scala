package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Upsert

/** Column-level statistics to the CBO: under `spark.sql.cbo.enabled`
  * the DSv2 scan reports exact min/max (numeric/date/timestamp zone
  * columns) and exact null counts from the same sidecars that drive
  * pruning — Spark's transformV2Stats lands them in the logical plan's
  * attributeStats, where join reordering and filter estimation read
  * them. With CBO off the scan reports no column stats and pays no
  * sidecar I/O at planning time.
  */
class ColumnStatsSpec extends SparkSpec {

  private def attrStats(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.stats.attributeStats.toSeq
      .map { case (a, s) => a.name -> s }.toMap

  private def withCbo[T](on: Boolean)(body: => T): T = {
    val k = "spark.sql.cbo.enabled"
    val old = spark.conf.getOption(k)
    spark.conf.set(k, on.toString)
    try body
    finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  private lazy val table: String = {
    val dir = Files.createTempDirectory("colstats").toString
    val df = spark.range(2000).select(col("id"),
      when(col("id") % 8 =!= 0, col("id") * 2 - 100).as("v"),
      concat(lit("s"), col("id")).as("s"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("v", "s"), clusterBy = Seq("id"), filesTarget = 4)
    dir
  }

  test("CBO on: exact min/max and null counts reach attributeStats") {
    withCbo(on = true) {
      val st = attrStats(UpsertBucketSource.read(spark, table).select("v", "s"))
      val v = st.getOrElse("v", fail(s"no stats for v in $st"))
      // id=0 is null (0 % 8 == 0), so the true min is id=1 -> -98
      assert(v.min.contains(-98L) && v.max.contains(3898L), v)
      assert(v.nullCount.map(_.toLong).contains(250L), v)
      // strings: null count yes, bounds never (catalyst ColumnStat
      // carries no string min/max)
      val s = st.getOrElse("s", fail(s"no stats for s in $st"))
      assert(s.min.isEmpty && s.max.isEmpty &&
        s.nullCount.map(_.toLong).contains(0L), s)
      // row count rides along (manifest footer counts)
      val rc = UpsertBucketSource.read(spark, table)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(rc.map(_.toLong).contains(2000L), rc)
    }
  }

  test("a zone column missing from some files' sidecars reports NOTHING") {
    // merge 1 records zones on v; merge 2 adds zone column w but only
    // rewrites the touched buckets — untouched buckets' sidecar
    // entries have no w key, so a fold over them would be an
    // under-covering bound presented as exact. The scan must report
    // no stats at all for w (neither bounds nor null count).
    val dir = Files.createTempDirectory("colstats_part").toString
    import spark.implicits._
    Upsert.merge(spark, dir, spark.range(800).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      col("id").as("v")), pk = Seq("k"), versionCol = "ver",
      numBuckets = 8, zoneCols = Seq("v"))
    Upsert.merge(spark, dir, Seq(("k3", 2L, 3L, 99L))
      .toDF("k", "ver", "v", "w"), pk = Seq("k"), versionCol = "ver",
      numBuckets = 8, zoneCols = Seq("v", "w"))
    withCbo(on = true) {
      val st = attrStats(UpsertBucketSource.read(spark, dir).select("v", "w"))
      assert(!st.contains("w"), st)
      // v is covered by every file (both merges recorded it) — stays
      val v = st.getOrElse("v", fail(s"no stats for v in $st"))
      assert(v.min.contains(0L) && v.max.contains(799L), v)
    }
  }

  test("single-column PK reports an exact distinct count (LWW: one live row per key)") {
    val dir = Files.createTempDirectory("colstats_pk").toString
    import spark.implicits._
    Upsert.merge(spark, dir, spark.range(600).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      col("id").as("v")), pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    // a correcting merge must not double-count: still 600 live keys
    Upsert.merge(spark, dir, Seq(("k5", 2L, 55L)).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    withCbo(on = true) {
      val st = attrStats(UpsertBucketSource.read(spark, dir).select("k", "v"))
      val k = st.getOrElse("k", fail(s"no stats for k in $st"))
      assert(k.distinctCount.map(_.toLong).contains(600L), k)
      assert(k.nullCount.map(_.toLong).contains(0L), k)
      assert(!st.contains("v"), st) // no zones on this table
    }
  }

  test("ndv: Σ per-file only when zone ranges are value-disjoint, else max per-file") {
    // the clustered fixture's files hold DISJOINT id-ranges of v, so
    // the per-file HLL estimates may sum: table-wide ndv ~1750 (2000
    // rows, 250 nulls), far above any single file's ~440 — proves the
    // Σ path engaged
    withCbo(on = true) {
      val st = attrStats(UpsertBucketSource.read(spark, table).select("v"))
      val v = st.getOrElse("v", fail(s"no stats for v in $st"))
      val d = v.distinctCount.map(_.toLong).getOrElse(fail(s"no ndv: $v"))
      assert(d > 1000L && d <= 1750L, s"expected ~1750 (Σ of disjoint files), got $d")
    }
    // a LOW-CARDINALITY column interleaved across files (every file
    // holds all 5 values -> overlapping ranges): Σ would report
    // 5 × files, driving equality selectivity far too low (ADVICE
    // r10) — the fold must fall back to max per-file ndv ≈ 5
    val dir = Files.createTempDirectory("colstats_lowcard").toString
    Upsert.overwriteSnapshot(spark, dir,
      spark.range(2000).select(col("id"), (col("id") % 5).as("t")),
      zoneCols = Seq("t"), clusterBy = Seq("id"), filesTarget = 8)
    withCbo(on = true) {
      val st = attrStats(UpsertBucketSource.read(spark, dir).select("t"))
      val t = st.getOrElse("t", fail(s"no stats for t in $st"))
      val d = t.distinctCount.map(_.toLong).getOrElse(fail(s"no ndv: $t"))
      assert(d <= 6L, s"expected ~5 (max per-file over interleaved files), got $d")
    }
  }

  test("CBO off: no column stats reported, planning unaffected") {
    withCbo(on = false) {
      val st = attrStats(UpsertBucketSource.read(spark, table).select("v"))
      assert(st.isEmpty, st)
    }
  }
}
