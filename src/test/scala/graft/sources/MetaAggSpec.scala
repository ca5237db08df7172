package graft.sources

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Upsert

/** Metadata-only aggregates (DSv2 complete pushdown): a bare
  * `count(*)` answers from the manifest's per-file footer counts and
  * `min`/`max` of a zone column from the zone sidecars — a driver
  * LocalScan, zero tasks, zero file opens. Anything the metadata
  * cannot answer EXACTLY (filters, grouping, uncounted files,
  * non-zone columns) falls back to the real scan. Ground truths here
  * deliberately go through `Upsert.read` (the plain parquet path) so
  * the check can never be circular.
  */
class MetaAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogReady: Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[UpsertCatalog].getName)

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def mkMergeTable(n: Int): String = {
    val dir = Files.createTempDirectory("meta_cnt").toString
    Upsert.merge(spark, dir, spark.range(n).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      col("id").as("v")), pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    dir
  }

  test("count(*) answers from the manifest: LocalScan, zero file reads, exact") {
    catalogReady
    val dir = mkMergeTable(1234)
    // an update merge (rewrites one bucket) keeps counts exact
    Upsert.merge(spark, dir, Seq(("k7", 2L, 777L), ("kN", 1L, 1L))
      .toDF("k", "ver", "v"), pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    val truth = Upsert.read(spark, dir).count() // plain path, never pushed
    assert(truth == 1235L)
    val df = UpsertBucketSource.read(spark, dir).agg(count(lit(1)).as("c"))
    assert(plan(df).contains("LocalTableScan") &&
      !plan(df).contains("UpsertBucketScan"), s"expected metadata answer:\n${plan(df)}")
    assert(df.as[Long].head() == truth)
    // same through pure SQL via the catalog
    val sql = spark.sql(s"SELECT count(*) AS c FROM graft.`$dir`")
    assert(plan(sql).contains("LocalTableScan"), plan(sql))
    assert(sql.as[Long].head() == truth)
  }

  test("GROUP BY __bucket count(*) answers from the manifest: per-bucket health with zero tasks") {
    val dir = mkMergeTable(2000)
    val q = UpsertBucketSource.read(spark, dir)
      .groupBy(col("__bucket")).agg(count(lit(1)).as("c"))
    assert(plan(q).contains("LocalTableScan") &&
      !plan(q).contains("UpsertBucketScan"),
      s"expected a metadata answer:\n${plan(q)}")
    val meta = q.as[(Int, Long)].collect().toMap
    // ground truth through the plain parquet path (never pushed)
    val truth = Upsert.read(spark, dir)
      .groupBy(pmod(xxhash64(col("k")), lit(8)).cast("int").as("b"))
      .agg(count(lit(1))).as[(Int, Long)].collect().toMap
    assert(meta == truth, s"meta=$meta truth=$truth")
    assert(meta.values.sum == 2000L)
    // a filter above the group-by must NOT be absorbed: the answer
    // falls back to a real scan and stays exact
    val filtered = UpsertBucketSource.read(spark, dir)
      .filter(col("v") > 100).groupBy(col("__bucket")).count()
    assert(!plan(filtered).contains("LocalTableScan"), plan(filtered))
  }

  test("min/max of zone columns answer from the sidecars, all three kinds") {
    val dir = Files.createTempDirectory("meta_mm").toString
    val df = spark.range(5000).select(
      col("id"),
      date_add(lit("2024-01-01").cast("date"), (col("id") / 100).cast("int")).as("d"),
      concat(lit("s"), lpad(col("id").cast("string"), 5, "0")).as("s"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("id", "d", "s"), clusterBy = Seq("d"), filesTarget = 8)
    val q = UpsertBucketSource.read(spark, dir)
      .agg(min("id").as("mn"), max("id").as("mx"),
        min("d").as("dmn"), max("d").as("dmx"),
        min("s").as("smn"), max("s").as("smx"))
    assert(plan(q).contains("LocalTableScan") &&
      !plan(q).contains("UpsertBucketScan"), s"expected metadata answer:\n${plan(q)}")
    val got = q.as[(Long, Long, Date, Date, String, String)].head()
    val want = Upsert.read(spark, dir)
      .agg(min("id"), max("id"), min("d"), max("d"), min("s"), max("s"))
      .as[(Long, Long, Date, Date, String, String)].head()
    assert(got == want)
    // count(*) and min/max compose in ONE metadata answer
    val mixed = UpsertBucketSource.read(spark, dir)
      .agg(count(lit(1)).as("c"), max("d").as("dmx"))
    assert(plan(mixed).contains("LocalTableScan"))
    assert(mixed.as[(Long, Date)].head() == ((5000L, want._4)))
  }

  test("anything inexact falls back to the real scan: filters, grouping, non-zone cols, uncounted files") {
    catalogReady
    val dir = mkMergeTable(400)
    // WHERE -> residual filter blocks the rewrite; result exact
    val filtered = spark.sql(
      s"SELECT count(*) AS c FROM graft.`$dir` WHERE v < 100")
    assert(plan(filtered).contains("UpsertBucketScan"), plan(filtered))
    assert(filtered.as[Long].head() == 100L)
    // GROUP BY -> fallback
    val grouped = UpsertBucketSource.read(spark, dir)
      .groupBy(col("v") % 2).agg(count(lit(1)))
    assert(plan(grouped).contains("UpsertBucketScan"))
    // min/max of a NON-zone column -> fallback, exact
    val mm = UpsertBucketSource.read(spark, dir).agg(min("v").as("mn"))
    assert(plan(mm).contains("UpsertBucketScan"))
    assert(mm.as[Long].head() == 0L)
    // a table committed with counts disabled -> count(*) falls back
    spark.conf.set("spark.graft.rowCounts.maxNewFiles", "0")
    try {
      val bare = mkMergeTable(77)
      val c = UpsertBucketSource.read(spark, bare).agg(count(lit(1)).as("c"))
      assert(plan(c).contains("UpsertBucketScan"), plan(c))
      assert(c.as[Long].head() == 77L)
    } finally spark.conf.unset("spark.graft.rowCounts.maxNewFiles")
  }

  test("empty table: count(*) = 0 straight from the schema-only manifest") {
    val dir = Files.createTempDirectory("meta_empty").toString
    Upsert.createTable(spark, dir,
      new org.apache.spark.sql.types.StructType()
        .add("k", "string").add("ver", "long"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val c = UpsertBucketSource.read(spark, dir).agg(count(lit(1)).as("c"))
    assert(plan(c).contains("LocalTableScan"), plan(c))
    assert(c.as[Long].head() == 0L)
  }

  test("counts stay exact across compaction (rewritten files re-counted)") {
    val dir = mkMergeTable(600)
    // many small generations -> multiple files per bucket, then fold
    (1 to 3).foreach(i => Upsert.merge(spark, dir,
      Seq((s"x$i", 1L, i.toLong)).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8))
    Upsert.compactBuckets(spark, dir, pk = Seq("k"), maxFilesPerBucket = 1)
    val truth = Upsert.read(spark, dir).count()
    assert(truth == 603L)
    val c = UpsertBucketSource.read(spark, dir).agg(count(lit(1)).as("c"))
    assert(plan(c).contains("LocalTableScan"), plan(c))
    assert(c.as[Long].head() == truth)
  }

  test("invalid-UTF-8 strings: lossy zone stats are omitted, min/max falls back exact") {
    val dir = Files.createTempDirectory("meta_utf8").toString
    // not valid UTF-8: survives parquet/UTF8String intact, but the
    // driver-side String conversion in the zone build is lossy — the
    // build detects the mismatch against the raw-bytes min/max and
    // omits the column entry for that file
    val bad = Array[Byte](0x61, 0xFF.toByte, 0x62)
    val df = spark.range(100).select(col("id"),
      when(col("id") === 7, lit(bad).cast("string"))
        .otherwise(concat(lit("ok"), col("id"))).as("s"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("id", "s"), clusterBy = Seq("id"), filesTarget = 4)
    // long zones unaffected: min/max(id) still metadata-answered
    val idMm = UpsertBucketSource.read(spark, dir)
      .agg(min("id").as("mn"), max("id").as("mx"))
    assert(plan(idMm).contains("LocalTableScan"), plan(idMm))
    assert(idMm.as[(Long, Long)].head() == ((0L, 99L)))
    // string min/max must NOT come from the lossy sidecar: real scan,
    // answer identical to the plain read's
    val sMm = UpsertBucketSource.read(spark, dir)
      .agg(min("s").as("mn"), max("s").as("mx"))
    assert(plan(sMm).contains("UpsertBucketScan"), plan(sMm))
    assert(sMm.collect().head.toSeq ==
      Upsert.read(spark, dir).agg(min("s"), max("s")).collect().head.toSeq)
  }

  test("sum and count(col) of zone columns answer from the sidecars") {
    val dir = Files.createTempDirectory("meta_sum").toString
    val df = spark.range(5000).select(
      col("id"),
      when(col("id") % 10 =!= 0, col("id") - 2500).as("v"), // nullable, negatives
      (col("id") % 7).cast("int").as("w")) // int: Spark sums to LongType
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("id", "v", "w"), clusterBy = Seq("id"), filesTarget = 8)
    val q = UpsertBucketSource.read(spark, dir).agg(
      sum("v").as("sv"), count(col("v")).as("cv"),
      sum("w").as("sw"), count(lit(1)).as("c"), max("id").as("mx"))
    assert(plan(q).contains("LocalTableScan") &&
      !plan(q).contains("UpsertBucketScan"), s"expected metadata answer:\n${plan(q)}")
    val want = Upsert.read(spark, dir).agg(
      sum("v"), count(col("v")), sum("w"), count(lit(1)), max("id"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(q.as[(Long, Long, Long, Long, Long)].head() == want)
    // count of a NOT NULL column = count(*): footer counts suffice,
    // no zone entry needed (id is non-nullable in the recorded schema)
    val cnn = UpsertBucketSource.read(spark, dir).agg(count(col("id")).as("c"))
    assert(plan(cnn).contains("LocalTableScan"), plan(cnn))
    assert(cnn.as[Long].head() == 5000L)
  }

  test("avg of integral zone columns answers from the sidecars, bit-exact") {
    val dir = Files.createTempDirectory("meta_avg").toString
    val df = spark.range(3000).select(col("id"),
      when(col("id") % 4 =!= 0, col("id") * 3 - 1000).as("v"),
      (col("id") % 11).cast("short").as("w"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("v", "w"), clusterBy = Seq("id"), filesTarget = 6)
    val q = UpsertBucketSource.read(spark, dir)
      .agg(avg("v").as("av"), avg("w").as("aw"))
    assert(plan(q).contains("LocalTableScan"), plan(q))
    // bit-exact vs the scan: both evaluate exact-Long-sum.toDouble / n
    assert(q.as[(Double, Double)].head() ==
      Upsert.read(spark, dir).agg(avg("v"), avg("w"))
        .as[(Double, Double)].head())
    // all-null avg IS null
    val nl = Files.createTempDirectory("meta_avg_null").toString
    Upsert.overwriteSnapshot(spark, nl,
      spark.range(40).select(col("id"), lit(null).cast("int").as("v")),
      zoneCols = Seq("v"), clusterBy = Seq("id"), filesTarget = 2)
    val qn = UpsertBucketSource.read(spark, nl).agg(avg("v").as("a"))
    assert(plan(qn).contains("LocalTableScan"), plan(qn))
    assert(qn.as[Option[Double]].head().isEmpty)
    // floats and distinct refuse to the scan
    val fl = UpsertBucketSource.read(spark, dir)
      .agg(avg(col("v").cast("double")).as("a"))
    assert(!plan(fl).contains("LocalTableScan"), plan(fl))
  }

  test("sum refusals: floats, non-zone columns, distinct, Long overflow") {
    val dir = Files.createTempDirectory("meta_sum_no").toString
    val df = spark.range(100).select(col("id"),
      (col("id") * 1.5).as("f"), col("id").as("nz"),
      // two files × Long.MaxValue: per-file sums exact in the sidecar,
      // the metadata total exceeds Long range -> refuse, scan decides
      lit(Long.MaxValue).as("big"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("id", "f", "big"), clusterBy = Seq("id"), filesTarget = 4)
    val fSum = UpsertBucketSource.read(spark, dir).agg(sum("f").as("s"))
    assert(plan(fSum).contains("UpsertBucketScan"), plan(fSum))
    assert(fSum.as[Double].head() ==
      Upsert.read(spark, dir).agg(sum("f")).as[Double].head())
    val nzSum = UpsertBucketSource.read(spark, dir).agg(sum("nz").as("s"))
    assert(plan(nzSum).contains("UpsertBucketScan"), plan(nzSum))
    assert(nzSum.as[Long].head() == 4950L)
    val dSum = UpsertBucketSource.read(spark, dir)
      .agg(sum_distinct(col("id")).as("s"))
    assert(plan(dSum).contains("UpsertBucketScan"), plan(dSum))
    assert(dSum.as[Long].head() == 4950L)
    val over = UpsertBucketSource.read(spark, dir).agg(sum("big").as("s"))
    assert(plan(over).contains("UpsertBucketScan"), plan(over))
  }

  test("all-null and empty tables: sum is null, count(col) is 0") {
    val dir = Files.createTempDirectory("meta_sum_null").toString
    val df = spark.range(50).select(col("id"),
      lit(null).cast("long").as("v"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("v"), clusterBy = Seq("id"), filesTarget = 2)
    val q = UpsertBucketSource.read(spark, dir)
      .agg(sum("v").as("s"), count(col("v")).as("c"))
    assert(plan(q).contains("LocalTableScan"), plan(q))
    assert(q.as[(Option[Long], Long)].head() == ((None, 0L)))
    val empty = Files.createTempDirectory("meta_sum_empty").toString
    Upsert.createTable(spark, empty,
      new org.apache.spark.sql.types.StructType()
        .add("k", "string").add("ver", "long").add("v", "long"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 2)
    val e = UpsertBucketSource.read(spark, empty)
      .agg(sum("v").as("s"), count(col("v")).as("c"))
    assert(plan(e).contains("LocalTableScan"), plan(e))
    assert(e.as[(Option[Long], Long)].head() == ((None, 0L)))
  }

  test("pre-count sidecars: min/max still answer, sum/count(col) fall back") {
    val dir = Files.createTempDirectory("meta_sum_old").toString
    val df = spark.range(300).select(col("id"),
      when(col("id") % 3 =!= 0, col("id")).as("v"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("v"), clusterBy = Seq("id"), filesTarget = 4)
    // simulate an old-format table: the v2/v3 sidecars never existed,
    // only the original 4-field file — min/max survive from it, the
    // count/sum fields are unknown. (The writer emits ALL THREE files;
    // the v1 one IS the old format, so deleting v2+v3 is the exact
    // simulation — and doubles as the round-trip check on the writes.)
    import scala.jdk.CollectionConverters._
    val fs = graft.io.FsOps.fs(spark, new org.apache.hadoop.fs.Path(dir))
    val newer = Set(graft.io.Zones.SidecarNameV2, graft.io.Zones.SidecarNameV3)
    val v23 = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
      .asScala.filter(p => newer.contains(p.getFileName.toString))
      .toSeq
    assert(v23.map(_.getFileName.toString).toSet == newer,
      "expected v2 AND v3 sidecars to exist")
    v23.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p.toString), false))
    val mm = UpsertBucketSource.read(spark, dir)
      .agg(min("v").as("mn"), max("v").as("mx"))
    assert(plan(mm).contains("LocalTableScan"), plan(mm))
    assert(mm.as[(Long, Long)].head() == ((1L, 299L)))
    val s = UpsertBucketSource.read(spark, dir)
      .agg(sum("v").as("s"), count(col("v")).as("c"))
    assert(plan(s).contains("UpsertBucketScan"), plan(s))
    assert(s.as[(Long, Long)].head() ==
      Upsert.read(spark, dir).agg(sum("v"), count(col("v")))
        .as[(Long, Long)].head())
  }

  test("fold-safety bounds: plan-dependent answers refuse to push") {
    // sum: the exact total fits Long, but an intermediate accumulation
    // could overflow (values near Long.Max with a cancelling negative)
    // -> the metadata path must refuse and let the scan decide
    val dir = Files.createTempDirectory("meta_foldsafe").toString
    val big = Long.MaxValue / 2 + 10
    // nonNull × max|v| = 4×big > Long.MaxValue -> the bound refuses,
    // even though these particular values can never overflow in any
    // accumulation order (one ±big pair) — conservatism is the point:
    // the bound cannot know the partials cancel
    val df = spark.createDataFrame(Seq(
      (1L, big), (2L, -big), (3L, 5L), (4L, 7L))).toDF("id", "v")
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("v"), clusterBy = Seq("id"), filesTarget = 2)
    val s = UpsertBucketSource.read(spark, dir).agg(sum("v").as("s"))
    assert(plan(s).contains("UpsertBucketScan"), plan(s))
    assert(s.as[Long].head() == 12L)
    // avg: totals past 2^53 round order-sensitively in the scan's
    // double accumulation -> refuse; small tables answer
    val a = UpsertBucketSource.read(spark, dir).agg(avg("v").as("a"))
    assert(plan(a).contains("UpsertBucketScan"), plan(a))
    val small = Files.createTempDirectory("meta_foldsafe_ok").toString
    Upsert.overwriteSnapshot(spark, small,
      spark.range(1000).select(col("id"), (col("id") - 500).as("v")),
      zoneCols = Seq("v"), clusterBy = Seq("id"), filesTarget = 2)
    val ok = UpsertBucketSource.read(spark, small)
      .agg(sum("v").as("s"), avg("v").as("a"))
    assert(plan(ok).contains("LocalTableScan"), plan(ok))
    assert(ok.as[(Long, Double)].head() ==
      Upsert.read(spark, small).agg(sum("v"), avg("v"))
        .as[(Long, Double)].head())
  }

  /** Range-aligned layout for the contained-filter pushdown: files =
    * whole id-ranges of width `w` (an explicit partitioner, preserved
    * by overwriteSnapshot's clusterBy=Nil passthrough).
    */
  private def mkRanged(n: Int, w: Long): String = {
    val dir = Files.createTempDirectory("meta_rng").toString
    val base = spark.range(n).select(col("id"), (col("id") * 3).as("v"),
      concat(lit("t"), (col("id") % 5).cast("string")).as("tag"))
    val parts = ((n - 1) / w).toInt + 1
    val rdd = base.rdd.map(r => ((r.getLong(0) / w).toInt, r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = parts
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      }).values
    Upsert.overwriteSnapshot(spark, dir,
      spark.createDataFrame(rdd, base.schema),
      zoneCols = Seq("id", "v", "tag"))
    dir
  }

  test("contained range filter: aggregates still answer from metadata, zero tasks") {
    catalogReady
    val dir = mkRanged(4000, 500)
    // [500, 3000): kept files fully inside, dropped files fully outside
    val df = UpsertBucketSource.read(spark, dir)
      .filter(col("id") >= 500 && col("id") < 3000)
      .agg(count(lit(1)).as("c"), sum("v").as("s"),
        min("id").as("mn"), max("id").as("mx"), count("tag").as("ct"))
    assert(plan(df).contains("LocalTableScan") &&
      !plan(df).contains("UpsertBucketScan"),
      s"contained filter must still answer from metadata:\n${plan(df)}")
    val truth = Upsert.read(spark, dir)
      .filter(col("id") >= 500 && col("id") < 3000)
      .agg(count(lit(1)), sum("v"), min("id"), max("id"), count("tag"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(df.as[(Long, Long, Long, Long, Long)].head() == truth)
    // boundary-INCLUSIVE forms too (<=, >=, = on a whole-file value set)
    val eqRange = UpsertBucketSource.read(spark, dir)
      .filter(col("id") >= 1000 && col("id") <= 1499)
      .agg(count(lit(1)).as("c"))
    assert(plan(eqRange).contains("LocalTableScan"), plan(eqRange))
    assert(eqRange.as[Long].head() == 500L)
    // a range excluding EVERYTHING: zero-task count of 0
    val none = UpsertBucketSource.read(spark, dir)
      .filter(col("id") >= 100000)
      .agg(count(lit(1)).as("c"))
    assert(plan(none).contains("LocalTableScan"), plan(none))
    assert(none.as[Long].head() == 0L)
  }

  test("contained filter absorbs on plain row reads too: no residual Filter node") {
    catalogReady
    val dir = mkRanged(2000, 500)
    val df = UpsertBucketSource.read(spark, dir)
      .filter(col("id") >= 500 && col("id") < 1500).select("id", "v")
    val p = plan(df)
    assert(!p.contains("Filter ("),
      s"contained predicate must be absorbed by file pruning:\n$p")
    assert(p.contains("contained="), s"plan must pin the keep-set:\n$p")
    assert(df.count() == 1000L)
    assert(df.agg(min("id"), max("id")).as[(Long, Long)].head() == ((500L, 1499L)))
  }

  test("REFUSAL: a partially overlapping file keeps the residual filter and the scan") {
    catalogReady
    val dir = mkRanged(2000, 500)
    // 750 splits file [500,1000) — containment must refuse, zones still
    // prune as a superset, the residual filter restores exactness
    val df = UpsertBucketSource.read(spark, dir)
      .filter(col("id") >= 750 && col("id") < 1500)
      .agg(count(lit(1)).as("c"))
    assert(plan(df).contains("UpsertBucketScan"),
      s"partial overlap must fall back to the scan:\n${plan(df)}")
    assert(df.as[Long].head() == 750L)
    // equality on a multi-valued file: refuse, exact through the scan
    val eq = UpsertBucketSource.read(spark, dir).filter(col("id") === 123)
      .agg(count(lit(1)).as("c"))
    assert(plan(eq).contains("UpsertBucketScan"), plan(eq))
    assert(eq.as[Long].head() == 1L)
    // filters on non-zone shapes (IN / OR) refuse wholesale
    val in = UpsertBucketSource.read(spark, dir)
      .filter(col("id").isin(1L, 2L, 3L)).agg(count(lit(1)).as("c"))
    assert(plan(in).contains("UpsertBucketScan"), plan(in))
    assert(in.as[Long].head() == 3L)
  }

  /** Layout for GROUPED metadata aggregates: one partition (= one
    * file) per distinct group value, via an explicit partitioner.
    */
  private def mkGrouped(n: Int, groups: Int): String = {
    val dir = Files.createTempDirectory("meta_grp").toString
    val base = spark.range(n).select(
      concat(lit("g"), (col("id") % groups).cast("string")).as("tag"),
      col("id"), (col("id") * 2).as("v"))
    val rdd = base.rdd.map(r => ((r.getLong(1) % groups).toInt, r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = groups
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      }).values
    Upsert.overwriteSnapshot(spark, dir,
      spark.createDataFrame(rdd, base.schema),
      zoneCols = Seq("tag", "id", "v"))
    dir
  }

  test("GROUP BY a single-valued-per-file zone column: per-group answers, zero tasks") {
    catalogReady
    val dir = mkGrouped(3000, 5)
    val df = UpsertBucketSource.read(spark, dir)
      .groupBy("tag")
      .agg(count(lit(1)).as("c"), sum("v").as("s"),
        min("id").as("mn"), max("id").as("mx"))
    assert(plan(df).contains("LocalTableScan") &&
      !plan(df).contains("UpsertBucketScan"),
      s"grouped metadata aggregate must plan zero tasks:\n${plan(df)}")
    val truth = Upsert.read(spark, dir).groupBy("tag")
      .agg(count(lit(1)), sum("v"), min("id"), max("id"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = df.as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == truth)
    // avg rides the same per-group machinery
    val df2 = UpsertBucketSource.read(spark, dir)
      .groupBy("tag").agg(avg("v").as("a"))
    assert(plan(df2).contains("LocalTableScan"), plan(df2))
    val truth2 = Upsert.read(spark, dir).groupBy("tag").agg(avg("v"))
      .as[(String, Double)].collect().sortBy(_._1).toSeq
    assert(df2.as[(String, Double)].collect().sortBy(_._1).toSeq == truth2)
  }

  test("GROUP BY composes with a CONTAINED filter: whole groups drop, zero tasks") {
    catalogReady
    // 5 groups, one file each; ids of group g are {g, g+5, g+10, ...}
    val dir = mkGrouped(3000, 5)
    // id >= 600 excludes NOTHING per-group... choose a range that drops
    // whole FILES: group g's file holds ids ≡ g (mod 5) across 0..2999,
    // so a range cannot drop a whole group — instead filter on the
    // group column itself: tag >= 'g3' fully includes files g3/g4 and
    // fully excludes g0/g1/g2
    val df = UpsertBucketSource.read(spark, dir)
      .filter(col("tag") >= "g3")
      .groupBy("tag").agg(count(lit(1)).as("c"), sum("v").as("s"))
    assert(plan(df).contains("LocalTableScan") &&
      !plan(df).contains("UpsertBucketScan"),
      s"contained filter + group-by must stay zero-task:\n${plan(df)}")
    val truth = Upsert.read(spark, dir).filter(col("tag") >= "g3")
      .groupBy("tag").agg(count(lit(1)), sum("v"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(df.as[(String, Long, Long)].collect().sortBy(_._1).toSeq == truth)
  }

  test("GROUP BY refusals: multi-valued files, null groups, non-zone columns") {
    catalogReady
    // tag values INTERLEAVED across files -> every file multi-valued
    val dir = Files.createTempDirectory("meta_grp_ref").toString
    Upsert.overwriteSnapshot(spark, dir,
      spark.range(2000).select(
        concat(lit("g"), (col("id") % 3).cast("string")).as("tag"),
        col("id"), (col("id") * 2).as("v")),
      zoneCols = Seq("tag", "id", "v"), clusterBy = Seq("id"), filesTarget = 4)
    val multi = UpsertBucketSource.read(spark, dir)
      .groupBy("tag").agg(count(lit(1)).as("c"))
    assert(plan(multi).contains("UpsertBucketScan"),
      s"multi-valued files must fall back to the scan:\n${plan(multi)}")
    assert(multi.as[(String, Long)].collect().toMap ==
      Map("g0" -> 667L, "g1" -> 667L, "g2" -> 666L))
    // a group column with NULLs refuses (the sidecar cannot separate
    // the null group), exact through the scan
    val dirN = Files.createTempDirectory("meta_grp_null").toString
    val baseN = spark.range(400).select(
      when(col("id") % 7 === 0, lit(null).cast("string"))
        .otherwise(lit("gA")).as("tag"), col("id"))
    val rddN = baseN.rdd.map(r => (0, r)).partitionBy(
      new org.apache.spark.Partitioner {
        override def numPartitions: Int = 1
        override def getPartition(key: Any): Int = 0
      }).values
    Upsert.overwriteSnapshot(spark, dirN,
      spark.createDataFrame(rddN, baseN.schema), zoneCols = Seq("tag", "id"))
    val nulls = UpsertBucketSource.read(spark, dirN)
      .groupBy("tag").agg(count(lit(1)).as("c"))
    assert(plan(nulls).contains("UpsertBucketScan"), plan(nulls))
    assert(nulls.count() == 2) // gA + the null group
    // grouping by a NON-zone column refuses
    val nz = UpsertBucketSource.read(spark, mkMergeTable(100))
      .groupBy("v").agg(count(lit(1)))
    assert(plan(nz).contains("UpsertBucketScan"))
  }

  test("time travel counts the pinned generation, not the current one") {
    catalogReady
    val dir = mkMergeTable(300)
    Upsert.merge(spark, dir, Seq(("z9", 1L, 9L)).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    val gens = Upsert.manifestGens(spark, dir).sorted
    val was = spark.sql(
      s"SELECT count(*) AS c FROM graft.`$dir` VERSION AS OF ${gens.head}")
    assert(plan(was).contains("LocalTableScan"), plan(was))
    assert(was.as[Long].head() == 300L)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$dir`")
      .as[Long].head() == 301L)
  }
}
