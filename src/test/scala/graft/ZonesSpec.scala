package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.Upsert

/** File-level zone-map skipping (io.Zones): range reads prune the
  * manifest's file list by per-file min/max sidecars, exactly — never a
  * superset of the plain filtered read, never a missing row.
  */
class ZonesSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  private def assertSameAsFilteredRead(dir: String, c: String,
                                       lo: Option[Any], hi: Option[Any]): Unit = {
    val col0 = col(c)
    val cond = (lo.map(v => col0 >= lit(v)) ++ hi.map(v => col0 <= lit(v)))
      .reduceOption(_ && _).getOrElse(lit(true))
    val want = sortedRows(Upsert.read(spark, dir).filter(cond))
    val got = sortedRows(Upsert.readRange(spark, dir, c, lo, hi))
    assert(got == want)
  }

  test("clustered snapshot: a narrow date range prunes most files, result exact") {
    val dir = Files.createTempDirectory("zones_snap").toString
    val df = spark.range(10000).select(
      col("id"),
      date_add(lit("2024-01-01").cast("date"), (col("id") / 100).cast("int")).as("d"),
      (col("id") % 97).as("v"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("d", "id"), clusterBy = Seq("d"), filesTarget = 8)

    val lo = Some(Date.valueOf("2024-01-10")): Option[Any]
    val hi = Some(Date.valueOf("2024-01-20")): Option[Any]
    val (kept, pruned) = Upsert.rangePruneStats(spark, dir, "d", lo, hi)
    assert(pruned > 0, "clustered files with disjoint ranges must prune")
    assert(kept < kept + pruned)
    assert(kept + pruned == Upsert.currentManifest(spark, dir).get.allFiles.size)
    assertSameAsFilteredRead(dir, "d", lo, hi)
    // long zones on the same table (id is clustered incidentally via d)
    assertSameAsFilteredRead(dir, "id", Some(1234L), Some(2345L))
    // unbounded sides
    assertSameAsFilteredRead(dir, "d", lo, None)
    assertSameAsFilteredRead(dir, "d", None, hi)
  }

  test("merge path: sticky zone cols, statless old files still read, clustering tightens") {
    val dir = Files.createTempDirectory("zones_merge").toString
    def batch(ids: Range, ver: Long) = ids.map { i =>
      (s"k$i", ver, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i / 50)), i.toLong)
    }.toDF("id", "ver", "d", "v")

    // gen 1: NO zones declared — files carry no sidecar
    Upsert.merge(spark, dir, batch(0 until 500, 1L), pk = Seq("id"), versionCol = "ver")
    // gen 2: declare zones on d — sticky from here on
    Upsert.merge(spark, dir, batch(500 until 1000, 2L), pk = Seq("id"),
      versionCol = "ver", zoneCols = Seq("d"))
    // gen 3: no zoneCols arg — manifest prop keeps them maintained
    Upsert.merge(spark, dir, batch(1000 until 1500, 3L), pk = Seq("id"), versionCol = "ver")
    assert(Upsert.zoneColsOf(Upsert.currentManifest(spark, dir).get) == Seq("d"))

    val lo = Some(Date.valueOf("2024-01-25")): Option[Any]
    val hi = Some(Date.valueOf("2024-01-28")): Option[Any]
    // exactness holds even while most files are statless or unclustered
    assertSameAsFilteredRead(dir, "d", lo, hi)

    // re-cluster everything: every bucket range-split on d
    Upsert.compactBuckets(spark, dir, pk = Seq("id"), maxFilesPerBucket = 0,
      clusterBy = Seq("d"), filesPerBucket = 2)
    val (kept, pruned) = Upsert.rangePruneStats(spark, dir, "d", lo, hi)
    assert(pruned > 0, "post-clustering a 4-day range must prune files")
    assertSameAsFilteredRead(dir, "d", lo, hi)
    val st = Upsert.stats(spark, dir).get
    assert(st.zoneBuckets == st.numBuckets || st.zoneBuckets > 0)
  }

  test("all-null zone values: closed ranges prune the null-only file, rows stay exact") {
    val dir = Files.createTempDirectory("zones_null").toString
    val dated = spark.range(300).select(col("id"),
      date_add(lit("2024-03-01").cast("date"), (col("id") / 100).cast("int")).as("d"))
    val nulls = spark.range(300, 400).select(col("id"), lit(null).cast("date").as("d"))
    Upsert.overwriteSnapshot(spark, dir, dated.union(nulls),
      zoneCols = Seq("d"), clusterBy = Seq("d"), filesTarget = 4)
    val lo = Some(Date.valueOf("2024-03-02")): Option[Any]
    assertSameAsFilteredRead(dir, "d", lo, None)
    val (_, pruned) = Upsert.rangePruneStats(spark, dir, "d", lo, None)
    assert(pruned > 0, "the all-null range partition must be prunable")
  }

  test("string zones use UTF-8 code-point order: no false negative on supplementary chars") {
    val dir = Files.createTempDirectory("zones_utf8").toString
    // U+1F600 sorts ABOVE U+FFFF in UTF-8/code-point order (Spark's
    // min/max) but BELOW it in Java's UTF-16 compareTo — a driver
    // compare using String.compareTo would prune the emoji file for
    // lo = U+FFFF and silently drop matching rows.
    val emoji = "😀" // U+1F600
    val rows = Seq(("a", "alpha"), ("b", "beta"), ("e", emoji), ("f", "￿"))
      .toDF("id", "s")
    Upsert.overwriteSnapshot(spark, dir, rows.repartition(4, col("id")),
      zoneCols = Seq("s"))
    val lo = Some("￿"): Option[Any]
    assertSameAsFilteredRead(dir, "s", lo, None)
    val got = Upsert.readRange(spark, dir, "s", lo, None).select("id")
      .as[String].collect().sorted
    assert(got.toSeq == Seq("e", "f"))
  }

  test("timestamp zones: micros round-trip, pruning exact across merges") {
    val dir = Files.createTempDirectory("zones_ts").toString
    val df = spark.range(2000).select(col("id"),
      timestamp_seconds(lit(1700000000L) + col("id") * 60).as("ts"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("ts"), clusterBy = Seq("ts"), filesTarget = 6)
    val lo = Some(java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L + 300 * 60))): Option[Any]
    val hi = Some(java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L + 400 * 60))): Option[Any]
    val (_, pruned) = Upsert.rangePruneStats(spark, dir, "ts", lo, hi)
    assert(pruned > 0)
    assertSameAsFilteredRead(dir, "ts", lo, hi)
  }

  test("z-order clustering prunes on BOTH dimensions where linear prunes only the leading one") {
    import graft.io.Zorder
    // two independent uniform dims — the case linear clustering can't serve
    val df = spark.range(40000).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(10000L)).as("x"),
      pmod(xxhash64(col("id"), lit(7)), lit(10000L)).as("y"))

    val linDir = Files.createTempDirectory("zorder_lin").toString
    Upsert.overwriteSnapshot(spark, linDir, df,
      zoneCols = Seq("x", "y"), clusterBy = Seq("x"), filesTarget = 16)
    val zDir = Files.createTempDirectory("zorder_z").toString
    Zorder.snapshot(spark, zDir, df, "x", "y", filesTarget = 16)

    // layout column never reaches the stored schema
    assert(Upsert.read(spark, zDir).columns.toSeq == Seq("id", "x", "y"))

    val xr = (Some(1000L): Option[Any], Some(1999L): Option[Any])
    val yr = (Some(5000L): Option[Any], Some(5999L): Option[Any])
    val (_, linX) = Upsert.rangePruneStats(spark, linDir, "x", xr._1, xr._2)
    val (_, linY) = Upsert.rangePruneStats(spark, linDir, "y", yr._1, yr._2)
    val (_, zX) = Upsert.rangePruneStats(spark, zDir, "x", xr._1, xr._2)
    val (_, zY) = Upsert.rangePruneStats(spark, zDir, "y", yr._1, yr._2)
    assert(linX > 0, "linear must prune its leading dim")
    assert(linY == 0, s"independent trailing dim should not prune under linear (got $linY)")
    assert(zX > 0 && zY > 0, s"z-order must prune both dims (x=$zX y=$zY)")

    // exactness on both dims, on both layouts
    Seq(linDir, zDir).foreach { d =>
      assertSameAsFilteredRead(d, "x", xr._1, xr._2)
      assertSameAsFilteredRead(d, "y", yr._1, yr._2)
    }

    // RECTANGLE read (readRanges): on the z layout both bounds prune
    // the same file list, so the intersection is at least as tight as
    // either dim alone — and the rows are exactly the doubly-filtered
    // plain read
    val rect = Seq(("x", xr._1, xr._2), ("y", yr._1, yr._2))
    val (rectKept, rectPruned) = Upsert.rangePruneStatsMulti(spark, zDir, rect)
    val (xKept, _) = Upsert.rangePruneStats(spark, zDir, "x", xr._1, xr._2)
    val (yKept, _) = Upsert.rangePruneStats(spark, zDir, "y", yr._1, yr._2)
    assert(rectKept <= math.min(xKept, yKept),
      s"rectangle must intersect per-dim prunes (rect=$rectKept x=$xKept y=$yKept)")
    assert(rectKept + rectPruned == Upsert.currentManifest(spark, zDir).get.allFiles.size)
    val want = sortedRows(Upsert.read(spark, zDir).filter(
      col("x").between(1000L, 1999L) && col("y").between(5000L, 5999L)))
    assert(sortedRows(Upsert.readRanges(spark, zDir, rect)) == want)
  }

  test("fact path: z-ordered lineitem snapshot rectangle-prunes the q6 slice, result exact") {
    val root = graft.ops.TpcH.zonesLineitemEnsure(spark, sf)
    val lo = java.sql.Timestamp.from(java.time.Instant.parse("1996-01-01T00:00:00Z"))
    val hi = java.sql.Timestamp.from(java.time.Instant.parse("1997-01-01T00:00:00Z"))
    val rect = Seq(
      ("l_shipdate", Some(lo): Option[Any], Some(hi): Option[Any]),
      ("l_discount", Some(0.05): Option[Any], Some(0.07): Option[Any]))
    val total = Upsert.currentManifest(spark, root).get.allFiles.size
    val (kept, pruned) = Upsert.rangePruneStatsMulti(spark, root, rect)
    assert(kept + pruned == total)
    // the year×discount-band rectangle must drop most of the table's
    // files before any task launches — the 100 TB fact-path claim
    assert(kept * 2 <= total, s"rectangle kept $kept of $total files")
    // and the interleave means EACH dim prunes alone (linear clustering
    // would serve only its leading column)
    val (dateKept, _) = Upsert.rangePruneStats(spark, root, "l_shipdate", Some(lo), Some(hi))
    val (discKept, _) = Upsert.rangePruneStats(spark, root, "l_discount", Some(0.05), Some(0.07))
    assert(dateKept < total, "ship-date range must prune alone")
    assert(discKept < total, "discount band must prune alone")
    // served head == raw-path q6 (the graded oracle equivalence)
    val served = graft.ops.TpcH.q6ZonesForecast(spark, sf).collect().toSeq
    val raw = graft.ops.TpcH.q6ForecastRevenue(spark, sf).collect().toSeq
    assert(served.map(_.toString) == raw.map(_.toString))
  }

  test("sidecars ride the manifest: untouched buckets keep pruning after a point merge") {
    val dir = Files.createTempDirectory("zones_ride").toString
    val rows = (0 until 1000).map(i =>
      (s"k$i", 1L, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i / 50)), i))
      .toDF("id", "ver", "d", "v")
    Upsert.merge(spark, dir, rows, pk = Seq("id"), versionCol = "ver",
      zoneCols = Seq("d"), bloom = true)
    Upsert.compactBuckets(spark, dir, pk = Seq("id"), maxFilesPerBucket = 0,
      clusterBy = Seq("d"), filesPerBucket = 2)
    val before = Upsert.rangePruneStats(spark, dir, "d",
      Some(Date.valueOf("2024-01-02")), Some(Date.valueOf("2024-01-03")))
    assert(before._2 > 0)
    // point merge: one key → one bucket rewritten, the rest re-referenced
    Upsert.merge(spark, dir, Seq(("k1", 2L, Date.valueOf("2024-01-01"), -1))
      .toDF("id", "ver", "d", "v"), pk = Seq("id"), versionCol = "ver", bloom = true)
    val after = Upsert.rangePruneStats(spark, dir, "d",
      Some(Date.valueOf("2024-01-02")), Some(Date.valueOf("2024-01-03")))
    assert(after._2 >= before._2 - 2,
      s"old-generation sidecars must keep pruning (before=$before after=$after)")
    assertSameAsFilteredRead(dir, "d",
      Some(Date.valueOf("2024-01-02")), Some(Date.valueOf("2024-01-03")))
  }

  test("a_zones_daterange bench head: 1-day slice opens a small fraction of files, exact") {
    // the graded head (SparkEntry a_zones_daterange) — pin its IO claim
    // here: the ts-clustered snapshot prunes the file list down to
    // ~span-fraction before any task launches
    val root = graft.ops.Relational.zonesEventsEnsure(spark, sf)
    val lo = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-08T00:00:00Z"))
    val hi = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-09T00:00:00Z"))
    val (kept, pruned) = Upsert.rangePruneStats(spark, root, "ts", Some(lo), Some(hi))
    val total = kept + pruned
    assert(total == Upsert.currentManifest(spark, root).get.allFiles.size)
    assert(kept * 5 <= total,
      s"1/30 of a 30-day clustered span must open ≤1/5 of files (kept=$kept total=$total)")
    // and the served result is exactly the raw-table answer
    val got = sortedRows(graft.ops.Relational.zonesDateRange(spark, sf))
    val want = sortedRows(graft.io.Tables.events(spark, sf)
      .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ev_ct"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"),
        countDistinct(col("user_id")).as("users")))
    assert(got == want)
  }

  test("sidecar FORMAT pin (ADVICE r10): v1=4 fields, v2=6, v3=7 — mixed-version rollout safety") {
    // a v2-era reader splits with limit 6: a 7th field appended under
    // the v2 NAME would fuse `sum\tndv` into one token and crash its
    // BigInt parse on shared storage. The ndv field therefore lives in
    // a NEW v3 file and the v2 file must stay at its original 6
    // fields forever — this pin turns any future accidental widening
    // into a red test instead of a mixed-rollout crash.
    import java.nio.file.Files
    val dir = Files.createTempDirectory("zones_fmt").toString
    graft.io.Upsert.overwriteSnapshot(spark, dir,
      spark.range(100).select(col("id"), (col("id") * 2).as("v")),
      zoneCols = Seq("v"))
    import scala.jdk.CollectionConverters._
    def fields(name: String): Seq[Int] = {
      val f = Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .find(_.getFileName.toString == name)
        .getOrElse(fail(s"no $name written"))
      new String(Files.readAllBytes(f)).linesIterator
        .filter(_.nonEmpty).map(_.split("\t", -1).length).toSeq.distinct
    }
    assert(fields(graft.io.Zones.SidecarName) == Seq(4))
    assert(fields(graft.io.Zones.SidecarNameV2) == Seq(6))
    assert(fields(graft.io.Zones.SidecarNameV3) == Seq(7))
  }
}
