package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Upsert

/** Limit and top-N scan pushdown (DSv2 partial push): a bare `LIMIT n`
  * keeps only the fewest files whose manifest row counts cover n; an
  * `ORDER BY c LIMIT k` over a zone column keeps only files whose zone
  * range can intersect the true top k (counting bound over the
  * sidecars' non-null counts). Both are PARTIAL pushes — Spark keeps
  * its own limit / sort+limit above, so every keep-set only has to be
  * a superset and results stay exact. Ground truths go through
  * `Upsert.read` (the plain parquet path, never pushed).
  */
class TopNPushSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** files=a/b out of the scan description, or None when nothing was
    * pushed.
    */
  private def keptOf(p: String, tag: String): Option[(Int, Int)] = {
    val m = (tag + """[^\n]*? files=(\d+)/(\d+)""").r.findFirstMatchIn(p)
    m.map(g => (g.group(1).toInt, g.group(2).toInt))
  }

  /** 4000 distinct values clustered on v across 8 files with disjoint
    * zone ranges — the layout top-N pruning is built for.
    */
  private lazy val clustered: String = {
    val dir = Files.createTempDirectory("topn_clustered").toString
    val df = spark.range(4000).select(col("id").as("v"),
      concat(lit("p"), col("id") % 7).as("tag"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("v"), clusterBy = Seq("v"), filesTarget = 8)
    dir
  }

  test("order-by-desc limit prunes to the top files, rows exact") {
    val q = UpsertBucketSource.read(spark, clustered)
      .orderBy(col("v").desc).limit(10).select("v", "tag")
    val kept = keptOf(plan(q), "topn=v DESC NULLS_LAST 10")
    assert(kept.isDefined, s"expected a pushed top-N:\n${plan(q)}")
    assert(kept.get._1 < kept.get._2, s"no files pruned: $kept")
    val want = Upsert.read(spark, clustered)
      .orderBy(col("v").desc).limit(10).select("v", "tag")
      .as[(Long, String)].collect().toSeq
    assert(q.as[(Long, String)].collect().toSeq == want)
  }

  test("order-by-asc limit prunes to the bottom files, rows exact") {
    val q = UpsertBucketSource.read(spark, clustered)
      .orderBy(col("v")).limit(25).select("v")
    val kept = keptOf(plan(q), "topn=v ASC NULLS_FIRST 25")
    assert(kept.isDefined && kept.get._1 < kept.get._2, plan(q))
    assert(q.as[Long].collect().toSeq ==
      Upsert.read(spark, clustered).orderBy(col("v")).limit(25)
        .select("v").as[Long].collect().toSeq)
  }

  test("only the leading sort column needs a zone bound") {
    val q = UpsertBucketSource.read(spark, clustered)
      .orderBy(col("v").desc, col("tag")).limit(10).select("v", "tag")
    assert(keptOf(plan(q), "topn=v DESC").exists(k => k._1 < k._2), plan(q))
    assert(q.as[(Long, String)].collect().toSeq ==
      Upsert.read(spark, clustered).orderBy(col("v").desc, col("tag"))
        .limit(10).select("v", "tag").as[(Long, String)].collect().toSeq)
  }

  test("duplicate values at the bound stay exact (superset keep)") {
    val dir = Files.createTempDirectory("topn_ties").toString
    // v = id / 10: every value appears 10x, duplicates straddle file
    // boundaries; compare the value multiset (row choice among ties is
    // the engine's)
    val df = spark.range(3000).select((col("id") / 10).cast("long").as("v"),
      col("id").as("id"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("v"), clusterBy = Seq("v"), filesTarget = 6)
    val got = UpsertBucketSource.read(spark, dir)
      .orderBy(col("v").desc).limit(15).select("v").as[Long].collect().toSeq
    val want = Upsert.read(spark, dir)
      .orderBy(col("v").desc).limit(15).select("v").as[Long].collect().toSeq
    assert(got.sorted == want.sorted)
  }

  test("nulls-first keeps the null-bearing files and answers exactly") {
    val dir = Files.createTempDirectory("topn_nulls").toString
    // 100 nulls, clustered so they land in the low files
    val df = spark.range(2000).select(
      when(col("id") < 100, lit(null).cast("long")).otherwise(col("id")).as("v"),
      col("id"))
    Upsert.overwriteSnapshot(spark, dir, df,
      zoneCols = Seq("v"), clusterBy = Seq("v"), filesTarget = 8)
    val q = UpsertBucketSource.read(spark, dir)
      .orderBy(asc_nulls_first("v")).limit(50).select("v")
    val kept = keptOf(plan(q), "topn=v ASC NULLS_FIRST 50")
    assert(kept.isDefined && kept.get._1 < kept.get._2, plan(q))
    val got = q.as[Option[Long]].collect().toSeq
    assert(got.size == 50 && got.forall(_.isEmpty)) // 100 nulls sort first
    // nulls-last over the same table: the value bound ignores nulls
    val q2 = UpsertBucketSource.read(spark, dir)
      .orderBy(desc("v")).limit(10).select("v")
    assert(keptOf(plan(q2), "topn=v DESC NULLS_LAST 10").exists(k => k._1 < k._2),
      plan(q2))
    assert(q2.as[Long].collect().toSeq ==
      Upsert.read(spark, dir).orderBy(desc("v")).limit(10)
        .select("v").as[Long].collect().toSeq)
    // more slots than non-null rows under nulls-last: no sound file
    // bound exists -> refused, full scan, still exact
    val q3 = UpsertBucketSource.read(spark, dir)
      .orderBy(desc("v")).limit(1950).select("v")
    assert(!plan(q3).contains("topn="), plan(q3))
    assert(q3.count() == 1950)
  }

  test("bare limit keeps the fewest files that cover n rows") {
    val q = UpsertBucketSource.read(spark, clustered).limit(7).select("v", "tag")
    val kept = keptOf(plan(q), "limit=7")
    assert(kept.isDefined && kept.get._1 < kept.get._2, plan(q))
    val got = q.as[(Long, String)].collect().toSeq
    assert(got.size == 7)
    // any 7 rows satisfy a bare limit — but they must be REAL rows
    val all = Upsert.read(spark, clustered).select("v", "tag")
      .as[(Long, String)].collect().toSet
    assert(got.forall(all.contains))
  }

  test("refusals: filters block the push, non-zone columns refuse") {
    // a filtered limit must see every file (the kept files' rows might
    // all fail the filter) — Spark keeps the Filter above the scan and
    // never attempts the push; assert nothing leaked through
    val f = UpsertBucketSource.read(spark, clustered)
      .filter(col("tag") === "p3").limit(5).select("v", "tag")
    assert(!plan(f).contains(" limit=") && !plan(f).contains("topn="), plan(f))
    assert(f.count() == 5)
    // ordering by a column with no zone sidecar: full scan, exact
    val nz = UpsertBucketSource.read(spark, clustered)
      .orderBy(col("tag").desc).limit(5).select("tag")
    assert(!plan(nz).contains("topn="), plan(nz))
    assert(nz.as[String].collect().toSeq ==
      Upsert.read(spark, clustered).orderBy(col("tag").desc).limit(5)
        .select("tag").as[String].collect().toSeq)
  }

  test("top-N pushes against a pinned MVCC generation, not the head") {
    val dir = Files.createTempDirectory("topn_gen").toString
    Upsert.overwriteSnapshot(spark, dir,
      spark.range(1000).select(col("id").as("v")),
      zoneCols = Seq("v"), clusterBy = Seq("v"), filesTarget = 4)
    val genA = Upsert.bucketLayout(spark, dir).gen
    Upsert.overwriteSnapshot(spark, dir,
      spark.range(5000).select(col("id").as("v")),
      zoneCols = Seq("v"), clusterBy = Seq("v"), filesTarget = 4)
    val pinned = UpsertBucketSource.read(spark, dir, gen = Some(genA))
      .orderBy(col("v").desc).limit(3).select("v")
    assert(keptOf(plan(pinned), "topn=v DESC NULLS_LAST 3")
      .exists(k => k._1 < k._2), plan(pinned))
    assert(pinned.as[Long].collect().toSeq == Seq(999L, 998L, 997L))
    val head = UpsertBucketSource.read(spark, dir)
      .orderBy(col("v").desc).limit(3).select("v")
    assert(head.as[Long].collect().toSeq == Seq(4999L, 4998L, 4997L))
  }

  test("SQL through the catalog pushes the same way") {
    spark.conf.set("spark.sql.catalog.graft", classOf[UpsertCatalog].getName)
    val q = spark.sql(
      s"SELECT v, tag FROM graft.`$clustered` ORDER BY v DESC LIMIT 10")
    assert(keptOf(plan(q), "topn=v DESC NULLS_LAST 10").exists(k => k._1 < k._2),
      plan(q))
    assert(q.as[(Long, String)].collect().toSeq ==
      Upsert.read(spark, clustered).orderBy(col("v").desc).limit(10)
        .select("v", "tag").as[(Long, String)].collect().toSeq)
    val lim = spark.sql(s"SELECT v FROM graft.`$clustered` LIMIT 9")
    assert(keptOf(plan(lim), "limit=9").isDefined, plan(lim))
    assert(lim.count() == 9)
  }

  test("merge tables push too, and runtime row counts stay honest") {
    val dir = Files.createTempDirectory("topn_merge").toString
    Upsert.merge(spark, dir, spark.range(1500).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"), col("id").as("v")),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    // no zones on a plain merge table -> top-N refuses; bare limit
    // works from the manifest row counts alone
    val q = UpsertBucketSource.read(spark, dir).limit(40).select("v")
    assert(keptOf(plan(q), "limit=40").isDefined, plan(q))
    assert(q.count() == 40)
    val t = UpsertBucketSource.read(spark, dir)
      .orderBy(col("v").desc).limit(5).select("v")
    assert(!plan(t).contains("topn="), plan(t))
    assert(t.as[Long].collect().toSeq == Seq(1499L, 1498L, 1497L, 1496L, 1495L))
  }
}
