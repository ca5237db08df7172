package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Upsert

/** Planner-visible cardinality: every commit records per-file row
  * counts (parquet footers, carried for re-referenced files), and the
  * DSv2 scan reports `numRows` whenever its kept file set is fully
  * counted — so `optimizedPlan.stats.rowCount` is EXACT, not a
  * bytes-per-row guess, and the count shrinks with bucket pruning.
  */
class RowCountStatsSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int, buckets: Int): String = {
    val dir = Files.createTempDirectory("rowcount").toString
    Upsert.merge(spark, dir, spark.range(n).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      col("id").as("v")), pk = Seq("k"), versionCol = "ver",
      numBuckets = buckets)
    dir
  }

  private def relationRowCount(df: org.apache.spark.sql.DataFrame): Option[BigInt] =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.stats.rowCount
    }.flatten

  test("scan stats carry EXACT rowCount from the manifest's footer counts") {
    val dir = mk(500, 8)
    val df = UpsertBucketSource.read(spark, dir)
    assert(relationRowCount(df).contains(BigInt(500)))
    // an update merge rewrites one bucket's file; counts re-read for
    // the new file, carried for the untouched seven — still exact
    Upsert.merge(spark, dir,
      Seq(("k7", 2L, 777L), ("kNew", 1L, 1L)).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    val df2 = UpsertBucketSource.read(spark, dir)
    assert(relationRowCount(df2).contains(BigInt(501)))
    // ground truth through the PLAIN read path — a bare DSv2 count()
    // would now be answered from this very metadata (MetaAggSpec)
    assert(Upsert.read(spark, dir).count() == 501)
  }

  test("bucket pruning shrinks rowCount; time travel keeps each generation's") {
    val dir = mk(400, 4)
    val perBucket = (0 until 4).map { b =>
      UpsertBucketSource.read(spark, dir)
        .filter(col(UpsertBucketSource.BucketCol) === b)
    }
    val counts = perBucket.map(df => relationRowCount(df).get.toLong)
    assert(counts.sum == 400 && counts.forall(_ < 400))
    perBucket.zip(counts).foreach { case (df, c) => assert(df.count() == c) }
    // a second generation changes the count; VERSION AS OF keeps gen-1's
    Upsert.merge(spark, dir, Seq(("z1", 1L, 0L)).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val gens = Upsert.manifestGens(spark, dir).sorted
    assert(relationRowCount(
      UpsertBucketSource.read(spark, dir, gen = Some(gens.head)))
      .contains(BigInt(400)))
    assert(relationRowCount(UpsertBucketSource.read(spark, dir))
      .contains(BigInt(401)))
  }

  test("counts disabled or absent -> numRows unknown, never wrong") {
    spark.conf.set("spark.graft.rowCounts.maxNewFiles", "0")
    try {
      val dir = mk(120, 4)
      assert(relationRowCount(UpsertBucketSource.read(spark, dir)).isEmpty)
      // re-enable: the next commit SELF-HEALS — it footer-counts every
      // still-uncounted live file (capped), so the table's cardinality
      // is fully known again without a rewrite
      spark.conf.set("spark.graft.rowCounts.maxNewFiles", "1024")
      Upsert.merge(spark, dir, Seq(("x", 1L, 9L)).toDF("k", "ver", "v"),
        pk = Seq("k"), versionCol = "ver", numBuckets = 4)
      assert(relationRowCount(UpsertBucketSource.read(spark, dir))
        .contains(BigInt(121)))
    } finally spark.conf.unset("spark.graft.rowCounts.maxNewFiles")
  }

  test("CALL graft.stats exposes live_rows when fully counted") {
    spark.conf.set("spark.sql.catalog.graft", classOf[UpsertCatalog].getName)
    val dir = mk(250, 4)
    val st = spark.sql(s"CALL graft.stats('$dir')").collect().head
    assert(st.getAs[Long]("live_rows") == 250L)
  }
}
