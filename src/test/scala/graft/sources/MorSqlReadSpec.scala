package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.MergeOnRead

/** SQL over merge-on-read roots: `SELECT FROM graft.`/mor/path``
  * resolves the read-time content (newest (version, batch) per PK,
  * deletes vanish) by the MorReadRule relation substitution, and
  * `INSERT INTO` lands the batch as the next O(batch) delta append.
  * Both read plan shapes (broadcast fast path / zero-exchange SPJ
  * resolve) are reachable from SQL; refusals (no recorded contract,
  * time travel, INSERT OVERWRITE) stay loud and specific.
  */
class MorSqlReadSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogReady: Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[UpsertCatalog].getName)

  private val pk = Seq("id")

  /** A compacted MOR table (contract recorded) with live deltas on
    * top: 200 base keys, k1 corrected, k3 deleted, kNEW inserted.
    */
  private def mkMor(): String = {
    val root = Files.createTempDirectory("mor_sql").toString
    val dir = s"$root/t"
    MergeOnRead.merge(spark, dir,
      (1 to 200).map(i => (s"k$i", "p1", 1L, i.toLong, "insert"))
        .toDF("id", "province_id", "ver", "amount_cents", "op"))
    MergeOnRead.compact(spark, dir, pk, "ver", deleteFlagCol = Some("op"))
    MergeOnRead.merge(spark, dir, Seq(("k1", "p1", 2L, 111L, "update"),
      ("k3", "p1", 2L, 0L, "delete"), ("kNEW", "p9", 2L, 7L, "insert"))
      .toDF("id", "province_id", "ver", "amount_cents", "op"))
    dir
  }

  private def content(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "province_id", "ver", "amount_cents", "op")
      .as[(String, String, Long, Long, String)].collect().toSet

  test("SQL SELECT resolves the merge-on-read content; filters and aggregates work") {
    catalogReady
    val dir = mkMor()
    val sql = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(content(sql) ==
      content(MergeOnRead.read(spark, dir, pk, "ver", Some("op"))))
    // LWW + delete semantics visible from SQL
    assert(spark.sql(s"SELECT amount_cents FROM graft.`$dir` WHERE id = 'k1'")
      .as[Long].head() == 111L)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$dir` WHERE id = 'k3'")
      .as[Long].head() == 0L)
    assert(spark.sql(
      s"SELECT count(*) AS c, sum(amount_cents) AS s FROM graft.`$dir`")
      .as[(Long, Long)].head() ==
      ((200L, (1 to 200).map(_.toLong).sum - 3 + 111 - 1 + 7)))
    // self-join: each substitution gets fresh exprIds
    assert(spark.sql(
      s"""SELECT count(*) AS c FROM graft.`$dir` a
          JOIN graft.`$dir` b ON a.id = b.id""").as[Long].head() == 200L)
  }

  test("SQL big-delta path (conf-scoped): base arrives at the resolve without shuffling") {
    catalogReady
    val dir = mkMor()
    spark.conf.set("spark.graft.mor.broadcastDeltaBytes", "0")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.sql(s"SELECT * FROM graft.`$dir`")
      val plan = df.queryExecution.executedPlan
      val pStr = plan.toString
      assert(pStr.contains("UpsertBucketScan"),
        s"SQL big-delta read must scan the base through the bucket reader:\n$pStr")
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      plan.collect { case s: ShuffleExchangeExec => s }.foreach { s =>
        assert(!s.toString.contains("UpsertBucketScan"),
          s"base scan entered a shuffle exchange:\n$pStr")
      }
      assert(content(df) ==
        content(MergeOnRead.read(spark, dir, pk, "ver", Some("op"))))
    } finally {
      spark.conf.unset("spark.graft.mor.broadcastDeltaBytes")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("SQL INSERT INTO is the O(batch) delta append; OVERWRITE refuses") {
    catalogReady
    val dir = mkMor()
    val batchesBefore = MergeOnRead.deltaBatches(spark, dir).size
    spark.sql(s"""INSERT INTO graft.`$dir` VALUES
      ('k2', 'p1', 9, 222, 'update'), ('k4', 'p1', 9, 0, 'delete'),
      ('kSQL', 'p3', 9, 5, 'insert')""")
    assert(MergeOnRead.deltaBatches(spark, dir).size == batchesBefore + 1,
      "INSERT INTO must land exactly one delta batch")
    assert(spark.sql(s"SELECT amount_cents FROM graft.`$dir` WHERE id = 'k2'")
      .as[Long].head() == 222L)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.`$dir` WHERE id IN ('k4')")
      .as[Long].head() == 0L, "SQL-inserted delete row must retract")
    assert(spark.sql(s"SELECT province_id FROM graft.`$dir` WHERE id = 'kSQL'")
      .as[String].head() == "p3")
    val ow = intercept[Exception](spark.sql(
      s"INSERT OVERWRITE graft.`$dir` VALUES ('x', 'p', 1, 1, 'insert')"))
    def ms(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ ms(x.getCause))
    assert(ms(ow).exists(_.contains("MergeOnRead.compact")), s"got ${ms(ow)}")
  }

  test("refusals: contract-less root, time travel; DESCRIBE shows the contract") {
    catalogReady
    // deltas only, never compacted -> no recorded contract
    val bareRoot = Files.createTempDirectory("mor_sql_bare").toString
    val bare = s"$bareRoot/t"
    MergeOnRead.merge(spark, bare,
      Seq(("a", "p1", 1L, 1L, "insert"))
        .toDF("id", "province_id", "ver", "amount_cents", "op"))
    val noContract = intercept[UnsupportedOperationException](
      spark.sql(s"SELECT * FROM graft.`$bare`").collect())
    assert(noContract.getMessage.contains("no recorded contract"))

    val dir = mkMor()
    val tt = intercept[UnsupportedOperationException](
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1").collect())
    assert(tt.getMessage.contains("time travel is not supported"))

    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED graft.`$dir`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val props = desc.getOrElse("Table Properties", "")
    assert(props.contains("pk=id") && props.contains("versionCol=ver") &&
      props.contains("deleteFlagCol=op"), s"got $props")
    assert(desc.get("Provider").contains("graft-mor"), s"got $desc")
  }

  test("lifecycle: MOR roots exist to DDL — CREATE refuses, DROP removes whole") {
    catalogReady
    val dir = mkMor()
    // CREATE TABLE over a live MOR root must not commit a manifest
    // into the same directory
    val dup = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`$dir` (k STRING, ver BIGINT)
          TBLPROPERTIES ('pk'='k', 'versionCol'='ver')"""))
    assert(dup.getMessage.contains("already exists"), s"got ${dup.getMessage}")
    // DROP TABLE removes base + deltas + contract under the lease
    spark.sql(s"DROP TABLE graft.`$dir`")
    assert(!graft.io.Upsert.exists(spark, dir))
    // and IF EXISTS on the now-missing root is a clean no-op
    spark.sql(s"DROP TABLE IF EXISTS graft.`$dir`")
    val gone = intercept[Exception](
      spark.sql(s"SELECT * FROM graft.`$dir`").collect())
    assert(gone.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      gone.getMessage.contains("not found"), s"got ${gone.getMessage}")
  }

  test("a raw dir with a child named base/delta is NOT a MOR table: never droppable") {
    catalogReady
    val raw = Files.createTempDirectory("mor_sql_raw").toString
    // a foreign layout that HAPPENS to contain base/ and delta/ —
    // no contract, no base manifest, no committed delta batch
    spark.range(5).toDF("x").write.parquet(s"$raw/base")
    spark.range(5).toDF("x").write.parquet(s"$raw/delta")
    assert(!graft.io.MergeOnRead.isMorRoot(spark, raw))
    // DROP must refuse (TABLE_OR_VIEW_NOT_FOUND), never delete
    intercept[Exception](spark.sql(s"DROP TABLE graft.`$raw`"))
    assert(graft.io.Upsert.exists(spark, s"$raw/base"),
      "raw directory must survive a DROP TABLE aimed at it")
    // SELECT reports not-found, not a bogus merge-on-read error
    val sel = intercept[Exception](
      spark.sql(s"SELECT * FROM graft.`$raw`").collect())
    assert(sel.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      sel.getMessage.contains("not found"), s"got ${sel.getMessage}")
  }
}
