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

  test("SQL UPDATE: one O(batch) delta append, base untouched; parity with the API path") {
    catalogReady
    val dir = mkMor()
    val twin = mkMor()
    val batchesBefore = MergeOnRead.deltaBatches(spark, dir).size
    val baseGenBefore = MergeOnRead.stats(spark, dir).base.get
    spark.sql(s"""UPDATE graft.`$dir` SET amount_cents = amount_cents + 1000
                  WHERE id IN ('k5', 'k6', 'kNEW')""")
    assert(MergeOnRead.deltaBatches(spark, dir).size == batchesBefore + 1,
      "UPDATE must land exactly one delta batch")
    assert(MergeOnRead.stats(spark, dir).base.get == baseGenBefore,
      "UPDATE must never rewrite the base")
    // API parity: the same batch through MergeOnRead.merge — unchanged
    // version ties with the current winner and the newer batch wins
    MergeOnRead.merge(spark, twin, Seq(
      ("k5", "p1", 1L, 1005L, "insert"), ("k6", "p1", 1L, 1006L, "insert"),
      ("kNEW", "p9", 2L, 1007L, "insert"))
      .toDF("id", "province_id", "ver", "amount_cents", "op"))
    assert(content(spark.sql(s"SELECT * FROM graft.`$dir`")) ==
      content(MergeOnRead.read(spark, twin, pk, "ver", Some("op"))))
    assert(spark.sql(s"SELECT amount_cents FROM graft.`$dir` WHERE id = 'kNEW'")
      .as[Long].head() == 1007L)
  }

  test("SQL DELETE: retraction rows carry the matched row's OWN version; parity") {
    catalogReady
    val dir = mkMor()
    val twin = mkMor()
    val batchesBefore = MergeOnRead.deltaBatches(spark, dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id IN ('k7', 'kNEW')")
    val batches = MergeOnRead.deltaBatches(spark, dir)
    assert(batches.size == batchesBefore.size + 1)
    // the landed retraction rows: version = the matched row's own (k7
    // base ver 1, kNEW delta ver 2) so ties break to the newer batch
    val landed = spark.read.parquet(batches.last._2)
      .select("id", "ver", "op").as[(String, Long, String)].collect()
      .map { case (k, v, o) => k -> ((v, o)) }.toMap
    assert(landed("k7") == ((1L, "delete")) && landed("kNEW") == ((2L, "delete")),
      s"got $landed")
    MergeOnRead.merge(spark, twin, Seq(
      ("k7", null, 1L, 0L, "delete"), ("kNEW", null, 2L, 0L, "delete"))
      .toDF("id", "province_id", "ver", "amount_cents", "op"))
    assert(content(spark.sql(s"SELECT * FROM graft.`$dir`")) ==
      content(MergeOnRead.read(spark, twin, pk, "ver", Some("op"))))
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.`$dir` WHERE id IN ('k7','kNEW')")
      .as[Long].head() == 0L)
  }

  test("SQL MERGE INTO: update + delete + insert actions land as ONE delta batch") {
    catalogReady
    val dir = mkMor()
    Seq(("k10", "u", 555L), ("k11", "d", 0L), ("kM", "i", 42L))
      .toDF("sid", "action", "amt").createOrReplaceTempView("mor_merge_src")
    val batchesBefore = MergeOnRead.deltaBatches(spark, dir).size
    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING mor_merge_src s ON t.id = s.sid
          WHEN MATCHED AND s.action = 'u' THEN UPDATE SET amount_cents = s.amt
          WHEN MATCHED AND s.action = 'd' THEN DELETE
          WHEN NOT MATCHED THEN
            INSERT (id, province_id, ver, amount_cents, op)
            VALUES (s.sid, 'pM', 5, s.amt, 'insert')""")
    assert(MergeOnRead.deltaBatches(spark, dir).size == batchesBefore + 1,
      "MERGE must land exactly one delta batch")
    assert(spark.sql(s"SELECT amount_cents FROM graft.`$dir` WHERE id = 'k10'")
      .as[Long].head() == 555L)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$dir` WHERE id = 'k11'")
      .as[Long].head() == 0L)
    assert(spark.sql(
      s"SELECT province_id, ver FROM graft.`$dir` WHERE id = 'kM'")
      .as[(String, Long)].head() == (("pM", 5L)))
  }

  test("MERGE INTO with NOT MATCHED BY SOURCE over a MOR root") {
    catalogReady
    val dir = mkMor() // 200 keys, k3 deleted, kNEW inserted (ver 2)
    Seq(("k1", 900L), ("kS", 77L)).toDF("sk", "amt")
      .createOrReplaceTempView("mor_nbs_src")
    val batchesBefore = MergeOnRead.deltaBatches(spark, dir).size
    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING mor_nbs_src s ON t.id = s.sk
          WHEN MATCHED THEN UPDATE SET amount_cents = s.amt
          WHEN NOT MATCHED THEN
            INSERT (id, province_id, ver, amount_cents, op)
            VALUES (s.sk, 'pS', 5, s.amt, 'insert')
          WHEN NOT MATCHED BY SOURCE AND t.id = 'k2' THEN DELETE
          WHEN NOT MATCHED BY SOURCE AND t.id = 'k4' THEN
            UPDATE SET amount_cents = -1""")
    assert(MergeOnRead.deltaBatches(spark, dir).size == batchesBefore + 1,
      "the whole three-clause MERGE must land as ONE delta batch")
    val after = spark.sql(
      s"SELECT id, amount_cents FROM graft.`$dir` " +
        "WHERE id IN ('k1','k2','k4','kS')")
      .as[(String, Long)].collect().toMap
    assert(after("k1") == 900L && after("kS") == 77L && after("k4") == -1L)
    assert(!after.contains("k2"), "by-source DELETE must retract k2")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$dir`")
      .as[Long].head() == 200L) // 200 - k2 + kS
  }

  test("UPDATE may SET the version column (LWW contract); SET on the pk refuses") {
    catalogReady
    val dir = mkMor()
    // raising the version is the normal LWW correction — lands and wins
    spark.sql(s"UPDATE graft.`$dir` SET ver = 9, amount_cents = 999 WHERE id = 'k9'")
    assert(spark.sql(s"SELECT ver, amount_cents FROM graft.`$dir` WHERE id = 'k9'")
      .as[(Long, Long)].head() == ((9L, 999L)))
    // a LOWERED version would lose resolution forever — a
    // silently-ineffective UPDATE — so the writer refuses it loudly
    // (ADVICE r10) and the table is untouched
    def ms(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ ms(x.getCause))
    val low = intercept[Exception](spark.sql(
      s"UPDATE graft.`$dir` SET ver = 0, amount_cents = -5 WHERE id = 'k9'"))
    assert(ms(low).exists(_.contains("lowers the LWW version")), s"got ${ms(low)}")
    assert(spark.sql(s"SELECT amount_cents FROM graft.`$dir` WHERE id = 'k9'")
      .as[Long].head() == 999L, "refused UPDATE must leave the table unchanged")
    // re-keying refuses, same identity guard as the Upsert layout
    val e = intercept[Exception](
      spark.sql(s"UPDATE graft.`$dir` SET id = 'kX' WHERE id = 'k8'"))
    assert(ms(e).exists(_.contains("identity column")), s"got ${ms(e)}")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$dir` " +
      "WHERE id IN ('k8','kX')").as[Long].head() == 1L)
  }

  test("DML refusals: DELETE (and MERGE deletes) need a recorded deleteFlagCol") {
    catalogReady
    // contract WITHOUT a delete flag: retractions are not expressible
    val root = Files.createTempDirectory("mor_sql_nodel").toString
    val dir = s"$root/t"
    MergeOnRead.merge(spark, dir,
      (1 to 20).map(i => (s"k$i", 1L, i.toLong))
        .toDF("id", "ver", "amount_cents"))
    MergeOnRead.compact(spark, dir, pk, "ver")
    val del = intercept[UnsupportedOperationException](
      spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 'k1'"))
    assert(del.getMessage.contains("no deleteFlagCol"), del.getMessage)
    // UPDATE stays available — it needs no retraction row
    spark.sql(s"UPDATE graft.`$dir` SET amount_cents = 99 WHERE id = 'k2'")
    assert(spark.sql(s"SELECT amount_cents FROM graft.`$dir` WHERE id = 'k2'")
      .as[Long].head() == 99L)
  }

  test("VERSION AS OF resolves delta batch ids; pre-compaction snapshots retained one cycle") {
    catalogReady
    val dir = mkMor() // batch 0 folded (upto=0), batch 1 live
    // v0 = the insert-only state; v1 = current
    val v0 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
    assert(v0.count() == 200)
    assert(v0.filter($"id" === "k1").select("amount_cents").as[Long].head() == 1L,
      "version 0 must predate the k1 correction")
    assert(content(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")) ==
      content(spark.sql(s"SELECT * FROM graft.`$dir`")))
    // wave 2 + second compaction: batch 1's pre-compaction snapshot must
    // STILL be readable (one-cycle retention keeps manifest gen-1 and
    // the folded batch 1)
    MergeOnRead.merge(spark, dir, Seq(("k2", "p1", 9L, 999L, "update"))
      .toDF("id", "province_id", "ver", "amount_cents", "op"))
    MergeOnRead.compact(spark, dir, pk, "ver", deleteFlagCol = Some("op"))
    val v1 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")
    assert(v1.filter($"id" === "k1").select("amount_cents").as[Long].head() == 111L)
    assert(v1.filter($"id" === "k2").select("amount_cents").as[Long].head() == 2L,
      "version 1 must predate the k2 correction")
    assert(spark.sql(s"SELECT amount_cents FROM graft.`$dir` VERSION AS OF 2 " +
      "WHERE id = 'k2'").as[Long].head() == 999L)
    // offline GC drops every folded batch: version 2 (the watermark)
    // still serves from the base alone; version 1 now refuses, NAMING
    // the GC'd batch, instead of serving a torn state
    MergeOnRead.gcCompactedDeltas(spark, dir, retainForReaders = false)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$dir` VERSION AS OF 2")
      .as[Long].head() == 200L)
    val gone = intercept[Exception](
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1").collect())
    def ms(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ ms(x.getCause))
    assert(ms(gone).exists(m => m.contains("GC'd")), s"got ${ms(gone)}")
    // out-of-range and non-integer versions refuse with the axis spelled out
    val oob = intercept[Exception](
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 99").collect())
    assert(ms(oob).exists(_.contains("delta batch ids")), s"got ${ms(oob)}")
  }

  test("TIMESTAMP AS OF on a MOR root: newest retained batch at-or-before the stamp") {
    catalogReady
    val dir = mkMor()
    // everything is committed by now: a future stamp resolves to current
    val future = java.time.LocalDateTime.now().plusHours(1)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(content(spark.sql(
      s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF '$future'")) ==
      content(spark.sql(s"SELECT * FROM graft.`$dir`")))
    // a stamp before the table existed refuses with the honest message
    val past = intercept[Exception](spark.sql(
      s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF '2001-01-01 00:00:00'").collect())
    def ms(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ ms(x.getCause))
    assert(ms(past).exists(_.contains("precedes every retained snapshot")),
      s"got ${ms(past)}")
  }

  test("contract-recorded roots refuse null pk/version at the WRITE boundary") {
    catalogReady
    val dir = mkMor() // contract recorded by compact
    def ms(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ ms(x.getCause))
    // the SQL schema reports pk/version NOT NULL, so the log must never
    // accept a null there — the inline write-side filter raises and the
    // staged batch never commits
    val batchesBefore = MergeOnRead.deltaBatches(spark, dir).size
    val nullVer = intercept[Exception](MergeOnRead.merge(spark, dir,
      Seq(("kN", "p1", null.asInstanceOf[java.lang.Long], 5L, "insert"))
        .toDF("id", "province_id", "ver", "amount_cents", "op")))
    assert(ms(nullVer).exists(_.contains("NULL in pk/version")), s"got ${ms(nullVer)}")
    val missing = intercept[IllegalArgumentException](MergeOnRead.merge(spark, dir,
      Seq(("kM", "p1", 7L)).toDF("id", "province_id", "amount_cents")))
    assert(missing.getMessage.contains("lacks contract column"), missing.getMessage)
    assert(MergeOnRead.deltaBatches(spark, dir).size == batchesBefore,
      "a refused batch must leave no committed delta")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$dir` " +
      "WHERE id IN ('kN','kM')").as[Long].head() == 0L)
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
