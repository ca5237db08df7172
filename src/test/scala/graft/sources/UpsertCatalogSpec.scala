package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Upsert

/** SQL surface over Upsert tables: path-addressed catalog resolution,
  * MVCC `VERSION AS OF`, storage-partitioned SQL joins, row-level DML,
  * and the DDL lifecycle (CREATE / CTAS / ALTER ADD-DROP COLUMNS /
  * DROP TABLE — with loud refusals for what the format cannot do).
  */
class UpsertCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogReady: Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[UpsertCatalog].getName)

  private def mkTable(n: Int, tag: String): String = {
    val dir = Files.createTempDirectory(s"cat_$tag").toString
    val df = spark.range(n).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      concat(lit(tag), col("id")).as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    dir
  }

  test("SQL reads resolve through the catalog; VERSION AS OF time-travels") {
    catalogReady
    val dir = mkTable(300, "a")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$dir`")
      .as[Long].head() == 300L)
    // second generation updates one key
    Upsert.merge(spark, dir, Seq(("k7", 2L, "A7")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    val gens = Upsert.manifestGens(spark, dir)
    val now = spark.sql(s"SELECT v FROM graft.`$dir` WHERE k = 'k7'")
      .as[String].head()
    val was = spark.sql(
      s"SELECT v FROM graft.`$dir` VERSION AS OF ${gens.head} WHERE k = 'k7'")
      .as[String].head()
    assert(now == "A7" && was == "a7")
  }

  test("a SQL join with __bucket in the ON clause plans with zero Exchange") {
    catalogReady
    val (dirA, dirB) = (mkTable(400, "a"), mkTable(350, "b"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        s"""SELECT x.k, x.v AS va, y.v AS vb
            FROM graft.`$dirA` x JOIN graft.`$dirB` y
            ON x.k = y.k AND x.__bucket = y.__bucket""")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SQL SPJ join must not shuffle:\n$plan")
      assert(j.count() == 350)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("catalog tables report the bucket transform: a PK-ONLY SQL join co-locates") {
    catalogReady
    val (dirA, dirB) = (mkTable(450, "a"), mkTable(420, "b"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // no __bucket anywhere — the bucket(n, pk) transform resolved
      // through the catalog's V2 function is what co-locates the zip
      val j = spark.sql(
        s"""SELECT x.k, x.v AS va, y.v AS vb
            FROM graft.`$dirA` x JOIN graft.`$dirB` y ON x.k = y.k""")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"pk-only catalog join must not shuffle:\n$plan")
      assert(j.count() == 420)
      // and a pk-only AGGREGATE is exchange-free too
      val agg = spark.sql(
        s"SELECT k, count(*) AS c FROM graft.`$dirA` GROUP BY k")
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
        s"pk aggregate must reuse the layout:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == 450)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("SQL INSERT INTO runs the table's own LWW merge; guardrails hold") {
    catalogReady
    val dir = mkTable(50, "w")
    // column-list INSERT omits __bucket; higher version supersedes
    spark.sql(
      s"INSERT INTO graft.`$dir` (k, ver, v) VALUES ('k7', 9, 'NEW7'), ('kX', 1, 'plus')")
    val after = spark.sql(s"SELECT k, v FROM graft.`$dir` WHERE k IN ('k7','kX')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after == Map("k7" -> "NEW7", "kX" -> "plus"))
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").as[Long].head() == 51)
    // a LOWER version loses — the insert is an upsert, not an append
    spark.sql(s"INSERT INTO graft.`$dir` (k, ver, v) VALUES ('k7', 2, 'stale')")
    assert(spark.sql(s"SELECT v FROM graft.`$dir` WHERE k = 'k7'")
      .as[String].head() == "NEW7")
    // a REPLAYED statement (same keys, same versions, same content) is
    // a content no-op — the retried-batch contract (VERDICT r11 #2)
    val beforeReplay = spark.sql(s"SELECT k, ver, v FROM graft.`$dir`")
      .collect().map(_.mkString("|")).toSet
    spark.sql(
      s"INSERT INTO graft.`$dir` (k, ver, v) VALUES ('k7', 9, 'NEW7'), ('kX', 1, 'plus')")
    val afterReplay = spark.sql(s"SELECT k, ver, v FROM graft.`$dir`")
      .collect().map(_.mkString("|")).toSet
    assert(afterReplay == beforeReplay, "replayed INSERT must be a content no-op")
    // INSERT OVERWRITE rebuilds the CONTENT under the recorded
    // contract: one full snapshot, LWW-resolved within the batch
    spark.sql(
      s"""INSERT OVERWRITE graft.`$dir` (k, ver, v)
          VALUES ('z1', 2, 'only'), ('z1', 1, 'stale'), ('z2', 1, 'two')""")
    assert(spark.sql(s"SELECT k, v FROM graft.`$dir` ORDER BY k")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("z1", "only"), ("z2", "two")))
    // contract survives the rebuild; pre-overwrite generations remain
    // reachable via time travel until vacuum
    val manO = Upsert.currentManifest(spark, dir).get
    assert(manO.props.get("pkCols").contains("k"))
    val prevGen = Upsert.manifestGens(spark, dir).sorted.takeRight(2).head
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$dir` VERSION AS OF $prevGen")
      .as[Long].head() == 51)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // a change-feed table refuses SQL writes (the feed must not skip)
    val fed = Files.createTempDirectory("cat_fed").toString
    Upsert.merge(spark, fed, Seq(("a", 1L, "x")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", changeLog = true)
    val e2 = intercept[Exception](spark.sql(
      s"INSERT INTO graft.`$fed` (k, ver, v) VALUES ('b', 1, 'y')"))
    assert(msgs(e2).exists(m => m != null && m.contains("change feed")))
  }

  test("SQL MERGE INTO: update/delete/insert in one statement, parity with the API delta") {
    catalogReady
    val dir = mkTable(60, "m")
    val src = Seq(
      ("k3", "patched3", "u"),  // matched → UPDATE
      ("k11", "whatever", "d"), // matched → DELETE
      ("kZ", "brandnew", "u"))  // not matched → INSERT
      .toDF("sk", "sv", "sop")
    src.createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING dml_src s ON t.k = s.sk
          WHEN MATCHED AND s.sop = 'd' THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = s.sv
          WHEN NOT MATCHED THEN INSERT (k, ver, v) VALUES (s.sk, 1, s.sv)""")
    val after = spark.sql(s"SELECT k, v FROM graft.`$dir`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after("k3") == "patched3")
    assert(!after.contains("k11"), "MERGE DELETE must remove the key")
    assert(after("kZ") == "brandnew")
    assert(after.size == 60) // 60 - 1 deleted + 1 inserted
    // untouched keys intact
    assert(after("k5") == "m5" && after("k59") == "m59")
  }

  test("MERGE INTO with NOT MATCHED BY SOURCE: the full three-clause matrix") {
    catalogReady
    val dir = mkTable(10, "nbs")
    // source covers k0..k4; k5..k9 are NOT MATCHED BY SOURCE
    Seq(("k0", "up0"), ("k1", "up1"), ("k2", "up2"), ("k3", "up3"),
      ("k4", "up4"), ("kNEW", "new"))
      .toDF("sk", "sv").createOrReplaceTempView("nbs_src")
    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING nbs_src s ON t.k = s.sk
          WHEN MATCHED THEN UPDATE SET v = s.sv
          WHEN NOT MATCHED THEN INSERT (k, ver, v) VALUES (s.sk, 1, s.sv)
          WHEN NOT MATCHED BY SOURCE AND t.k = 'k7' THEN DELETE
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'orphaned'""")
    val after = spark.sql(s"SELECT k, v FROM graft.`$dir`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (0 to 4).foreach(i => assert(after(s"k$i") == s"up$i"))
    assert(after("kNEW") == "new")
    assert(!after.contains("k7"), "NOT MATCHED BY SOURCE DELETE must remove k7")
    Seq("k5", "k6", "k8", "k9").foreach(k =>
      assert(after(k) == "orphaned", s"$k must take the by-source UPDATE"))
    assert(after.size == 10) // 10 - 1 deleted + 1 inserted
  }

  test("UPDATE must not re-key: SET on a pk column refuses loudly, table unchanged") {
    catalogReady
    val dir = mkTable(20, "rk")
    def ms(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ ms(x.getCause))
    // the delta form emits one upsert row per update — a re-keying SET
    // would land the NEW key and silently leave the OLD row (a
    // duplication, the bug this guard closed); refuse with the pointer
    val e = intercept[Exception](
      spark.sql(s"UPDATE graft.`$dir` SET k = 'kX' WHERE k = 'k1'"))
    assert(ms(e).exists(_.contains("identity column")), s"got ${ms(e)}")
    val after = spark.sql(s"SELECT k FROM graft.`$dir`")
      .collect().map(_.getString(0)).toSet
    assert(after.contains("k1") && !after.contains("kX") && after.size == 20,
      "a refused re-key must leave the table untouched")
    // MERGE's UPDATE clause hits the same guard
    Seq(("k2", "kY")).toDF("sk", "nk").createOrReplaceTempView("rk_src")
    val m = intercept[Exception](spark.sql(
      s"""MERGE INTO graft.`$dir` t USING rk_src s ON t.k = s.sk
          WHEN MATCHED THEN UPDATE SET k = s.nk"""))
    assert(ms(m).exists(_.contains("identity column")), s"got ${ms(m)}")
  }

  test("SQL UPDATE and DELETE rewrite only touched buckets; rows exact") {
    catalogReady
    val dir = mkTable(80, "u")
    val genBefore = Upsert.manifestGens(spark, dir).last
    spark.sql(s"UPDATE graft.`$dir` SET v = concat(v, '!') WHERE k IN ('k2', 'k40')")
    val afterUpdate = spark.sql(
      s"SELECT v FROM graft.`$dir` WHERE k IN ('k2', 'k40') ORDER BY k")
      .as[String].collect().toSeq
    assert(afterUpdate == Seq("u2!", "u40!"))
    spark.sql(s"DELETE FROM graft.`$dir` WHERE v = 'u7'")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").as[Long].head() == 79)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir` WHERE k = 'k7'")
      .as[Long].head() == 0)
    // bucket pruning: the DML generations re-reference untouched
    // buckets' files verbatim (no full rewrite)
    val manBefore = Upsert.manifestAt(spark, dir, genBefore).get
    val manAfter = Upsert.currentManifest(spark, dir).get
    val reused = manBefore.files.count { case (b, fs) =>
      manAfter.files.get(b).contains(fs)
    }
    assert(reused > 0, "DML must re-reference untouched buckets, not rewrite the table")
    // versionCol is untouched by imperative DML — a later API merge
    // with a higher version still supersedes
    Upsert.merge(spark, dir, Seq(("k2", 9L, "api2")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    assert(spark.sql(s"SELECT v FROM graft.`$dir` WHERE k = 'k2'")
      .as[String].head() == "api2")
  }

  test("row-level DML guardrails: change-feed tables refuse; writer lease serializes") {
    catalogReady
    val fed = Files.createTempDirectory("cat_fed_dml").toString
    Upsert.merge(spark, fed, Seq(("a", 1L, "x")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", changeLog = true)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    val e = intercept[Exception](spark.sql(
      s"DELETE FROM graft.`$fed` WHERE k = 'a'"))
    assert(msgs(e).exists(m => m != null && m.contains("change feed")), s"got: ${msgs(e)}")
    // the apply path takes the table's writer lease: a held lease
    // aborts the DML loudly instead of racing the manifest
    val dir = mkTable(10, "l")
    graft.io.Upsert.withCompositeLease(spark, dir) {
      val e2 = intercept[Exception](spark.sql(
        s"DELETE FROM graft.`$dir` WHERE k = 'k1'"))
      assert(msgs(e2).exists(m => m != null && m.contains("lease")), s"got: ${msgs(e2)}")
    }
    // and after release it succeeds
    spark.sql(s"DELETE FROM graft.`$dir` WHERE k = 'k1'")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").as[Long].head() == 9)
  }

  test("the V2 bucket function mirrors the placement hash bit-exactly") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.connector.catalog.functions.ScalarFunction
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val bound = BucketFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("k", StringType),
      StructField("i", LongType)))).asInstanceOf[ScalarFunction[Integer]]
    for (k <- Seq("a", "k123", "", "é中"); i <- Seq(0L, 99L, -5L)) {
      val row = InternalRow(8, UTF8String.fromString(k), i)
      assert(bound.produceResult(row) == Upsert.bucketOfKey(s"$k$i", 8),
        s"mismatch for ($k, $i)")
    }
    // a null pk part vanishes exactly as concat_ws drops null args
    assert(bound.produceResult(InternalRow(8, null, 7L)) ==
      Upsert.bucketOfKey("7", 8))
    // unsupported types refuse to bind — the table then reports the
    // identity form instead of a transform the mirror can't honor
    intercept[UnsupportedOperationException](BucketFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("d", DoubleType)))))
  }

  test("TIMESTAMP AS OF resolves by commit stamp; pre-history fails loudly") {
    catalogReady
    val dir = mkTable(50, "t")
    Thread.sleep(5) // distinct millisecond stamps
    Upsert.merge(spark, dir, Seq(("k7", 2L, "T7")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    val hist = Upsert.history(spark, dir).collect()
    val tsOf = hist.map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    val Seq(g1, g2) = Upsert.manifestGens(spark, dir).sorted
    // timestamp_millis keeps the probe exact and timezone-independent
    def vAt(ms: Long): String = spark.sql(
      s"SELECT v FROM graft.`$dir` TIMESTAMP AS OF timestamp_millis(${ms}L) " +
        "WHERE k = 'k7'").as[String].head()
    assert(vAt(tsOf(g1)) == "t7") // at gen1's stamp: pre-merge value
    assert(vAt(tsOf(g2)) == "T7") // at gen2's stamp: merged value
    assert(vAt(tsOf(g2) + 60000) == "T7") // the future reads latest
    // a timestamp before the table existed is an error naming the
    // earliest resolvable commit — never a silent empty read
    val early = intercept[Exception](vAt(tsOf(g1) - 60000))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(early).exists(_.contains("precedes every retained snapshot")))
  }

  test("history lists retained snapshots newest-first with operation labels") {
    val dir = mkTable(40, "h")
    Upsert.merge(spark, dir, Seq(("k3", 2L, "H3")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    Upsert.compactBuckets(spark, dir, pk = Seq("k"), maxFilesPerBucket = 0)
    val rows = Upsert.history(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sortBy(-_))
    val byOp = rows.map(r => r.getLong(0) -> r.getString(2)).sortBy(_._1).map(_._2)
    assert(byOp.toSeq == Seq("create", "merge", "compact"))
    // commit stamps never decrease along generations (single writer)
    val ts = rows.sortBy(_.getLong(0)).map(_.getTimestamp(1).getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    assert(rows.forall(_.getInt(4) > 0)) // num_files
    assert(rows.forall(_.getString(5) == "k")) // pk_columns
  }

  test("SQL CREATE TABLE commits the contract; INSERT INTO binds to it") {
    catalogReady
    val dir = Files.createTempDirectory("cat_ddl").toString + "/t"
    spark.sql(
      s"""CREATE TABLE graft.`$dir` (k STRING, ver BIGINT, v STRING)
          PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('versionCol'='ver')""")
    // empty but fully contracted: schema, pk, versionCol, buckets
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 0)
    val h = Upsert.history(spark, dir).collect()
    assert(h.map(_.getString(2)).toSeq == Seq("create"))
    assert(h.head.getString(5) == "k" && h.head.getString(6) == "ver")
    spark.sql(s"INSERT INTO graft.`$dir` (k, ver, v) VALUES ('a', 1, 'x'), ('b', 1, 'y')")
    // INSERT is the recorded LWW merge: higher version wins, lower loses
    spark.sql(s"INSERT INTO graft.`$dir` (k, ver, v) VALUES ('a', 3, 'hi'), ('a', 2, 'lo')")
    val rows = spark.sql(s"SELECT k, v FROM graft.`$dir` ORDER BY k")
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(("a", "hi"), ("b", "y")))
    // CREATE is not idempotent: a second creator refuses
    val dup = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`$dir` (k STRING, ver BIGINT)
          PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('versionCol'='ver')"""))
    assert(dup.getMessage.toUpperCase.contains("ALREADY_EXISTS") ||
      dup.getMessage.toLowerCase.contains("already exists"))
    // missing versionCol refuses with the reason
    val noVc = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`${dir}_novc` (k STRING, ver BIGINT)
          PARTITIONED BY (bucket(8, k))"""))
    assert(noVc.getMessage.contains("versionCol") ||
      Option(noVc.getCause).exists(_.getMessage.contains("versionCol")))
    // a zero-bucket contract would make every later write fail far
    // from the cause — refused at CREATE
    val zeroB = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`${dir}_zb` (k STRING, ver BIGINT)
          PARTITIONED BY (bucket(0, k)) TBLPROPERTIES ('versionCol'='ver')"""))
    assert(zeroB.getMessage.contains("numBuckets") ||
      Option(zeroB.getCause).exists(_.getMessage.contains("numBuckets")))
  }

  test("CTAS creates contract and rows in one statement; table co-locates") {
    catalogReady
    val src = mkTable(300, "s")
    val dir = Files.createTempDirectory("cat_ctas").toString + "/t"
    spark.sql(
      s"""CREATE TABLE graft.`$dir`
          PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('versionCol'='ver')
          AS SELECT k, ver, upper(v) AS v FROM graft.`$src`""")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").as[Long].head() == 300)
    assert(spark.sql(s"SELECT v FROM graft.`$dir` WHERE k = 'k7'")
      .as[String].head() == "S7")
    // the created table reports the same bucket(8, k) placement the
    // source has: a pk-only join of the two is exchange-free
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        s"SELECT x.k FROM graft.`$src` x JOIN graft.`$dir` y ON x.k = y.k")
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(j.count() == 300)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("SQL snapshot diff: two VERSION AS OF reads of one table join with zero Exchange") {
    catalogReady
    val dir = mkTable(200, "g")
    Upsert.merge(spark, dir,
      Seq(("k5", 2L, "G5"), ("kNew", 1L, "plus")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    val Seq(g1, g2) = Upsert.manifestGens(spark, dir).sorted.takeRight(2)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val diff = spark.sql(
        s"""SELECT coalesce(a.k, b.k) AS k, a.v AS was, b.v AS now
            FROM graft.`$dir` VERSION AS OF $g1 a
            FULL OUTER JOIN graft.`$dir` VERSION AS OF $g2 b ON a.k = b.k
            WHERE a.v IS DISTINCT FROM b.v""")
      assert(!diff.queryExecution.executedPlan.toString.contains("Exchange"),
        s"SQL snapshot diff must be co-located:\n${diff.queryExecution.executedPlan}")
      val rows = diff.collect().map(r => (r.getString(0),
        Option(r.getString(1)), Option(r.getString(2)))).toSet
      assert(rows == Set(("k5", Some("g5"), Some("G5")),
        ("kNew", None, Some("plus"))))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("DESCRIBE TABLE EXTENDED surfaces the recorded contract") {
    catalogReady
    val dir = mkTable(20, "d")
    val props = spark.sql(s"SHOW TBLPROPERTIES graft.`$dir`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("pk").contains("k"))
    assert(props.get("versionCol").contains("ver"))
    assert(props.get("numBuckets").contains("8"))
    assert(props.contains("generation"))
  }

  test("CREATE OR REPLACE TABLE swaps contract and content") {
    catalogReady
    val src = mkTable(40, "r")
    val dir = Files.createTempDirectory("cat_cor").toString + "/t"
    spark.sql(
      s"""CREATE TABLE graft.`$dir`
          PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('versionCol'='ver')
          AS SELECT k, ver, v FROM graft.`$src`""")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").as[Long].head() == 40)
    // REPLACE: new schema, new bucket count, new rows — old table gone
    spark.sql(
      s"""CREATE OR REPLACE TABLE graft.`$dir`
          PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('versionCol'='ver')
          AS SELECT k, ver, length(v) AS vlen FROM graft.`$src` WHERE k = 'k3'""")
    val rows = spark.sql(s"SELECT k, vlen FROM graft.`$dir`").collect()
    assert(rows.length == 1 && rows.head.getInt(1) == "r3".length)
    assert(Upsert.currentManifest(spark, dir).get.numBuckets(-1) == 8)
  }

  test("ALTER TABLE ADD/DROP COLUMNS is metadata-only; impossible shapes refuse") {
    catalogReady
    val dir = mkTable(60, "e")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (score DOUBLE)")
    // no file was rewritten: old rows surface NULL for the new column
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir` WHERE score IS NULL")
      .as[Long].head() == 60)
    spark.sql(s"INSERT INTO graft.`$dir` (k, ver, v, score) VALUES ('k7', 2, 'new', 0.5)")
    assert(spark.sql(s"SELECT score FROM graft.`$dir` WHERE k = 'k7'")
      .as[Double].head() == 0.5)
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN score")
    assert(!spark.table(s"graft.`$dir`").columns.contains("score"))
    // tombstone: re-adding the dropped name refuses (stale resurrection)
    val re = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (score DOUBLE)"))
    assert(re.getMessage.contains("dropped") ||
      Option(re.getCause).exists(_.getMessage.contains("dropped")))
    // RENAME is metadata-only since r13 (field-id column mapping):
    // old files keep serving the renamed column, and the catalog
    // surface reloads with the new name (RenameColumnSpec owns the
    // full matrix — this row pins the SQL ALTER route end-to-end).
    // Reading a renamed table needs the id-matching session conf.
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN v TO w")
    assert(spark.table(s"graft.`$dir`").columns.contains("w"))
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    try assert(spark.sql(s"SELECT w FROM graft.`$dir` WHERE k = 'k7'")
      .as[String].head() == "new")
    finally spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
    // a TYPE change stays physically impossible — Spark itself refuses
    // it at analysis against this catalog (NOT_SUPPORTED_CHANGE_COLUMN)
    val ty = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN ver TYPE INT"))
    assert(ty.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      ty.getMessage.contains("unsupported change"), ty.getMessage)
    // tombstones survive an INSERT OVERWRITE rebuild: the dropped name
    // cannot ride back in through the API either
    val ow = intercept[Exception](graft.io.Upsert.overwrite(spark, dir,
      Seq(("kX", 1L, "x", 1.0)).toDF("k", "ver", "w", "score")))
    assert(ow.getMessage.contains("dropped"))
  }

  test("DROP TABLE removes under the lease; missing tables raise the SQL error") {
    catalogReady
    val dir = mkTable(10, "c")
    spark.sql(s"DROP TABLE graft.`$dir`")
    assert(!Upsert.exists(spark, dir))
    val missing = intercept[Exception](
      spark.sql("SELECT * FROM graft.`/no/such/table`").collect())
    assert(missing.getMessage.toLowerCase.contains("table"))
    // a raw parquet dir is not a catalog table: DROP refuses, dir survives
    val raw = Files.createTempDirectory("cat_raw").toString
    spark.range(5).write.mode("overwrite").parquet(raw)
    intercept[Exception](spark.sql(s"DROP TABLE graft.`$raw`"))
    assert(Upsert.exists(spark, raw))
    // RENAME stays refused: identifiers are paths
    val d2 = mkTable(5, "r")
    val rn = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$d2` RENAME TO graft.`${d2}_x`"))
    assert(rn.getMessage.contains("rename") ||
      Option(rn.getCause).exists(_.getMessage.contains("rename")))
  }
}
