package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField}
import graft.SparkSpec
import graft.io.{MergeOnRead, SchemaEvolutionException}

/** ALTER TABLE parity for merge-on-read roots (round-12 gap: the
  * catalog routed MOR ALTERs into Upsert's manifest path, which threw
  * "table not found" for a table that exists).
  *
  *  - ADD COLUMNS / DROP COLUMN are metadata-only contract rewrites:
  *    no delta batch or base file is touched (the only evolution a
  *    100 TB delta log can afford).
  *  - Every read reconciles against the declared schema: dropped
  *    columns vanish even though old batches still hold them; a fresh
  *    ADD surfaces as typed NULLs before any file carries it.
  *  - Tombstones bind writers: a batch carrying a dropped column — an
  *    old-shape producer — refuses loudly instead of resurrecting
  *    stale values.
  *  - pk/version/deleteFlag columns are load-bearing for READ-time LWW
  *    resolution, so dropping them refuses immediately (unlike CoW,
  *    where the pk drop only poisons the next merge).
  */
class MorAlterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogReady: Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[UpsertCatalog].getName)

  private val pk = Seq("id")

  /** Compacted MOR table (contract + schema recorded) with one live
    * delta on top: ids k1..k20 ver 1 (src='a'), k1 corrected ver 2.
    */
  private def mkMor(): String = {
    val root = Files.createTempDirectory("mor_alter").toString
    val dir = s"$root/t"
    MergeOnRead.merge(spark, dir,
      (1 to 20).map(i => (s"k$i", 1L, i.toLong, "a", "insert"))
        .toDF("id", "ver", "cents", "src", "op"))
    MergeOnRead.compact(spark, dir, pk, "ver", deleteFlagCol = Some("op"),
      numBuckets = 4)
    MergeOnRead.merge(spark, dir,
      Seq(("k1", 2L, 101L, "b", "update")).toDF("id", "ver", "cents", "src", "op"))
    dir
  }

  private def readT(dir: String) =
    MergeOnRead.read(spark, dir, pk, "ver", Some("op"))

  test("ADD COLUMNS is metadata-only: legacy rows surface typed NULL, new batches fill it") {
    val dir = mkMor()
    val deltasBefore = MergeOnRead.deltaBatches(spark, dir).map(_._2).toSet
    MergeOnRead.addColumns(spark, dir,
      Seq(StructField("note", StringType), StructField("n2", LongType)))
    assert(MergeOnRead.deltaBatches(spark, dir).map(_._2).toSet == deltasBefore,
      "ADD COLUMNS must not touch the delta log")
    val r = readT(dir)
    assert(r.schema("note").dataType == StringType)
    assert(r.schema("n2").dataType == LongType)
    assert(r.filter(col("note").isNotNull || col("n2").isNotNull).count() == 0)
    // a post-ADD batch carrying the column resolves normally
    MergeOnRead.merge(spark, dir,
      Seq(("k2", 2L, 202L, "a", "update", "adjusted", 9L))
        .toDF("id", "ver", "cents", "src", "op", "note", "n2"))
    val k2 = readT(dir).filter($"id" === "k2")
      .select("cents", "note", "n2").as[(Long, String, Long)].head()
    assert(k2 == ((202L, "adjusted", 9L)))
    // and legacy rows still read NULL beside it
    assert(readT(dir).filter($"id" === "k3").select("note").head().isNullAt(0))
  }

  test("ADD refusals: existing name, case-insensitive duplicate, NOT NULL, no contract") {
    val dir = mkMor()
    val e1 = intercept[SchemaEvolutionException] {
      MergeOnRead.addColumns(spark, dir, Seq(StructField("cents", LongType)))
    }
    assert(e1.getMessage.contains("already exists"))
    val e2 = intercept[SchemaEvolutionException] {
      MergeOnRead.addColumns(spark, dir, Seq(StructField("CENTS", LongType)))
    }
    assert(e2.getMessage.contains("already exists"))
    intercept[IllegalArgumentException] {
      MergeOnRead.addColumns(spark, dir,
        Seq(StructField("x", LongType, nullable = false)))
    }
    // a contractless root has nowhere durable to record the evolution
    val bare = s"${Files.createTempDirectory("mor_alter_bare")}/t"
    MergeOnRead.merge(spark, bare, Seq(("k1", 1L)).toDF("id", "ver"))
    val e3 = intercept[SchemaEvolutionException] {
      MergeOnRead.addColumns(spark, bare, Seq(StructField("x", LongType)))
    }
    assert(e3.getMessage.contains("no recorded contract"))
  }

  test("DROP COLUMN tombstones: reads hide it, writers refuse it, re-add refuses, compact survives it") {
    val dir = mkMor()
    MergeOnRead.dropColumns(spark, dir, Seq("src"))
    // reads stop surfacing the column immediately — both resolve paths
    assert(!readT(dir).columns.contains("src"))
    assert(!MergeOnRead.lookup(spark, dir, "id", Seq("k1"), "ver", Some("op"),
      numBuckets = 4).columns.contains("src"))
    // content resolution is untouched (k1's ver-2 correction still wins)
    assert(readT(dir).filter($"id" === "k1").select("cents").as[Long].head() == 101L)
    assert(readT(dir).count() == 20)
    // an old-shape producer still sending the column refuses loudly
    val e1 = intercept[SchemaEvolutionException] {
      MergeOnRead.merge(spark, dir,
        Seq(("k9", 3L, 9L, "zzz", "update")).toDF("id", "ver", "cents", "src", "op"))
    }
    assert(e1.getMessage.contains("DROPPED"))
    // re-adding the name would resurrect stale values
    val e2 = intercept[SchemaEvolutionException] {
      MergeOnRead.addColumns(spark, dir, Seq(StructField("src", StringType)))
    }
    assert(e2.getMessage.contains("dropped"))
    // compaction folds the reconciled content: the new base is
    // physically free of the column, and the tombstone SURVIVES the
    // compact's own contract re-record
    MergeOnRead.merge(spark, dir,
      Seq(("k21", 1L, 21L, "insert")).toDF("id", "ver", "cents", "op"))
    MergeOnRead.compact(spark, dir, pk, "ver", deleteFlagCol = Some("op"),
      numBuckets = 4)
    assert(MergeOnRead.droppedSet(spark, dir) == Set("src"))
    assert(!readT(dir).columns.contains("src"))
    assert(readT(dir).count() == 21)
    intercept[SchemaEvolutionException] {
      MergeOnRead.addColumns(spark, dir, Seq(StructField("src", StringType)))
    }
  }

  test("DROP refusals: pk, version column, delete flag, unknown column") {
    val dir = mkMor()
    val e1 = intercept[SchemaEvolutionException] {
      MergeOnRead.dropColumns(spark, dir, Seq("id"))
    }
    assert(e1.getMessage.contains("primary key"))
    val e2 = intercept[SchemaEvolutionException] {
      MergeOnRead.dropColumns(spark, dir, Seq("ver"))
    }
    assert(e2.getMessage.contains("version column"))
    val e3 = intercept[SchemaEvolutionException] {
      MergeOnRead.dropColumns(spark, dir, Seq("op"))
    }
    assert(e3.getMessage.contains("delete-flag"))
    val e4 = intercept[SchemaEvolutionException] {
      MergeOnRead.dropColumns(spark, dir, Seq("nope"))
    }
    assert(e4.getMessage.contains("not in the table schema"))
  }

  test("SQL ALTER TABLE routes to the contract path; catalog schema tracks the evolution") {
    catalogReady
    val dir = mkMor()
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (note STRING)")
    val post = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(post.columns.contains("note"))
    assert(post.filter(col("note").isNotNull).count() == 0)
    // INSERT INTO the evolved shape, then read the value back via SQL
    spark.sql(s"""INSERT INTO graft.`$dir` (id, ver, cents, src, op, note)
                  VALUES ('k2', CAST(2 AS BIGINT), CAST(222 AS BIGINT),
                          'a', 'update', 'adj')""")
    assert(spark.sql(
      s"SELECT note FROM graft.`$dir` WHERE id = 'k2'").as[String].head() == "adj")
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN src")
    val after = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(!after.columns.contains("src"))
    assert(after.count() == 20)
    // the refusals surface through SQL too
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN id")
    }
    assert(e.getMessage.contains("primary key"))
    // per-era time travel (r14): every evolution recorded its
    // pre-state, so each version serves its OWN schema — src (dropped
    // later) still surfaces at v1/v2 with its historical values, note
    // (added after v1) stays out of v1 but shows at v2
    val v1 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")
    assert(v1.columns.contains("src") && !v1.columns.contains("note"),
      v1.columns.mkString(","))
    // batch 1 corrected k1 to src='b'; the other 19 keep 'a'
    assert(v1.filter(col("src") === "a").count() == 19)
    assert(v1.filter(col("src") === "b").count() == 1)
    val v2 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 2")
    assert(v2.columns.contains("src") && v2.columns.contains("note"))
    assert(v2.filter(col("note") === "adj").count() == 1)
  }

  test("two evolutions at the SAME watermark: the version reads PRE-both " +
       "(contractKvAt picks the first entry — VERDICT r14 #4)") {
    catalogReady
    val dir = mkMor() // batches 0 (compacted) + 1 (k1 -> 101); watermark 1
    // back-to-back ALTERs with NO intervening batch: both history
    // entries stamp watermark 1. Version 1 committed before either, so
    // its era is the PRE-BOTH state — the FIRST entry at the shared
    // watermark, which contractKvAt's find() picks. This test PINS
    // that choice: old name, no added column.
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (note STRING)")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN cents TO amount")
    val v1 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")
    assert(v1.columns.contains("cents") && !v1.columns.contains("amount") &&
      !v1.columns.contains("note"), v1.columns.mkString(","))
    val m1 = v1.select("id", "cents").as[(String, Long)].collect().toMap
    assert(m1("k1") == 101L && m1("k2") == 2L)
    // the CURRENT read serves post-both: new name + the added column
    val cur = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(cur.columns.contains("amount") && cur.columns.contains("note") &&
      !cur.columns.contains("cents"), cur.columns.mkString(","))
    // a batch landed AFTER both evolutions reads back under them, and
    // version 1 still serves the pre-both era afterwards
    spark.sql(s"""INSERT INTO graft.`$dir` (id, ver, amount, src, op, note)
                  VALUES ('k1', CAST(3 AS BIGINT), CAST(303 AS BIGINT),
                          'c', 'update', 'adj')""")
    assert(spark.sql(s"SELECT amount FROM graft.`$dir` WHERE id = 'k1'")
      .as[Long].head() == 303L)
    assert(spark.sql(s"SELECT cents FROM graft.`$dir` VERSION AS OF 1 WHERE id = 'k1'")
      .as[Long].head() == 101L)
  }
}
