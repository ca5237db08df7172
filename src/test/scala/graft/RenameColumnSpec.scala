package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{FieldIds, MergeOnRead, SchemaEvolutionException, Upsert}

/** Column mapping + `RENAME COLUMN` (VERDICT r12 #2).
  *
  * CoW layout: stable parquet FIELD IDS stamped on every staged
  * generation; the manifest schema is JSON (metadata-preserving) and
  * reads request columns by id — a rename is one manifest flip, old
  * and new files both resolve, and `readAt` serves each generation
  * under its own names. MOR layout: a physical→logical mapping in the
  * contract, translated at the single write door ([[MergeOnRead]]
  * validated) and the single read exit (reconcileDeclared).
  */
class RenameColumnSpec extends SparkSpec {
  import spark.implicits._

  /** Field-id MATCHING is a session conf Spark propagates into every
    * parquet reader (per-read options are clobbered), and it taxes
    * every scan — so GraftSession leaves it OFF and renamed tables
    * refuse loudly without it. The CoW rows here opt in the way a
    * rename user would; the refusal row below pins the loud failure.
    */
  private def withIdRead[T](body: => T): T = {
    val k = "spark.sql.parquet.fieldId.read.enabled"
    val prior = spark.conf.getOption(k)
    spark.conf.set(k, "true")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  private def cowRows(ids: Range, ver: Long, tag: String) =
    ids.toDF("id").select(
      concat(lit("k"), col("id")).as("k"), lit(ver).as("ver"),
      concat(lit(tag), col("id")).as("v"))

  test("CoW: rename is metadata-only; old and new files resolve; time travel keeps old names") { withIdRead {
    val dir = Files.createTempDirectory("ren_cow").toString
    Upsert.merge(spark, dir, cowRows(0 until 50, 1L, "a"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val genBefore = Upsert.currentManifest(spark, dir).get.gen
    Upsert.renameColumn(spark, dir, "v", "payload")

    // reads serve the new name over the OLD files (id matching)
    val after = Upsert.read(spark, dir)
    assert(after.columns.toSeq == Seq("k", "ver", "payload"))
    assert(after.filter(col("payload") === "a7").count() == 1)

    // a merge under the NEW name lands in the same column
    Upsert.merge(spark, dir,
      cowRows(0 until 50 by 5, 2L, "b").withColumnRenamed("v", "payload"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val merged = Upsert.read(spark, dir)
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(merged("k5") == "b5" && merged("k7") == "a7")

    // a producer still writing the OLD name refuses loudly
    val e = intercept[SchemaEvolutionException] {
      Upsert.merge(spark, dir, cowRows(0 until 3, 3L, "c"),
        pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    }
    assert(e.getMessage.contains("renamed to 'payload'"), e.getMessage)

    // time travel: the pre-rename generation serves its own name
    val old = Upsert.readAt(spark, dir, genBefore)
    assert(old.columns.toSeq == Seq("k", "ver", "v"))
    assert(old.filter(col("v") === "a7").count() == 1)

    // the SQL/DSv2 surface serves the new name and filters push
    val dsv2 = graft.sources.UpsertBucketSource.read(spark, dir)
    assert(dsv2.columns.contains("payload"))
    assert(dsv2.filter(col("payload") === "b5").count() == 1)

    // chained rename keeps resolving, and the refusal chases the chain
    Upsert.renameColumn(spark, dir, "payload", "body")
    assert(Upsert.read(spark, dir).filter(col("body") === "a7").count() == 1)
    val e2 = intercept[SchemaEvolutionException] {
      Upsert.merge(spark, dir, cowRows(0 until 3, 4L, "d"),
        pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    }
    assert(e2.getMessage.contains("renamed to 'body'"), e2.getMessage)

    // and WITHOUT the session conf, reading the renamed table refuses
    // loudly, naming the conf — never a silent NULL for old files
    val k = "spark.sql.parquet.fieldId.read.enabled"
    spark.conf.unset(k)
    val refuse =
      try intercept[IllegalStateException](Upsert.read(spark, dir).collect())
      finally spark.conf.set(k, "true")
    assert(refuse.getMessage.contains("fieldId.read.enabled"), refuse.getMessage)
  } }

  test("CoW: renaming a pk column keeps placement, lookups, and DML row ids working") { withIdRead {
    val dir = Files.createTempDirectory("ren_pk").toString
    Upsert.merge(spark, dir, cowRows(0 until 40, 1L, "a"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4, bloom = true)
    Upsert.renameColumn(spark, dir, "k", "key")
    // point lookup under the new pk name (placement hash is value-based)
    val hit = Upsert.lookup(spark, dir, "key", Seq("k3"))
    assert(hit.count() == 1)
    // merge keyed by the new name updates, not duplicates
    Upsert.merge(spark, dir,
      cowRows(3 to 3, 2L, "z").withColumnRenamed("k", "key"),
      pk = Seq("key"), versionCol = "ver", numBuckets = 4)
    assert(Upsert.read(spark, dir).filter(col("key") === "k3")
      .select("v").as[String].collect().toSeq == Seq("z3"))
    assert(Upsert.read(spark, dir).count() == 40)
  } }

  test("CoW refusals: pre-id files, collisions, tombstones") { withIdRead {
    val dir = Files.createTempDirectory("ren_refuse").toString
    Upsert.merge(spark, dir, cowRows(0 until 10, 1L, "a"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 2)
    // duplicate target
    val dup = intercept[SchemaEvolutionException](
      Upsert.renameColumn(spark, dir, "v", "ver"))
    assert(dup.getMessage.contains("already a column"))
    // unknown source
    intercept[SchemaEvolutionException](
      Upsert.renameColumn(spark, dir, "nope", "x"))
    // tombstoned target
    Upsert.dropColumns(spark, dir, Seq("v"))
    val tomb = intercept[SchemaEvolutionException](
      Upsert.renameColumn(spark, dir, "ver", "v"))
    assert(tomb.getMessage.contains("dropped"))

    // PRE-ID-ERA table: doctor the manifest to the pre-r13 shape (no
    // idGen, DDL schema without ids) — rename must refuse naming the
    // compact remedy, and a full clustered rewrite (which stamps ids)
    // then ENABLES it: the migration story
    val legacy = Files.createTempDirectory("ren_legacy").toString
    Upsert.merge(spark, legacy, cowRows(0 until 10, 1L, "a"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 2)
    val man = Upsert.currentManifest(spark, legacy).get
    val mf = new java.io.File(legacy).listFiles()
      .filter(_.getName.startsWith("_manifest-")).maxBy(_.getName)
    val doctored = scala.io.Source.fromFile(mf).getLines().map { l =>
      if (l.startsWith("#schema="))
        "#schema=" + graft.io.FieldIds.stripIds(
          Upsert.tableSchema(man).get).toDDL
      else l
    }.filterNot(l => l.startsWith("#idGen=") || l.startsWith("#maxColumnId="))
      .mkString("\n")
    java.nio.file.Files.write(mf.toPath,
      doctored.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the local FS keeps a checksum sibling; the doctored write must
    // not trip it (the fixture simulates an old writer, not corruption)
    new java.io.File(legacy, s".${mf.getName}.crc").delete()
    val pre = intercept[SchemaEvolutionException](
      Upsert.renameColumn(spark, legacy, "v", "payload"))
    assert(pre.getMessage.contains("before field-id stamping"), pre.getMessage)
    // the prescribed migration: one full clustered rewrite stamps ids
    Upsert.compactBuckets(spark, legacy, Seq("k"), maxFilesPerBucket = 0,
      clusterBy = Seq("k"))
    Upsert.renameColumn(spark, legacy, "v", "payload")
    assert(Upsert.read(spark, legacy)
      .filter(col("payload") === "a7").count() == 1)
  } }

  test("CoW: a session with field-id emission disabled refuses to stage " +
       "(the manifest must never claim ids the footers won't carry)") {
    val dir = Files.createTempDirectory("ren_wconf").toString
    val k = "spark.sql.parquet.fieldId.write.enabled"
    spark.conf.set(k, "false")
    try {
      val e = intercept[IllegalArgumentException](
        Upsert.merge(spark, dir, cowRows(0 until 5, 1L, "a"),
          pk = Seq("k"), versionCol = "ver", numBuckets = 2))
      assert(e.getMessage.contains("fieldId.write"), e.getMessage)
      assert(Upsert.currentManifest(spark, dir).isEmpty,
        "the refused merge must not have committed anything")
    } finally spark.conf.unset(k)
    // back on the default the same merge stages and commits normally
    Upsert.merge(spark, dir, cowRows(0 until 5, 1L, "a"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 2)
    assert(Upsert.read(spark, dir).count() == 5)
  }

  test("CoW: dropped column's field id is never reused") {
    val dir = Files.createTempDirectory("ren_idreuse").toString
    Upsert.merge(spark, dir, cowRows(0 until 10, 1L, "a"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 2)
    val idOfV = FieldIds.idOf(Upsert.currentManifest(spark, dir)
      .flatMap(m => graft.io.Upsert.tableSchema(m)).get.fields.find(_.name == "v").get).get
    Upsert.dropColumns(spark, dir, Seq("v"))
    Upsert.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val schema = Upsert.currentManifest(spark, dir)
      .flatMap(m => graft.io.Upsert.tableSchema(m)).get
    val idOfW = FieldIds.idOf(schema.fields.find(_.name == "w").get).get
    assert(idOfW != idOfV, s"id $idOfV of dropped 'v' must not be reused for 'w'")
    // and the old files' v values do NOT surface under w
    assert(Upsert.read(spark, dir).filter(col("w").isNotNull).count() == 0)
  }

  private def morRows(ids: Range, ver: Long, tag: String) =
    ids.toDF("id").select(
      concat(lit("k"), col("id")).as("k"), lit(ver).as("ver"),
      concat(lit(tag), col("id")).as("v"),
      lit(null).cast("string").as("op"))

  test("MOR: rename maps at the contract; old batches, new batches, and feeds agree") {
    val dir = Files.createTempDirectory("ren_mor").toString
    MergeOnRead.recordContract(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 4)
    MergeOnRead.merge(spark, dir, morRows(0 until 30, 1L, "a"))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"), numBuckets = 4)
    MergeOnRead.renameColumn(spark, dir, "v", "payload")

    // reads serve the logical name over physical files
    val r = MergeOnRead.read(spark, dir, Seq("k"), "ver", Some("op"))
    assert(r.columns.contains("payload") && !r.columns.contains("v"))
    assert(r.filter(col("payload") === "a7").count() == 1)

    // new batches arrive under the LOGICAL name and union with old ones
    MergeOnRead.merge(spark, dir,
      morRows(0 until 30 by 5, 2L, "b").withColumnRenamed("v", "payload"))
    val merged = MergeOnRead.read(spark, dir, Seq("k"), "ver", Some("op"))
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(merged("k5") == "b5" && merged("k7") == "a7")

    // an old-shape producer refuses loudly
    val e = intercept[Exception] {
      MergeOnRead.merge(spark, dir, morRows(0 until 3, 3L, "c"))
    }
    assert(e.getMessage.contains("renamed to 'payload'"), e.getMessage)

    // compaction folds under PHYSICAL names and reads stay logical
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"), numBuckets = 4)
    val post = MergeOnRead.read(spark, dir, Seq("k"), "ver", Some("op"))
    assert(post.columns.contains("payload"))
    assert(post.select("k", "payload").as[(String, String)].collect().toMap
      .apply("k5") == "b5")

    // point lookups serve the logical name too
    val hit = MergeOnRead.lookup(spark, dir, "k", Seq("k5"), "ver", Some("op"))
    assert(hit.columns.contains("payload"))
    assert(hit.select("payload").as[String].head() == "b5")

    // identity columns refuse
    val pkRef = intercept[SchemaEvolutionException](
      MergeOnRead.renameColumn(spark, dir, "k", "key"))
    assert(pkRef.getMessage.contains("contract identity"))

    // the feed bootstrap serves logical names too
    val (_, adds) = graft.rtdw.MorChangeFeed.bootstrapAdds(spark, dir)
    assert(adds.columns.contains("payload") && !adds.columns.contains("v"))
  }

  test("CoW changeLog: rename translates feed batches; folds equal a recompute") {
    val root = Files.createTempDirectory("ren_feed").toString
    val fact = s"$root/fact"; val dws = s"$root/dws"
    def mergeOld(rows: Seq[(String, String, Long, Long)]): Unit =
      Upsert.merge(spark, fact,
        rows.toDF("id", "province_id", "ver", "amount_cents"),
        pk = Seq("id"), versionCol = "ver", changeLog = true)
    def mergeNew(rows: Seq[(String, String, Long, Long)]): Unit = withIdRead {
      Upsert.merge(spark, fact, rows.toDF("id", "province_id", "ver", "amt"),
        pk = Seq("id"), versionCol = "ver", changeLog = true)
    }
    mergeOld(Seq(("d1", "p1", 1L, 100L), ("d2", "p2", 1L, 200L)))
    mergeOld(Seq(("d1", "p1", 2L, 150L)))
    // rename is metadata-only and the feed no longer refuses it: old
    // batches translate at the read door (r14; VERDICT r13 missing #2)
    Upsert.renameColumn(spark, fact, "amount_cents", "amt")
    mergeNew(Seq(("d3", "p1", 3L, 50L), ("d2", "p2", 3L, 250L)))

    // the batch feed serves every batch under the CURRENT name
    val (changes, maxB) = graft.io.ChangeFeed.since(spark, fact, -1L).get
    assert(changes.columns.contains("amt") &&
      !changes.columns.contains("amount_cents"))
    assert(maxB == 2L)

    // delta fold across the rename boundary equals a full recompute
    def foldAndCompare(): Unit = {
      graft.rtdw.IncrementalDws.refresh(spark, fact, dws,
        groupCols = Seq("province_id"), sumCols = Seq("amt"))
      val inc = graft.rtdw.IncrementalDws.current(spark, dws).get
        .select("province_id", "amt", "row_ct")
        .as[(String, Long, Long)].collect().toSet
      val full = withIdRead {
        Upsert.read(spark, fact).groupBy("province_id")
          .agg(sum(col("amt")).as("amt"), count(lit(1)).as("row_ct"))
          .as[(String, Long, Long)].collect().toSet
      }
      assert(inc == full, s"inc=$inc full=$full")
    }
    foldAndCompare()
    // incremental continuation after the rename
    mergeNew(Seq(("d1", "p3", 4L, 75L)))
    foldAndCompare()

    // feed compaction spanning the rename boundary nets old- and
    // new-name batches into one current-name prefix; a fresh consumer
    // bootstraps from it to the same totals
    graft.io.ChangeFeed.compact(spark, fact, upTo = 2L)
    val boot = graft.io.ChangeFeed.changes(spark, fact, -1L, 3L)
    assert(boot.columns.contains("amt"))
    val byProv = boot.groupBy("province_id")
      .agg(sum(when(col(graft.io.ChangeFeed.ChangeCol) === "add", col("amt"))
        .otherwise(-col("amt"))).as("amt"))
      .as[(String, Long)].collect().toMap
    val fullMap = withIdRead {
      Upsert.read(spark, fact).groupBy("province_id")
        .agg(sum(col("amt")).as("amt")).as[(String, Long)].collect().toMap
    }
    assert(byProv == fullMap, s"boot=$byProv full=$fullMap")
  }

  test("CoW changeLog: CHAINED renames translate feed batches from every era") {
    val root = Files.createTempDirectory("ren_feed_chain").toString
    val fact = s"$root/fact"
    def mergeAs(valueCol: String, rows: Seq[(String, Long, Long)],
                idRead: Boolean): Unit = {
      def run(): Unit = Upsert.merge(spark, fact,
        rows.toDF("id", "ver", valueCol),
        pk = Seq("id"), versionCol = "ver", changeLog = true)
      if (idRead) withIdRead(run()) else run()
    }
    mergeAs("a", Seq(("d1", 1L, 10L), ("d2", 1L, 20L)), idRead = false) // era 0
    Upsert.renameColumn(spark, fact, "a", "b")
    mergeAs("b", Seq(("d3", 2L, 30L)), idRead = true)                    // era 1
    Upsert.renameColumn(spark, fact, "b", "c")
    mergeAs("c", Seq(("d1", 3L, 15L)), idRead = true)                    // era 2

    // batch path: all three eras fold into ONE current-name column
    val (changes, _) = graft.io.ChangeFeed.since(spark, fact, -1L).get
    assert(changes.columns.count(Set("a", "b", "c")) == 1 &&
      changes.columns.contains("c"), changes.columns.mkString(","))
    val net = changes.groupBy("id")
      .agg(sum(when(col(graft.io.ChangeFeed.ChangeCol) === "add", col("c"))
        .otherwise(-col("c"))).as("c"))
      .as[(String, Long)].collect().toMap
    assert(net == Map("d1" -> 15L, "d2" -> 20L, "d3" -> 30L), s"$net")

    // streaming path: a fresh consumer resolves era-0/1/2 files via
    // per-era supports under the one fixed current-name schema
    val out = s"$root/out"
    val q = graft.sources.ChangeFeedSource.read(spark, fact)
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.mode("append").parquet(out); ()
      }.start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .filter(col(graft.io.ChangeFeed.ChangeCol) === "add")
      .select("id", "c").as[(String, Long)].collect().toSet
    assert(streamed == Set(("d1", 10L), ("d2", 20L), ("d3", 30L), ("d1", 15L)),
      s"$streamed")
  }

  test("MOR: chained renames retire the intermediate name (ADVICE r13)") {
    val dir = Files.createTempDirectory("ren_mor_chain").toString
    MergeOnRead.recordContract(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 4)
    MergeOnRead.merge(spark, dir, morRows(0 until 10, 1L, "a"))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"), numBuckets = 4)
    MergeOnRead.renameColumn(spark, dir, "v", "mid")
    MergeOnRead.renameColumn(spark, dir, "mid", "payload")

    // both original physical and retired intermediate producers refuse
    val physRef = intercept[SchemaEvolutionException] {
      MergeOnRead.merge(spark, dir, morRows(0 until 2, 2L, "x"))
    }
    assert(physRef.getMessage.contains("renamed to 'payload'"), physRef.getMessage)
    val midRef = intercept[SchemaEvolutionException] {
      MergeOnRead.merge(spark, dir,
        morRows(0 until 2, 2L, "y").withColumnRenamed("v", "mid"))
    }
    assert(midRef.getMessage.contains("retired"), midRef.getMessage)

    // the retired name can be neither re-ADDed nor reused as a target
    val addRef = intercept[SchemaEvolutionException](
      MergeOnRead.addColumns(spark, dir, Seq(
        org.apache.spark.sql.types.StructField("mid",
          org.apache.spark.sql.types.StringType))))
    assert(addRef.getMessage.contains("retired"), addRef.getMessage)
    MergeOnRead.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType)))
    val tgtRef = intercept[SchemaEvolutionException](
      MergeOnRead.renameColumn(spark, dir, "extra", "mid"))
    assert(tgtRef.getMessage.contains("collides"), tgtRef.getMessage)

    // the current logical name still reads and writes fine
    MergeOnRead.merge(spark, dir,
      morRows(0 until 10 by 3, 2L, "b").withColumnRenamed("v", "payload"))
    val m = MergeOnRead.read(spark, dir, Seq("k"), "ver", Some("op"))
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(m("k3") == "b3" && m("k4") == "a4")
  }

  test("MOR: VERSION AS OF serves each era under its own names (VERDICT r13 #4)") {
    val dir = Files.createTempDirectory("ren_mor_tt").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    MergeOnRead.recordContract(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 4)
    MergeOnRead.merge(spark, dir, morRows(0 until 10, 1L, "a")) // batch 0
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"), numBuckets = 4)
    MergeOnRead.merge(spark, dir,                                // batch 1
      morRows(0 until 10 by 2, 2L, "b"))
    MergeOnRead.renameColumn(spark, dir, "v", "payload")
    MergeOnRead.merge(spark, dir,                                // batch 2
      morRows(0 until 3, 3L, "c").withColumnRenamed("v", "payload"))

    // pre-rename versions read under the PRE-rename name, with values
    val v1 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")
    assert(v1.columns.contains("v") && !v1.columns.contains("payload"),
      v1.columns.mkString(","))
    val m1 = v1.select("k", "v").as[(String, String)].collect().toMap
    assert(m1("k2") == "b2" && m1("k3") == "a3")

    // post-rename versions and the current read use the new name
    val v2 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 2")
    assert(v2.columns.contains("payload") && !v2.columns.contains("v"))
    val m2 = v2.select("k", "payload").as[(String, String)].collect().toMap
    // version 2 includes batch 2's ver-3 c-wave (k0..k2); k3 untouched
    assert(m2("k1") == "c1" && m2("k2") == "c2" && m2("k3") == "a3")
    assert(MergeOnRead.read(spark, dir, Seq("k"), "ver", Some("op"))
      .columns.contains("payload"))
  }

  test("MOR: SQL surface (MorReadRule + DML) under the renamed schema") {
    val dir = Files.createTempDirectory("ren_mor_sql").toString
    MergeOnRead.recordContract(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 4)
    MergeOnRead.merge(spark, dir, morRows(0 until 20, 1L, "a"))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"), numBuckets = 4)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN v TO payload")
    assert(spark.sql(s"SELECT payload FROM graft.`$dir` WHERE k = 'k7'")
      .as[String].head() == "a7")
    spark.sql(s"UPDATE graft.`$dir` SET payload = 'upd' WHERE k = 'k3'")
    assert(spark.sql(s"SELECT payload FROM graft.`$dir` WHERE k = 'k3'")
      .as[String].head() == "upd")
    // drop the renamed column by its logical name
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN payload")
    assert(!spark.table(s"graft.`$dir`").columns.contains("payload"))
  }
}
