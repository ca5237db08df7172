package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Upsert

/** SQL `CALL` maintenance procedures: argument binding (positional and
  * named, with defaults), the manifest-recorded contract (procedures
  * never take pk/version arguments), result relations, and parity with
  * the API entry points each one delegates to.
  */
class UpsertProceduresSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalogReady: Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[UpsertCatalog].getName)

  /** One full merge then `waves - 1` small bloom POINT merges of 5
    * FRESH keys each — a bloom-miss point batch APPENDS a file to the
    * touched buckets while preserving every existing file (the
    * full-merge and known-key point paths rewrite buckets back to one
    * file, so only fresh-key appends can make a bucket oversized), and
    * every wave stacks a generation for vacuum.
    */
  private def mkTable(n: Int, waves: Int, tag: String): String = {
    val dir = Files.createTempDirectory(s"proc_$tag").toString
    def wave(w: Int, m: Int, prefix: String): Unit = {
      val df = spark.range(m).select(
        concat(lit(prefix), col("id")).as("k"), lit(w.toLong).as("ver"),
        concat(lit(s"$tag$w-"), col("id")).as("v"))
      Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
        numBuckets = 4, bloom = true)
    }
    wave(1, n, "k")
    (2 to waves).foreach(w => wave(w, 5, s"p$w-"))
    dir
  }

  test("history and stats return metadata rows through CALL") {
    catalogReady
    val dir = mkTable(50, 3, "h")
    val hist = spark.sql(s"CALL graft.history(table => '$dir')").collect()
    assert(hist.length == 3)
    assert(hist.map(_.getString(2)).toSet == Set("create", "merge"))
    val st = spark.sql(s"CALL graft.stats('$dir')").collect()
    assert(st.length == 1)
    assert(st.head.getAs[Long]("live_files") > 0)
    assert(st.head.getAs[Int]("num_buckets") == 4)
    // discoverability: SHOW PROCEDURES lists the maintenance surface
    val listedDf = spark.sql("SHOW PROCEDURES IN graft")
    val nameIdx = listedDf.schema.fields.indexWhere(f =>
      f.dataType == org.apache.spark.sql.types.StringType &&
        f.name.toLowerCase.contains("name"))
    val listed = listedDf.collect().map(_.getString(nameIdx)).toSet
    assert(Set("history", "stats", "compact", "vacuum", "rebucket",
      "maintain", "expire_snapshots").subsetOf(listed), s"got $listed")
  }

  test("CALL graft.maintain sort_base flag controls the MOR fold's sorted staging") {
    catalogReady
    import spark.implicits._
    def mk(): String = {
      val dir = s"${Files.createTempDirectory("proc_sortbase")}/t"
      graft.io.MergeOnRead.merge(spark, dir,
        (1 to 40).map(i => (s"k$i", 1L, i.toLong)).toDF("id", "ver", "cents"))
      // record the contract WITHOUT compacting (no sorted generation
      // yet), then enough live batches to trip the default fold policy
      graft.io.MergeOnRead.recordContractLeased(spark, dir, Seq("id"), "ver",
        None, 2)
      (2 to 10).foreach(v => graft.io.MergeOnRead.merge(spark, dir,
        Seq(("k1", v.toLong, 99L)).toDF("id", "ver", "cents")))
      dir
    }
    def sortedProp(dir: String): Option[String] =
      graft.io.Upsert.currentManifest(spark, s"$dir/base")
        .flatMap(_.props.get("sortedBy"))
    val d1 = mk()
    spark.sql(s"CALL graft.maintain(table => '$d1')").collect()
    assert(sortedProp(d1).contains("id"), "default fold stages pk-sorted")
    val d2 = mk()
    spark.sql(s"CALL graft.maintain(table => '$d2', sort_base => false)").collect()
    assert(sortedProp(d2).isEmpty, "sort_base=false skips the sorted staging")
  }

  test("CALL graft.history serves merge-on-read roots: delta batches, epochs, compactions") {
    catalogReady
    import spark.implicits._
    val root = Files.createTempDirectory("proc_mor_hist").toString
    val dir = s"$root/t"
    graft.io.MergeOnRead.merge(spark, dir,
      (1 to 50).map(i => (s"k$i", 1L, i.toLong)).toDF("id", "ver", "cents"))
    graft.io.MergeOnRead.compact(spark, dir, Seq("id"), "ver", numBuckets = 4)
    graft.io.MergeOnRead.merge(spark, dir,
      Seq(("k1", 2L, 999L)).toDF("id", "ver", "cents"))
    val hist = spark.sql(s"CALL graft.history(table => '$dir')").collect()
    val ops = hist.map(_.getString(1))
    assert(ops.contains("merge") && ops.contains("compact"), ops.mkString(","))
    // versions are the time-travel axis: the live batch id 1 and the
    // compaction watermark 0 both present; commit stamps populated
    val versions = hist.filter(!_.isNullAt(0)).map(_.getLong(0)).toSet
    assert(versions.contains(1L) && versions.contains(0L), versions.toString)
    assert(hist.forall(!_.isNullAt(2)), "commit stamps must be populated")
    // the sorted-compaction detail is surfaced for the base generation
    assert(hist.exists(r => r.getString(1) == "compact" &&
      r.getString(4).contains("sortedBy=id")), hist.mkString("; "))
  }

  test("compact folds oversized buckets; pk comes from the manifest, data intact") {
    catalogReady
    val dir = mkTable(80, 5, "c")
    val filesBefore = Upsert.currentManifest(spark, dir).get
      .files.filter(_._1 >= 0).values.map(_.size).max
    assert(filesBefore > 1)
    val out = spark.sql(
      s"CALL graft.compact(table => '$dir', max_files_per_bucket => 0)").collect()
    assert(out.length == 1 && out.head.getString(0).contains("compacted"))
    val filesAfter = Upsert.currentManifest(spark, dir).get
      .files.filter(_._1 >= 0).values.map(_.size).max
    assert(filesAfter == 1)
    // every row survives the fold — the compact changed layout, not data
    val folded = Upsert.read(spark, dir)
    assert(folded.count() == 80 + 4 * 5)
    assert(folded.filter(col("k") === "k0").select(col("v"))
      .as[String].head() == "c1-0")
    assert(folded.filter(col("k") === "p5-0").select(col("v"))
      .as[String].head() == "c5-0")
    // healthy table: default threshold leaves it alone, empty result
    assert(spark.sql(s"CALL graft.compact('$dir')").collect().isEmpty)
  }

  test("vacuum drops superseded generations; rebucket re-places the layout") {
    catalogReady
    val dir = mkTable(60, 4, "v")
    assert(Upsert.manifestGens(spark, dir).size > 2)
    val out = spark.sql(
      s"CALL graft.vacuum('$dir', keep_manifests => 2)").collect()
    assert(out.length == 1 && out.head.getString(0).contains("freed"))
    assert(Upsert.manifestGens(spark, dir).size == 2)
    spark.sql(s"CALL graft.rebucket('$dir', num_buckets => 8)")
    val man = Upsert.currentManifest(spark, dir).get
    assert(man.numBuckets(-1) == 8)
    val total = 60 + 3 * 5
    assert(Upsert.read(spark, dir).count() == total)
    // SQL reads through the catalog still work under the new layout
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").as[Long].head() == total)
  }

  test("expire_snapshots retains by commit age, floored at keep_last") {
    catalogReady
    val dir = mkTable(40, 4, "x")
    assert(Upsert.manifestGens(spark, dir).size == 4)
    // cutoff in the future: everything is older, floor keeps the
    // newest keep_last (reader-safety posture shared with vacuum)
    val out = spark.sql(
      s"""CALL graft.expire_snapshots(table => '$dir',
          older_than => TIMESTAMP '2099-01-01 00:00:00', keep_last => 2)""")
      .collect()
    assert(out.head.getString(0).contains("retained 2"))
    assert(Upsert.manifestGens(spark, dir).size == 2)
    assert(Upsert.read(spark, dir).count() == 40 + 3 * 5)
    // cutoff in the past: nothing is old enough, all survive
    spark.sql(
      s"""CALL graft.expire_snapshots(table => '$dir',
          older_than => TIMESTAMP '2000-01-01 00:00:00')""")
    assert(Upsert.manifestGens(spark, dir).size == 2)
  }

  test("maintain runs the policy pass: actions when unhealthy, empty when healthy") {
    catalogReady
    val dir = mkTable(100, 12, "m")
    val acted = spark.sql(s"CALL graft.maintain('$dir')").collect()
    assert(acted.nonEmpty &&
      acted.map(_.getString(0)).exists(_.contains("compactBuckets")))
    val idle = spark.sql(s"CALL graft.maintain('$dir')").collect()
    assert(idle.isEmpty, s"healthy table must be a no-op: ${idle.mkString}")
  }

  test("maintain dispatches on layout: a merge-on-read root folds its delta backlog") {
    catalogReady
    import graft.io.MergeOnRead
    val dir = Files.createTempDirectory("proc_mor").toString
    def wave(w: Int): Unit = MergeOnRead.merge(spark, dir,
      spark.range(30).select(concat(lit("k"), col("id")).as("k"),
        lit(w.toLong).as("ver"), lit(s"w$w").as("v")))
    wave(1)
    // no recorded contract yet: the path-only policy pass refuses
    val bare = intercept[Exception](
      spark.sql(s"CALL graft.maintain('$dir')").collect())
    assert(bare.getMessage.contains("no recorded contract") ||
      Option(bare.getCause).exists(_.getMessage.contains("no recorded contract")))
    // first compact records the contract; later policy passes bind to it
    MergeOnRead.compact(spark, dir, Seq("k"), "ver")
    (2 to 11).foreach(wave) // 10 live batches > default maxDeltaBatches 8
    val acted = spark.sql(s"CALL graft.maintain('$dir')").collect()
    assert(acted.map(_.getString(0)).exists(_.contains("compact")),
      s"backlog must fold: ${acted.mkString}")
    assert(spark.sql(s"CALL graft.maintain('$dir')").collect().isEmpty)
    // winners correct after the policy-run compact
    assert(MergeOnRead.read(spark, dir, Seq("k"), "ver")
      .filter(col("v") === "w11").count() == 30)
    // stats dispatches on layout too: the backlog signal is visible
    val st = spark.sql(s"CALL graft.stats('$dir')").collect()
    assert(st.length == 1 && st.head.getAs[Int]("live_delta_batches") == 0)
    assert(st.head.getAs[Long]("base_files") > 0)
    // a contradicting contract refuses loudly
    val contra = intercept[graft.io.Upsert.TableContractException](
      MergeOnRead.compact(spark, dir, Seq("k"), "other_ver"))
    assert(contra.getMessage.contains("contradicts the recorded contract"))
    // a SQL SELECT against the contract-recorded MOR root resolves the
    // read-time content (MorTable + MorReadRule — see MorSqlReadSpec)
    val sel = spark.sql(s"SELECT v FROM graft.`$dir` WHERE k = 'k0'").collect()
    assert(sel.map(_.getString(0)).toSeq == Seq("w11"), s"got ${sel.mkString}")
  }

  test("clustered compact through CALL adopts cluster columns as zone columns") {
    catalogReady
    val dir = mkTable(120, 4, "z")
    spark.sql(
      s"""CALL graft.compact(table => '$dir', max_files_per_bucket => 0,
          cluster_by => 'v')""")
    val man = Upsert.currentManifest(spark, dir).get
    assert(man.props.get("zoneCols").contains("v"))
    // rows intact, one file per bucket
    assert(Upsert.read(spark, dir).count() == 120 + 3 * 5)
    assert(man.files.filter(_._1 >= 0).values.map(_.size).max == 1)
  }

  test("unknown procedures and missing tables fail loudly") {
    catalogReady
    val e = intercept[Exception](spark.sql("CALL graft.nonsense('/tmp/x')"))
    assert(e.getMessage.contains("not found") ||
      Option(e.getCause).exists(_.getMessage.contains("not found")))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // read-only AND mutating procedures both refuse a missing table —
    // "freed 0 files" on a typo'd path would read as a healthy table
    Seq("stats", "vacuum", "maintain",
      "expire_snapshots(table => '/no/such/table', older_than => TIMESTAMP '2099-01-01 00:00:00')")
      .foreach { p =>
        val callSql =
          if (p.contains("(")) s"CALL graft.$p"
          else s"CALL graft.$p('/no/such/table')"
        val missing = intercept[Exception](spark.sql(callSql).collect())
        assert(msgs(missing).exists(_.contains("no committed manifest")),
          s"$p must fail loudly: ${msgs(missing)}")
      }
  }
}
