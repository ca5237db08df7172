package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Upsert

/** The partition-pruned merge contract (VERDICT r1 #2), manifest
  * edition (VERDICT r3 #1): a merge batch rewrites only the buckets its
  * keys hash into; every other bucket's files are re-referenced by the
  * new manifest at their OLD paths — not rewritten, not even moved.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def manifest(dir: String) = Upsert.currentManifest(spark, dir).get

  /** CRC32 of every data file the current manifest references,
    * keyed by table-relative path.
    */
  private def crcs(dir: String): Map[String, Long] =
    manifest(dir).files.values.flatten.map { rel =>
      val c = new java.util.zip.CRC32()
      c.update(Files.readAllBytes(new File(s"$dir/$rel").toPath))
      rel -> c.getValue
    }.toMap

  private def bucketOf(key: String, n: Int = Upsert.DefaultNumBuckets): Int =
    Seq(key).toDF("v")
      .select(pmod(xxhash64(col("v")), lit(n)).cast("int")).as[Int].head()

  test("stats: live/garbage/bloom figures track merges and vacuum, with zero Spark jobs") {
    val dir = Files.createTempDirectory("upsert_stats").toString
    val rows = (1 to 200).map(i => (s"k$i", 1L, i.toLong)).toDF("id", "ver", "v")
    Upsert.merge(spark, dir, rows, pk = Seq("id"), versionCol = "ver", bloom = true)
    Upsert.merge(spark, dir,
      Seq(("k1", 2L, 99L)).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver", bloom = true)

    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val s = try {
      val s = Upsert.stats(spark, dir).get
      Thread.sleep(1000)
      s
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"stats must be metadata-only, ran $jobs jobs")

    assert(s.gen == 1 && s.snapshotsRetained == 2) // gens are 0-based
    assert(s.liveFiles == manifest(dir).allFiles.size)
    assert(s.liveBytes > 0)
    // gen-0's superseded copy of k1's bucket is MVCC history the
    // current snapshot no longer references — reclaimable by vacuum
    assert(s.reclaimableFiles > 0)
    assert(s.bloomBuckets > 0 && s.bloomBuckets <= s.liveFiles)

    Upsert.vacuum(spark, dir, keepManifests = 1)
    val after = Upsert.stats(spark, dir).get
    assert(after.snapshotsRetained == 1)
    assert(after.reclaimableFiles == 0 && after.reclaimableBytes == 0,
      s"vacuum must reclaim exactly the reported files: $after")
    assert(after.liveFiles == s.liveFiles && after.liveBytes == s.liveBytes)
  }

  test("schema evolution: new columns land without rewriting untouched buckets; " +
       "time travel keeps each generation's shape; type changes are rejected") {
    val dir = Files.createTempDirectory("upsert_evolve").toString
    Upsert.merge(spark, dir,
      (1 to 100).map(i => (s"k$i", 1L, i.toLong)).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    val before = crcs(dir)

    // batch carries a NEW column (CDC tables grow fields)
    Upsert.merge(spark, dir,
      Seq(("k1", 2L, 999L, "hello")).toDF("id", "ver", "v", "note"),
      pk = Seq("id"), versionCol = "ver")
    val evolved = Upsert.read(spark, dir)
    assert(evolved.columns.toSeq == Seq("id", "ver", "v", "note"))
    val notes = evolved.select("id", "note").as[(String, String)].collect().toMap
    assert(notes("k1") == "hello")
    assert(notes("k2") == null, "old rows must surface NULL for the new column")
    assert(evolved.count() == 100)
    // untouched buckets: same files, byte-identical (no evolution rewrite)
    val after = crcs(dir)
    before.foreach { case (rel, crc) =>
      if (after.contains(rel)) assert(after(rel) == crc, s"$rel rewritten")
    }
    assert(before.keySet.intersect(after.keySet).nonEmpty, "expected preserved files")

    // a batch MISSING an existing column: its rows get NULL there
    Upsert.merge(spark, dir,
      Seq(("k200", 1L, "fresh")).toDF("id", "ver", "note"),
      pk = Seq("id"), versionCol = "ver")
    val k200 = Upsert.read(spark, dir).filter(col("id") === "k200")
      .select("v", "note").collect().head
    assert(k200.isNullAt(0) && k200.getString(1) == "fresh")

    // time travel: gen 0 predates the column — its shape has no `note`
    assert(Upsert.readAt(spark, dir, 0).columns.toSeq == Seq("id", "ver", "v"))

    // additive only: changing a column's type must fail loudly
    val ex = intercept[IllegalArgumentException] {
      Upsert.merge(spark, dir,
        Seq(("k1", 3L, "not-a-long", "x")).toDF("id", "ver", "v", "note"),
        pk = Seq("id"), versionCol = "ver")
    }
    assert(ex.getMessage.contains("schema evolution cannot change column 'v'"))

    // point lookups see the evolved shape too (manifest schema applies)
    val hit = Upsert.lookup(spark, dir, "id", Seq("k200"))
    assert(hit.columns.contains("note") && hit.count() == 1)
  }

  test("subtractive contract: drop is metadata-only and tombstoned; rename and " +
       "case-only rename fail loudly with the column named (VERDICT r5 #7)") {
    import graft.io.SchemaEvolutionException
    val dir = Files.createTempDirectory("upsert_drop").toString
    Upsert.merge(spark, dir,
      (1 to 50).map(i => (s"k$i", 1L, i.toLong, s"n$i")).toDF("id", "ver", "v", "note"),
      pk = Seq("id"), versionCol = "ver")
    val before = crcs(dir)

    // drop: one manifest flip, zero file rewrites, column gone from reads
    Upsert.dropColumns(spark, dir, Seq("note"))
    val after = Upsert.read(spark, dir)
    assert(after.columns.toSeq == Seq("id", "ver", "v"))
    assert(after.count() == 50)
    assert(crcs(dir) == before, "drop must not rewrite any data file")

    // tombstone: re-introducing the name would resurrect values from
    // the un-rewritten files — must fail loudly, column named
    val readd = intercept[SchemaEvolutionException] {
      Upsert.merge(spark, dir,
        Seq(("k1", 2L, 1L, "ghost")).toDF("id", "ver", "v", "note"),
        pk = Seq("id"), versionCol = "ver")
    }
    assert(readd.getMessage.contains("'note'") &&
      readd.getMessage.contains("dropped"), readd.getMessage)

    // dropping a column that isn't there: loud, names the column
    val missing = intercept[SchemaEvolutionException] {
      Upsert.dropColumns(spark, dir, Seq("nope"))
    }
    assert(missing.getMessage.contains("'nope'"), missing.getMessage)

    // rename is SUPPORTED since r13 (field-id column mapping,
    // RenameColumnSpec owns the matrix); renaming onto the freshly
    // DROPPED name still refuses — the tombstone protects old files
    val ren = intercept[SchemaEvolutionException] {
      Upsert.renameColumn(spark, dir, "v", "note")
    }
    assert(ren.getMessage.contains("'note'") &&
      ren.getMessage.contains("dropped"), ren.getMessage)

    // case-only rename in a batch: the default resolver is
    // case-insensitive, so 'V' IS 'v' — treating it as a new column
    // would commit two insensitive-equal names (ADVICE r5)
    val caseOnly = intercept[SchemaEvolutionException] {
      Upsert.merge(spark, dir,
        Seq(("k1", 3L, 7L)).toDF("id", "ver", "V"),
        pk = Seq("id"), versionCol = "ver")
    }
    assert(caseOnly.getMessage.contains("'v'") &&
      caseOnly.getMessage.contains("'V'"), caseOnly.getMessage)

    // the table survives every rejected write untouched and writable
    Upsert.merge(spark, dir, Seq(("k1", 4L, 100L)).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    val k1 = Upsert.read(spark, dir).filter(col("id") === "k1")
      .select("v").as[Long].head()
    assert(k1 == 100L)
  }

  test("merge rewrites only touched buckets; untouched files identical at identical paths") {
    val dir = Files.createTempDirectory("upsert").toString + "/t"
    val base = (1 to 200).map(i => (s"k$i", 1L, s"v$i")).toDF("id", "ver", "payload")
    Upsert.merge(spark, dir, base, pk = Seq("id"), versionCol = "ver")
    val filesBefore = manifest(dir).files
    assert(filesBefore.size > 1, s"expected multiple buckets, got ${filesBefore.keySet}")
    val crcBefore = crcs(dir)

    // second merge touches exactly one key → one bucket
    Upsert.merge(spark, dir, Seq(("k7", 2L, "V7")).toDF("id", "ver", "payload"),
      pk = Seq("id"), versionCol = "ver")
    val touched = bucketOf("k7")
    val filesAfter = manifest(dir).files
    val crcAfter = crcs(dir)

    // untouched buckets: same relative paths, same bytes (the files
    // were never rewritten OR moved — the manifest re-references them)
    filesBefore.filterNot(_._1 == touched).foreach { case (b, rels) =>
      assert(filesAfter(b).sorted == rels.sorted, s"bucket $b paths changed")
      rels.foreach(r => assert(crcAfter(r) == crcBefore(r), s"$r rewritten"))
    }
    // the touched bucket points at NEW files (a fresh generation)
    assert(filesAfter(touched).toSet != filesBefore(touched).toSet,
      "touched bucket must reference fresh files")

    // merged content is correct: k7 updated, everything else intact
    val m = Upsert.read(spark, dir).select("id", "payload").as[(String, String)].collect().toMap
    assert(m("k7") == "V7" && m("k1") == "v1" && m.size == 200)
  }

  test("delete empties a bucket but the table stays readable") {
    val dir = Files.createTempDirectory("upsertdel").toString + "/t"
    val base = Seq(("a", 1L, "insert"), ("b", 1L, "insert")).toDF("id", "ver", "op")
    Upsert.merge(spark, dir, base, pk = Seq("id"), versionCol = "ver",
      deleteFlagCol = Some("op"))
    assert(Upsert.read(spark, dir).count() == 2)
    val del = Seq(("a", 2L, "delete"), ("b", 2L, "delete")).toDF("id", "ver", "op")
    Upsert.merge(spark, dir, del, pk = Seq("id"), versionCol = "ver",
      deleteFlagCol = Some("op"))
    assert(Upsert.read(spark, dir).count() == 0)
  }

  test("point lookup reads only the keys' buckets' files (manifest pruning)") {
    val dir = Files.createTempDirectory("upsertlk").toString + "/t"
    val base = (1 to 500).map(i => (s"k$i", 1L, s"v$i")).toDF("id", "ver", "payload")
    Upsert.merge(spark, dir, base, pk = Seq("id"), versionCol = "ver")
    val looked = Upsert.lookup(spark, dir, "id", Seq("k7", "k300"))
    val rows = looked.select("id", "payload").as[(String, String)].collect().toMap
    assert(rows == Map("k7" -> "v7", "k300" -> "v300"))
    // the scan's input is exactly the two target buckets' file lists —
    // pruning is driver-side and literal, no other file enters the plan
    val wantBuckets = Set(bucketOf("k7"), bucketOf("k300"))
    val allowed = manifest(dir).files.filter(e => wantBuckets.contains(e._1))
      .values.flatten.toSet
    val inputRels = looked.inputFiles.toSeq.map(f =>
      f.substring(f.indexOf("__gen=")))
    assert(inputRels.nonEmpty && inputRels.forall(allowed.contains),
      s"lookup read outside target buckets: $inputRels vs $allowed")
    val totalFiles = manifest(dir).files.values.flatten.size
    assert(inputRels.size < totalFiles, "lookup must not scan the whole table")
  }

  test("bloom sidecars: a point merge reads and rewrites only candidate files (VERDICT r2 #7)") {
    val dir = Files.createTempDirectory("upsertbloom").toString + "/t"
    // multi-file buckets via bloom-preserve ACCUMULATION: staging
    // regroups to one file per bucket per merge (r16, guide §6), so
    // four waves of DISJOINT keys each add one preserved-alongside
    // file to every bucket — 4 files per bucket, each holding
    // different keys, exactly the layout the old 4-writer-task shuffle
    // produced
    (0 until 4).foreach { w =>
      val wave = (w * 500 + 1 to w * 500 + 500)
        .map(i => (s"k$i", 1L, s"v$i")).toDF("id", "ver", "payload")
      Upsert.merge(spark, dir, wave, pk = Seq("id"), versionCol = "ver", bloom = true)
    }

    // ground truth from the committed snapshot: key → (bucket, relpath)
    def truth(): Seq[(String, Int, String)] = {
      val man = manifest(dir)
      val byBucket = man.files.toSeq.flatMap { case (b, rels) => rels.map(b -> _) }
      byBucket.flatMap { case (b, rel) =>
        spark.read.parquet(s"$dir/$rel").select("id").as[String].collect()
          .map(k => (k, b, rel))
      }
    }
    val t1 = truth()
    assert(t1.size == 2000)

    // no false negatives: every key's actual file is in its candidate set
    t1.foreach { case (k, b, rel) =>
      val Some((cand, _)) = Upsert.bloomCandidates(spark, dir, b, Seq(k))
      assert(cand.contains(rel), s"false negative: $k in $rel not in $cand")
    }

    // pick a key whose bucket holds several files and whose bloom
    // rules at least one file out
    val perBucket = t1.groupBy(_._2)
    val (key, bucket, _) = t1.find { case (k, b, _) =>
      perBucket(b).map(_._3).distinct.size > 3 && {
        val Some((_, keep)) = Upsert.bloomCandidates(spark, dir, b, Seq(k))
        keep.nonEmpty
      }
    }.get
    val Some((cand, kept)) = Upsert.bloomCandidates(spark, dir, bucket, Seq(key))
    assert(kept.nonEmpty, "expected bloom to rule out at least one file")
    val crcBefore = crcs(dir)

    // point merge on that single key with bloom pruning
    Upsert.merge(spark, dir, Seq((key, 2L, "UPDATED")).toDF("id", "ver", "payload"),
      pk = Seq("id"), versionCol = "ver", bloom = true)
    val filesNow = manifest(dir).files(bucket).toSet
    val crcAfter = crcs(dir)

    // preserved (non-candidate) files survive at the SAME paths with
    // the same bytes — they were re-referenced, never read or moved
    kept.foreach { rel =>
      assert(filesNow.contains(rel), s"preserved file $rel dropped from manifest")
      assert(crcAfter(rel) == crcBefore(rel), s"preserved file $rel was rewritten")
    }
    // candidate files were replaced in the manifest
    cand.foreach { rel => assert(!filesNow.contains(rel), s"candidate $rel still referenced") }

    // content is fully correct after the pruned merge
    val m = Upsert.read(spark, dir).select("id", "payload").as[(String, String)].collect().toMap
    assert(m(key) == "UPDATED" && m.size == 2000 && m("k1").nonEmpty)

    // the sidecars stay consistent: still no false negatives
    truth().filter(_._2 == bucket).foreach { case (k, b, rel) =>
      val Some((cand2, _)) = Upsert.bloomCandidates(spark, dir, b, Seq(k))
      assert(cand2.contains(rel), s"post-merge false negative for $k")
    }

    // lookup prunes to candidate files too: fewer inputs than the bucket holds
    val looked = Upsert.lookup(spark, dir, "id", Seq(key))
    assert(looked.select("payload").as[String].head() == "UPDATED")
    assert(looked.inputFiles.length < manifest(dir).files(bucket).size,
      s"lookup read ${looked.inputFiles.length} files, bucket has ${manifest(dir).files(bucket).size}")
  }

  test("compactBuckets collapses merge-accumulated files; content and blooms stay exact") {
    val dir = Files.createTempDirectory("upsertcompact").toString + "/t"
    Upsert.merge(spark, dir, (1 to 400).map(i => (s"k$i", 1L, s"v$i"))
      .toDF("id", "ver", "payload"),
      pk = Seq("id"), versionCol = "ver", bloom = true)
    // 6 NEW-key point merges: each bloom-preserves the bucket's files
    // and stages one new file alongside them (staging regroups to one
    // file per bucket per merge since r16, so accumulation — the thing
    // compactBuckets exists to undo — comes from preserved files, not
    // write fan-out); then 6 updates of existing keys
    (401 to 406).foreach { i =>
      Upsert.merge(spark, dir, Seq((s"k$i", 1L, s"v$i")).toDF("id", "ver", "payload"),
        pk = Seq("id"), versionCol = "ver", bloom = true)
    }
    (1 to 6).foreach { i =>
      Upsert.merge(spark, dir, Seq((s"k$i", 2L, s"V$i")).toDF("id", "ver", "payload"),
        pk = Seq("id"), versionCol = "ver", bloom = true)
    }
    def fileCounts(): Map[Int, Int] = manifest(dir).files.map { case (b, fs) => b -> fs.size }
    assert(fileCounts().values.exists(_ > 1), "point merges should accumulate files")
    val before = Upsert.read(spark, dir).select("id", "payload")
      .as[(String, String)].collect().toMap

    Upsert.compactBuckets(spark, dir, pk = Seq("id"), maxFilesPerBucket = 1)
    assert(fileCounts().values.forall(_ == 1), s"buckets not compacted: ${fileCounts()}")
    val after = Upsert.read(spark, dir).select("id", "payload")
      .as[(String, String)].collect().toMap
    assert(after == before && after("k1") == "V1" && after.size == 406)

    // blooms rebuilt consistently: still zero false negatives
    val man = manifest(dir)
    man.files.toSeq.take(8).foreach { case (b, rels) =>
      rels.foreach { rel =>
        spark.read.parquet(s"$dir/$rel").select("id").as[String].collect().take(5)
          .foreach { k =>
            val Some((cand, _)) = Upsert.bloomCandidates(spark, dir, b, Seq(k))
            assert(cand.contains(rel), s"post-compact false negative for $k")
          }
      }
    }

    // vacuum drops superseded generations but keeps every referenced file
    Upsert.vacuum(spark, dir, keepManifests = 1)
    val kept = manifest(dir).files.values.flatten.toSeq
    kept.foreach(rel => assert(new File(s"$dir/$rel").exists(), s"vacuum deleted live file $rel"))
    assert(Upsert.read(spark, dir).count() == 406)
  }

  test("bloom merge survives an all-delete batch (no staged buckets to bloom)") {
    val dir = Files.createTempDirectory("upsertbloomdel").toString + "/t"
    Upsert.merge(spark, dir, Seq(("a", 1L, "insert"), ("b", 1L, "insert"))
      .toDF("id", "ver", "op"),
      pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"), bloom = true)
    Upsert.merge(spark, dir, Seq(("a", 2L, "delete"), ("b", 2L, "delete"))
      .toDF("id", "ver", "op"),
      pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"), bloom = true)
    assert(Upsert.read(spark, dir).count() == 0)
    // and the table accepts new bloom merges afterwards
    Upsert.merge(spark, dir, Seq(("c", 3L, "insert")).toDF("id", "ver", "op"),
      pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"), bloom = true)
    assert(Upsert.read(spark, dir).select("id").as[String].collect().toSeq == Seq("c"))
  }

  test("out-of-order version loses; ties go to the update") {
    val dir = Files.createTempDirectory("upsertver").toString + "/t"
    Upsert.merge(spark, dir, Seq(("k", 5L, "new")).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    Upsert.merge(spark, dir, Seq(("k", 3L, "stale")).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    assert(Upsert.read(spark, dir).select("v").as[String].head() == "new")
    Upsert.merge(spark, dir, Seq(("k", 5L, "tie-upd")).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    assert(Upsert.read(spark, dir).select("v").as[String].head() == "tie-upd")
  }

  test("the driver-side bucket hash mirrors Spark's placement exactly") {
    val keys = (1 to 500).map(i => s"k$i") ++ Seq("", "", "多字节キー", "ab")
    val sparkSide = keys.toDF("v")
      .select(col("v"), pmod(xxhash64(col("v")), lit(16)).cast("int").as("b"))
      .as[(String, Int)].collect().toMap
    keys.foreach { k =>
      assert(Upsert.bucketOfKey(k, 16) == sparkSide(k), s"mismatch for $k")
    }
  }

  test("j_bloom_point_lookup bench head: 4-key Get reads a small fraction of " +
       "files, result == raw IN-list") {
    val root = graft.ops.Relational.bloomEventsEnsure(spark, sf)
    val keys = Seq("17", "257", "601", "911")
    val m = Upsert.currentManifest(spark, root).get
    val n = m.numBuckets(Upsert.DefaultNumBuckets)
    val candidates = keys.map(Upsert.bucketOfKey(_, n)).distinct.map { b =>
      Upsert.bloomCandidates(spark, root, b, keys) match {
        case Some((cand, _)) => cand.size
        case None => fail(s"bucket $b has no bloom sidecar")
      }
    }.sum
    val total = m.allFiles.size
    assert(candidates * 2 <= total,
      s"bloom+bucket narrowing must halve the file list at least (cand=$candidates total=$total)")
    val got = graft.ops.Relational.bloomPointLookup(spark, sf)
      .collect().map(_.mkString("|")).sorted.toSeq
    val want = graft.io.Tables.events(spark, sf)
      .filter(col("event_id").isin(17L, 257L, 601L, 911L))
      .select(col("event_id"), col("user_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("value_cents"))
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(got == want && got.size == 4)
  }

  test("lookup uses the manifest's recorded numBuckets, not the caller's guess") {
    val dir = Files.createTempDirectory("upsertnb").toString + "/t"
    Upsert.merge(spark, dir, (1 to 100).map(i => (s"k$i", 1L, s"v$i"))
      .toDF("id", "ver", "payload"),
      pk = Seq("id"), versionCol = "ver", numBuckets = 7)
    // caller passes the (wrong) default — manifest's numBuckets=7 wins
    val got = Upsert.lookup(spark, dir, "id", Seq("k42"))
      .select("payload").as[String].collect().toSeq
    assert(got == Seq("v42"))
  }

  test("point lookup on an int64 pk is EXACT past 2^53 (no double coercion)") {
    // a bare isin(strings) on a long column coerces BOTH sides to
    // DOUBLE: keys 2^53 and 2^53+1 collapse to the same double and a
    // snowflake-id lookup silently false-matches. The residual filter
    // must compare on the column's own type (or the canonical-string
    // axis), never a lossy common type.
    val dir = Files.createTempDirectory("upsert_bigpk").toString
    val base = 1L << 53
    Upsert.merge(spark, dir,
      Seq((base, 1L, "even"), (base + 1L, 1L, "odd"), (base + 3L, 1L, "three"))
        .toDF("id", "ver", "payload"),
      pk = Seq("id"), versionCol = "ver", numBuckets = 4, bloom = true)
    val got = Upsert.lookup(spark, dir, "id", Seq((base + 1L).toString))
      .select("id", "payload").as[(Long, String)].collect().toSet
    assert(got == Set((base + 1L, "odd")),
      s"expected exactly the 2^53+1 row, got $got")
    // MOR side: same contract through lookupPinned's delta filter
    val morDir = Files.createTempDirectory("mor_bigpk").toString + "/t"
    graft.io.MergeOnRead.merge(spark, morDir,
      Seq((base, 1L, "even"), (base + 1L, 1L, "odd"))
        .toDF("id", "ver", "payload"))
    val morGot = graft.io.MergeOnRead.lookup(spark, morDir, "id",
      Seq((base + 1L).toString), "ver")
      .select("id", "payload").as[(Long, String)].collect().toSet
    assert(morGot == Set((base + 1L, "odd")), s"MOR lookup got $morGot")
  }
}
