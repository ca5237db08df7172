package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}
import org.apache.spark.sql.types.StructType
import graft.SparkSpec
import graft.io.Upsert

/** Driver-side runtime filtering on the DSv2 bucket scan: an In/EqualTo
  * on the single-column PK maps to buckets via the placement-hash
  * mirror and to files via the Bloom sidecars, before any task runs.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(bloom: Boolean): String = {
    val dir = Files.createTempDirectory("rtf").toString
    val df = spark.range(600).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      col("id").as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = 8, bloom = bloom)
    dir
  }

  // distinct file PATHS across all planned splits (one file may chunk
  // into several byte-range slices; pruning operates on whole files)
  private def totalFiles(parts: Array[org.apache.spark.sql.connector.read.InputPartition]): Int =
    parts.flatMap(_.asInstanceOf[UpsertBucketPartition].slices.map(_.path))
      .distinct.length

  test("runtime In on the PK empties un-hashed buckets; bloom narrows within") {
    val dir = mkTable(bloom = true)
    val table = UpsertBucketTable.load(dir)
    assert(table.pk == Seq("k"), "manifest must record the merge PK")
    val scan = new UpsertBucketScan(table, table.dataSchema, Array.empty, None)
    val before = totalFiles(scan.planInputPartitions())
    assert(before > 0)

    val keys = Seq("k7", "k250")
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("k", keys.toArray[Any])))
    val parts = scan.planInputPartitions()
    // every bucket still PLANNED (possibly with zero slices) — the
    // reported partition-value set stays valid for SPJ
    assert(parts.map(_.asInstanceOf[UpsertBucketPartition].bucket).toSet ==
      (0 until table.numBuckets).toSet)
    val after = totalFiles(parts)
    assert(after < before, s"runtime filter must drop files ($after vs $before)")
    val touched = keys.map(Upsert.bucketOfKey(_, table.numBuckets)).toSet
    parts.foreach { p0 =>
      val p = p0.asInstanceOf[UpsertBucketPartition]
      if (!touched.contains(p.bucket))
        assert(p.slices.isEmpty, s"bucket ${p.bucket} holds no key but kept files")
    }
    // and the filtered read still finds the rows (no false negative)
    val rows = UpsertBucketSource.read(spark, dir)
      .filter(col("k").isin(keys: _*)).select("v").as[Long].collect().sorted
    assert(rows.toSeq == Seq(7L, 250L))
  }

  test("EqualTo prunes to one bucket; unsupported value types leave the scan whole") {
    val dir = mkTable(bloom = false)
    val table = UpsertBucketTable.load(dir)
    val scan = new UpsertBucketScan(table, table.dataSchema, Array.empty, None)
    val before = totalFiles(scan.planInputPartitions())
    scan.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("k", "k42")))
    val parts = scan.planInputPartitions()
    val b = Upsert.bucketOfKey("k42", table.numBuckets)
    parts.foreach { p0 =>
      val p = p0.asInstanceOf[UpsertBucketPartition]
      assert(p.slices.isEmpty == (p.bucket != b))
    }
    // a filter value the canonical mapping rejects → no pruning
    val scan2 = new UpsertBucketScan(table, table.dataSchema, Array.empty, None)
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("k", java.lang.Double.valueOf(1.5))))
    assert(totalFiles(scan2.planInputPartitions()) == before)
  }

  test("pushed range filters on zone columns prune files at plan time, rows exact") {
    val dir = Files.createTempDirectory("rtf_zones").toString
    val df = spark.range(4000).select(
      col("id").as("k"), lit(1L).as("ver"),
      date_add(lit("2024-01-01").cast("date"), (col("id") / 100).cast("int")).as("d"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = 1, zoneCols = Seq("d"))
    // cluster so file ranges are disjoint
    Upsert.compactBuckets(spark, dir, pk = Seq("k"), maxFilesPerBucket = 0,
      clusterBy = Seq("d"), filesPerBucket = 8)
    val table = UpsertBucketTable.load(dir)
    assert(table.zoneCols == Seq("d"))
    val full = new UpsertBucketScan(table, table.dataSchema, Array.empty, None)
    val before = totalFiles(full.planInputPartitions())
    val lo = java.sql.Date.valueOf("2024-01-30")
    val pruned = new UpsertBucketScan(table, table.dataSchema, Array.empty, None,
      Seq(("d", Some(lo), None)))
    val after = totalFiles(pruned.planInputPartitions())
    assert(after < before, s"zone bound must drop files ($after vs $before)")
    // end-to-end: the filtered DSv2 read equals the plain filtered read
    val got = UpsertBucketSource.read(spark, dir)
      .filter(col("d") >= lit(lo)).select("k").as[Long].collect().sorted
    val want = Upsert.read(spark, dir)
      .filter(col("d") >= lit(lo)).select("k").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // IN-lists prune by their enclosing [min, max] range — a tight
    // list keeps a narrow slice of files, rows stay exact
    val ins = Seq("2024-01-05", "2024-01-07").map(java.sql.Date.valueOf)
    val inScan = new UpsertBucketScan(table, table.dataSchema, Array.empty,
      None, Seq(("d", Some(ins.head), Some(ins.last))))
    assert(totalFiles(inScan.planInputPartitions()) < before)
    val gotIn = UpsertBucketSource.read(spark, dir)
      .filter(col("d").isin(ins: _*)).select("k").as[Long].collect().sorted
    val wantIn = Upsert.read(spark, dir)
      .filter(col("d").isin(ins: _*)).select("k").as[Long].collect().sorted
    assert(gotIn.toSeq == wantIn.toSeq && gotIn.nonEmpty)
  }

  test("end-to-end: Spark injects the runtime filter on a selective dim join and I/O drops") {
    val dir = mkTable(bloom = true)
    // a dim whose filtered slice names ONE fact key
    val dim = spark.range(50).select(
      concat(lit("k"), col("id") * 7).as("dk"),
      when(col("id") === 3, lit("x")).otherwise(lit("y")).as("attr"))
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) bytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    def run(dpp: Boolean): (Long, Long, String) = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dpp.toString)
      bytes.set(0)
      spark.sparkContext.addSparkListener(l)
      try {
        val j = UpsertBucketSource.read(spark, dir)
          .join(dim.filter(col("attr") === "x"), col("k") === col("dk"))
        val n = j.count()
        Thread.sleep(1500) // listener bus is async
        (n, bytes.get(), j.queryExecution.executedPlan.toString)
      } finally {
        spark.sparkContext.removeSparkListener(l)
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.enabled")
      }
    }
    val (nOff, bOff, _) = run(dpp = false)
    val (nOn, bOn, plan) = run(dpp = true)
    assert(nOn == 1L && nOff == 1L)
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"planner must inject the runtime filter:\n$plan")
    assert(bOn < bOff,
      s"runtime pruning must cut scan bytes ($bOn vs $bOff)")
  }

  test("composite PK: cross-product of per-column In sets prunes buckets and blooms, exact rows") {
    val dir = Files.createTempDirectory("rtf2").toString
    val df = spark.range(400).select(
      concat(lit("a"), col("id") % 20).as("k1"),
      (col("id") / 20).cast("int").as("k2"),
      lit(1L).as("ver"), col("id").as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k1", "k2"), versionCol = "ver",
      numBuckets = 8, bloom = true)
    val table = UpsertBucketTable.load(dir)
    assert(table.pk == Seq("k1", "k2"))
    val scan = new UpsertBucketScan(table, table.dataSchema, Array.empty, None)
    assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("k1", "k2"))
    val before = totalFiles(scan.planInputPartitions())
    // both pk columns covered → the 2×2 cross product rebuilds the
    // -joined placement keys; buckets outside the cross product's
    // hash set keep zero slices
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("k1", Array[Any]("a3", "a7")),
      In("k2", Array[Any](Integer.valueOf(0), Integer.valueOf(12)))))
    val parts = scan.planInputPartitions()
    val after = totalFiles(parts)
    assert(after < before, s"composite runtime filter must drop files ($after vs $before)")
    val crossBuckets = (for { a <- Seq("a3", "a7"); b <- Seq(0, 12) }
      yield Upsert.bucketOfKey(a + "\u0001" + b, table.numBuckets)).toSet
    parts.foreach { p0 =>
      val p = p0.asInstanceOf[UpsertBucketPartition]
      if (!crossBuckets.contains(p.bucket))
        assert(p.slices.isEmpty, s"bucket ${p.bucket} outside the cross product kept files")
    }
    // end-to-end rows exact through the narrowed scan
    val got = UpsertBucketSource.read(spark, dir)
      .filter(col("k1").isin("a3", "a7") && col("k2").isin(0, 12))
      .select("v").as[Long].collect().sorted
    val want = Upsert.read(spark, dir)
      .filter(col("k1").isin("a3", "a7") && col("k2").isin(0, 12))
      .select("v").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("composite PK: partial column coverage or an oversized cross product leaves the scan whole") {
    val dir = Files.createTempDirectory("rtf3").toString
    val df = spark.range(200).select(
      concat(lit("x"), col("id")).as("k1"), (col("id") % 5).cast("int").as("k2"),
      lit(1L).as("ver"), col("id").as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k1", "k2"), versionCol = "ver",
      numBuckets = 4)
    val table = UpsertBucketTable.load(dir)
    val whole = {
      val s = new UpsertBucketScan(table, table.dataSchema, Array.empty, None)
      totalFiles(s.planInputPartitions())
    }
    // only k1 covered → cannot rebuild the composite placement hash
    val partial = new UpsertBucketScan(table, table.dataSchema, Array.empty, None)
    partial.filter(Array[org.apache.spark.sql.sources.Filter](In("k1", Array[Any]("x1"))))
    assert(totalFiles(partial.planInputPartitions()) == whole)
    // both covered but the cross product blows the cap → no pruning
    val big = new UpsertBucketScan(table, table.dataSchema, Array.empty, None)
    val manyA = (0 until 100).map(i => s"x$i": Any).toArray
    val manyB = (0 until 100).map(i => Integer.valueOf(i): Any).toArray
    big.filter(Array[org.apache.spark.sql.sources.Filter](
      In("k1", manyA), In("k2", manyB)))
    assert(totalFiles(big.planInputPartitions()) == whole)
  }
}
