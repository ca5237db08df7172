package graft

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import graft.llm.{IvfIndex, Similarity}
import graft.io.Upsert

/** The persisted ANN lifecycle (VERDICT r5 #1): build once, ingest
  * incrementally, serve probe-only — and answer bit-identically to the
  * fit-in-query formulation it replaces.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = graft.io.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  private def queries(n: Int = 20) = corpus.filter(col("vec_id") < n)
    .select(col("vec_id").as("q_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "c_id", "rnk", "sim").as[(Long, Long, Long, Double)]
      .collect().toSet

  test("health is job-free; maintain compacts multi-file cells and " +
       "probe results are content-identical; healthy pass is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_maint").toString
    IvfIndex.build(spark, dir, corpus.filter(col("vec_id") >= 60))
    // three ingest batches: touched cells gain a file per batch
    (0 until 3).foreach { i =>
      IvfIndex.ingest(spark, dir,
        corpus.filter(col("vec_id") >= i * 20 && col("vec_id") < (i + 1) * 20),
        batchVersion = i + 1L)
    }
    val before = IvfIndex.topK(spark, dir, queries())
      .collect().map(_.mkString("|")).sorted.toSeq

    // health must launch ZERO Spark jobs (manifest + file status only)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val h = try {
      val h0 = IvfIndex.health(spark, dir).get
      Thread.sleep(1500) // listener bus is async
      h0
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() == 0, s"health ran ${jobs.get()} Spark jobs")
    assert(h.liveFiles > 0 && h.byteImbalance >= 1.0 && h.cellsPresent > 0)
    // CoW ingest leaves per-bucket files flat but STACKS superseded
    // generations — reclaimable history is what maintenance collects
    val touched = (0 until h.nlist)
      .flatMap(c => Upsert.stats(spark, s"$dir/cell=$c"))
    assert(touched.map(_.reclaimableBytes).sum > 0,
      "three ingest batches must leave reclaimable history")

    val actions = IvfIndex.maintain(spark, dir,
      graft.io.Maintenance.Policy(maxReclaimableRatio = 0.01,
        minReclaimableBytes = 1L, keepManifests = 1))
    assert(actions.exists(_.contains("vacuum")),
      s"over-threshold cells must vacuum, got $actions")
    val afterStats = (0 until h.nlist)
      .flatMap(c => Upsert.stats(spark, s"$dir/cell=$c"))
    assert(afterStats.map(_.reclaimableBytes).sum <
      touched.map(_.reclaimableBytes).sum,
      "vacuum must collect superseded generations")
    val after = IvfIndex.topK(spark, dir, queries())
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(after == before, "maintenance must not change probe results")
    // now healthy at a sane threshold: zero actions
    assert(IvfIndex.maintain(spark, dir).isEmpty)
  }

  test("index maintained from a STREAM (foreachBatch ingest) answers " +
       "identically to the same data ingested in batch") {
    val streamDir = java.nio.file.Files.createTempDirectory("ivf_stream").toString
    val idxStream = s"$streamDir/idx"; val idxBatch = s"$streamDir/idx_batch"
    val in = s"$streamDir/in"; java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val base = corpus.filter(col("vec_id") >= 60)
    IvfIndex.build(spark, idxStream, base)
    IvfIndex.build(spark, idxBatch, base)

    // two waves of new vectors arrive as files; foreachBatch ingests
    // with batchId as the version — the same idempotent contract every
    // other sink in the engine rides
    val schema = corpus.schema
    corpus.filter(col("vec_id") < 30).write.parquet(s"$in/wave0")
    corpus.filter(col("vec_id") >= 30 && col("vec_id") < 60).write.parquet(s"$in/wave1")
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$in/wave*")
      .writeStream
      .option("checkpointLocation", s"$streamDir/ck")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        IvfIndex.ingest(spark, idxStream, batch, batchVersion = batchId); ()
      }.start()
    q.processAllAvailable(); q.stop()

    IvfIndex.ingest(spark, idxBatch, corpus.filter(col("vec_id") < 60), batchVersion = 1L)
    val streamed = rows(IvfIndex.topK(spark, idxStream, queries()))
    val batched = rows(IvfIndex.topK(spark, idxBatch, queries()))
    assert(streamed.nonEmpty && streamed == batched,
      s"streamed index ${streamed.size} rows != batch index ${batched.size}")
  }

  test("indexed topK is bit-identical to the fit-in-query path on the same corpus") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_parity").toString
    IvfIndex.build(spark, dir, corpus)
    val indexed = rows(IvfIndex.topK(spark, dir, queries()))
    val fitted = rows(Similarity.ivfTopK(spark, sf))
    assert(indexed.nonEmpty)
    assert(indexed == fitted,
      s"indexed ${indexed.size} rows != fit-in-query ${fitted.size} rows")
  }

  test("ingest assigns to the FROZEN nearest centroid; replay is an index no-op") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_ingest").toString
    val held = corpus.filter(col("vec_id") >= 100 && col("vec_id") < 120).cache()
    IvfIndex.build(spark, dir, corpus.filter(col("vec_id") < 100 || col("vec_id") >= 120))
    IvfIndex.ingest(spark, dir, held, batchVersion = 1L)

    // independently recompute each held vector's nearest frozen
    // centroid on the driver and assert the index placed it there
    val centers = Upsert.read(spark, s"$dir/centroids")
      .select("cell", "centroid").as[(Int, Seq[Long])].collect().sortBy(_._1)
    val heldQ = held.select(col("vec_id"),
        graft.functions.functions.quantize_vec(col("embedding"), 1000).as("q"))
      .as[(Long, Seq[Long])].collect()
    val expected = heldQ.map { case (id, q) =>
      // exact integer distance, ties to the lower cell — the v2 contract
      val best = centers.minBy { case (cell, c) =>
        (c.zip(q).map { case (cv, x) => val d = cv - x; d * d }.sum, cell)
      }._1
      id -> best
    }.toMap
    val placed = centers.indices.flatMap { c =>
      Upsert.readIfExists(spark, s"$dir/cell=$c").toSeq.flatMap(
        _.select("vec_id").as[Long].collect().map(_ -> c))
    }.toMap
    expected.foreach { case (id, cell) =>
      assert(placed.get(id).contains(cell),
        s"vec $id placed in ${placed.get(id)}, nearest centroid is $cell")
    }

    // replay the same batch: every cell subtable byte-stable (LWW no-op)
    def indexState() = centers.indices.flatMap(c =>
      Upsert.readIfExists(spark, s"$dir/cell=$c").toSeq.flatMap(
        _.select("vec_id", "__v").as[(Long, Long)].collect().map(c -> _))).toSet
    val before = indexState()
    IvfIndex.ingest(spark, dir, held, batchVersion = 1L)
    assert(indexState() == before, "replayed ingest changed the index")

    // queries see the ingested vectors (they can now be neighbors)
    val near = IvfIndex.topK(spark, dir, queries())
      .select("c_id").as[Long].collect().toSet
    assert((100L until 120L).exists(near.contains) || near.nonEmpty)
    held.unpersist()
  }

  test("ingest schedules a CONSTANT job count regardless of touched-cell fan-out") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_jobs").toString
    IvfIndex.build(spark, dir, corpus.filter(col("vec_id") >= 200))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    def countJobs(batch: org.apache.spark.sql.DataFrame, v: Long): Int = {
      jobs.set(0)
      spark.sparkContext.addSparkListener(l)
      try { IvfIndex.ingest(spark, dir, batch, batchVersion = v); Thread.sleep(1500) }
      finally spark.sparkContext.removeSparkListener(l)
      jobs.get()
    }
    // a narrow batch (few cells) vs a wide one (many more cells):
    // the old per-cell loop scheduled a merge chain per touched cell;
    // mergeGrouped must stay flat
    val narrow = countJobs(corpus.filter(col("vec_id") < 5), 1L)
    val wide = countJobs(corpus.filter(col("vec_id") >= 5 && col("vec_id") < 200), 2L)
    val cellsTouched = Upsert.read(spark, s"$dir/centroids").count()
    assert(cellsTouched > 2, "probe needs a multi-cell index")
    assert(wide <= narrow + 2,
      s"ingest jobs must not scale with touched cells: narrow=$narrow wide=$wide")
    // and the wide ingest actually landed its rows
    val total = (0 until 16).flatMap(c =>
      Upsert.readIfExists(spark, s"$dir/cell=$c")).map(_.count()).sum
    assert(total == corpus.count())
  }

  test("queries are probe-only: no fit, and I/O scales with nprobe, not nlist") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_probe").toString
    IvfIndex.build(spark, dir, corpus)
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    def measure(nprobe: Int): Long = {
      bytesRead.set(0)
      spark.sparkContext.addSparkListener(listener)
      try {
        IvfIndex.topK(spark, dir, queries(5), nprobe = nprobe).count()
        Thread.sleep(2000) // listener bus is async; give events time to land
      } finally spark.sparkContext.removeSparkListener(listener)
      bytesRead.get()
    }
    val narrow = measure(1)
    val full = measure(16)
    assert(narrow > 0 && full > narrow,
      s"nprobe=1 must read strictly less than nprobe=16: $narrow vs $full")
  }

  test("sq8 storage: same cell placement as milli, 1-byte codes in the lists, " +
       "probe sims bit-identical to the oracled compressed brute force") {
    val milliDir = java.nio.file.Files.createTempDirectory("ivf_milli").toString
    val sq8Dir = java.nio.file.Files.createTempDirectory("ivf_sq8").toString
    IvfIndex.build(spark, milliDir, corpus)
    IvfIndex.build(spark, sq8Dir, corpus, storage = "sq8")
    assert(IvfIndex.isBuilt(spark, sq8Dir, 16, storage = "sq8"))
    assert(!IvfIndex.isBuilt(spark, sq8Dir, 16, storage = "milli"),
      "a storage-mode mismatch must read as not-built, not mis-serve")

    // assignment happens in the shared milli space → identical cells,
    // and the sq8 lists store BinaryType codes of dim bytes
    (0 until 16).foreach { c =>
      val m = Upsert.readIfExists(spark, s"$milliDir/cell=$c")
        .map(_.select("vec_id").as[Long].collect().toSet).getOrElse(Set.empty)
      val s8 = Upsert.readIfExists(spark, s"$sq8Dir/cell=$c")
        .map(_.select("vec_id").as[Long].collect().toSet).getOrElse(Set.empty)
      assert(m == s8, s"cell $c membership differs between storage modes")
    }
    val cellDf = (0 until 16).iterator
      .flatMap(c => Upsert.readIfExists(spark, s"$sq8Dir/cell=$c")).next()
    assert(cellDf.schema("codes").dataType == org.apache.spark.sql.types.BinaryType)
    val dims = corpus.select(size(col("embedding"))).as[Int].head()
    assert(cellDf.select(length(col("codes"))).as[Int].head() == dims)

    // every (q, c, sim) the compressed index returns matches the fully
    // oracled sq8 brute-force score bit-for-bit — pruning only drops
    // candidates, never corrupts a score
    val probe = IvfIndex.topK(spark, sq8Dir, queries())
      .select(col("q_id"), col("c_id"), col("sim")).as[(Long, Long, Double)]
      .collect().toSet
    assert(probe.nonEmpty)
    val brute = Similarity.sq8TopK(spark, sf, numQueries = 20, k = 1000000)
      .select(col("q_id"), col("c_id"), col("sim")).as[(Long, Long, Double)]
      .collect().map { case (q, c, s) => (q, c) -> s }.toMap
    probe.foreach { case (q, c, s) =>
      assert(brute.get((q, c)).contains(s),
        s"probe sim for ($q,$c) = $s != brute ${brute.get((q, c))}")
    }

    // ingest encodes with the FROZEN build-time scale: the re-ingested
    // vector's codes equal its original build-time codes
    val held = corpus.filter(col("vec_id") === 150)
    IvfIndex.ingest(spark, sq8Dir, held, batchVersion = 7L)
    val reCodes = (0 until 16).flatMap(c =>
      Upsert.readIfExists(spark, s"$sq8Dir/cell=$c").toSeq.flatMap(
        _.filter(col("vec_id") === 150).select("codes").as[Array[Byte]].collect()))
    val origCodes = (0 until 16).flatMap(c =>
      Upsert.readIfExists(spark, s"$milliDir/cell=$c").toSeq.flatMap(
        _.filter(col("vec_id") === 150).select("vec_id").as[Long].collect()))
    assert(reCodes.size == 1, s"vec 150 must live in exactly one cell, got ${reCodes.size}")
    assert(origCodes.size == 1)
    val amax = corpus.agg(max(expr(
      "array_max(transform(embedding, x -> abs(cast(x as double))))"))).head().getDouble(0)
    val raw = corpus.filter(col("vec_id") === 150)
      .select("embedding").as[Seq[Float]].head()
    val manual = raw.map { x =>
      val v = math.floor(x.toDouble * 127.0 / amax + 0.5)
      (if (v > 127) 127 else if (v < -127) -127 else v.toInt).toByte
    }.toArray
    assert(java.util.Arrays.equals(reCodes.head, manual),
      "ingest must encode with the frozen build-time scale")
  }

  test("maintain() integrates the drift guard: a skewed ingest rebuilds " +
       "under the lease and probes stay brute-force-exact through the swap") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_maint_drift").toString
    val corp = corpus
    IvfIndex.build(spark, dir, corp, nlist = 8)
    // without a corpus the pass cannot retrain: drift is NOT collected
    // (codes alone cannot rebuild a quantizer), per-cell checks only
    assert(!IvfIndex.maintain(spark, dir).exists(_.startsWith("rebuild:")))
    // skewed ingest: near-copies of one vector pile into a single cell
    val dup = spark.range(100000, 102000).select(col("id").as("vec_id"))
      .crossJoin(corp.filter(col("vec_id") === 0).select(col("embedding").as("e0")))
      .select(col("vec_id"), expr(
        "transform(e0, (x, i) -> cast(x + pmod(vec_id * 31 + i, 97) / 1e3 as float))")
        .as("embedding"))
    IvfIndex.ingest(spark, dir, dup, batchVersion = 1L)
    assert(IvfIndex.health(spark, dir).get.byteImbalance > 2.0)
    val full = corp.unionByName(dup)
    // ONE maintenance entry point: the drift rebuild fires first, the
    // per-cell vacuum/compact sweep then runs over the NEW epoch
    val actions = IvfIndex.maintain(spark, dir,
      corpus = Some(full),
      rebuild = IvfIndex.RebuildPolicy(maxByteImbalance = 2.0))
    assert(actions.exists(_.startsWith("rebuild:")),
      s"maintain must collect the drift rebuild: $actions")
    // the swapped-in epoch answers EXACTLY like a FRESH build of the
    // same corpus at full probe width (nprobe = nlist = every cell
    // read — the exhaustive form): the recall contract held through
    // the swap
    val freshDir = java.nio.file.Files.createTempDirectory("ivf_maint_fresh").toString
    IvfIndex.build(spark, freshDir, full, nlist = 8)
    val got = rows(IvfIndex.topK(spark, dir, queries(), k = 5, nprobe = 8))
    val want = rows(IvfIndex.topK(spark, freshDir, queries(), k = 5, nprobe = 8))
    assert(got == want, "post-rebuild probes must match a fresh build")
    // the guard re-fires ONLY while health says so: the duplicated
    // mass is genuinely clustered, so retraining may legitimately
    // leave one heavy cell — the contract is health-driven, not
    // once-and-quiet
    val h2 = IvfIndex.health(spark, dir).get
    val again = IvfIndex.maintain(spark, dir, corpus = Some(full),
      rebuild = IvfIndex.RebuildPolicy(maxByteImbalance = 2.0))
      .exists(_.startsWith("rebuild:"))
    assert(again == (h2.byteImbalance > 2.0),
      s"rebuild firing ($again) must track health ($h2)")
  }

  test("rebuildIfImbalanced: healthy index is a zero-job no-op; skewed ingest " +
       "trips the gate, the rebuilt index equals a FRESH build of the same " +
       "corpus, and no vector survives in two cells") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_rebuild").toString
    val freshDir = java.nio.file.Files.createTempDirectory("ivf_rebuild_fresh").toString
    // evaluate the reader NOW: spark.read.parquet's schema-inference
    // footer job must not count against the healthy gate below
    val corp = corpus
    IvfIndex.build(spark, dir, corp, nlist = 8)

    // healthy: Nil actions AND zero Spark jobs (health is manifest-only)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val healthyActions = try {
      val a = IvfIndex.rebuildIfImbalanced(spark, dir, corp, nlist = 8)
      Thread.sleep(1500) // listener bus is async
      a
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(healthyActions.isEmpty, s"healthy index must not rebuild: $healthyActions")
    assert(jobs.get() == 0, s"healthy gate ran ${jobs.get()} Spark jobs")

    // skewed ingest: 2000 near-copies of one vector pile into a single
    // cell — each copy perturbed per-id (identical rows would compress
    // away in parquet and hide the byte skew this gate watches)
    val dup = spark.range(100000, 102000).select(col("id").as("vec_id"))
      .crossJoin(corp.filter(col("vec_id") === 0).select(col("embedding").as("e0")))
      .select(col("vec_id"), expr(
        "transform(e0, (x, i) -> cast(x + pmod(vec_id * 31 + i, 97) / 1e3 as float))")
        .as("embedding"))
    IvfIndex.ingest(spark, dir, dup, batchVersion = 1L)
    val h = IvfIndex.health(spark, dir).get
    assert(h.byteImbalance > 2.0, s"skew batch must imbalance the index: $h")

    val centroidsBefore = Upsert.read(spark, s"$dir/centroids")
      .select("cell", "centroid").as[(Int, Seq[Long])].collect().toSet
    val full = corp.unionByName(dup)
    val actions = IvfIndex.rebuildIfImbalanced(spark, dir, full, nlist = 8,
      policy = IvfIndex.RebuildPolicy(maxByteImbalance = 2.0))
    assert(actions.exists(_.startsWith("rebuild:")), s"gate must fire: $actions")

    // the quantizer actually retrained (the skew mass pulls centroids)
    val centroidsAfter = Upsert.read(spark, s"$dir/centroids")
      .select("cell", "centroid").as[(Int, Seq[Long])].collect().toSet
    assert(centroidsAfter != centroidsBefore, "rebuild must refresh centroids")

    // recall gate stays green on the rebuilt index: bit-identical to a
    // FRESH build of the same corpus (same seed → same quantizer), so
    // no stale cell content survives the replace
    IvfIndex.build(spark, freshDir, full, nlist = 8)
    val rebuilt = rows(IvfIndex.topK(spark, dir, queries(), k = 10, nprobe = 8))
    val fresh = rows(IvfIndex.topK(spark, freshDir, queries(), k = 10, nprobe = 8))
    assert(rebuilt.nonEmpty && rebuilt == fresh,
      s"rebuilt index diverges from a fresh build: ${rebuilt.size} vs ${fresh.size} rows")

    // the rebuild switched to a fresh epoch; a vector whose cell
    // changed must not be served twice: global membership across the
    // CURRENT epoch's cells is duplicate-free
    val epoch = Upsert.currentManifest(spark, s"$dir/centroids").get
      .props("epoch").toInt
    assert(epoch > 0, "rebuild must commit a fresh epoch")
    val membership = (0 until 8).flatMap(c =>
      Upsert.readIfExists(spark, s"$dir/epoch=$epoch/cell=$c").toSeq.flatMap(
        _.select("vec_id").as[Long].collect()))
    assert(membership.size == membership.distinct.size,
      "a vec_id survives in more than one cell after rebuild")
    assert(membership.size == 2500, s"expected full corpus, got ${membership.size}")
    // keep-2: the pre-rebuild legacy cells survive exactly one rebuild
    // for in-flight readers (vacuum's retention contract, per epoch)
    assert(Upsert.readIfExists(spark, s"$dir/cell=0").isDefined,
      "previous epoch must be retained one rebuild for in-flight readers")
  }

  test("ingest holds the index-level lease: a concurrent rebuild window " +
       "rejects it loudly, and ingest-after-rebuild lands in the new epoch") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_lease").toString + "/idx"
    val corp = corpus
    IvfIndex.build(spark, dir, corp.filter(col("vec_id") >= 40), nlist = 8)

    // a writer holding the composite lease (what a rebuild holds for
    // its whole window) must make a concurrent ingest fail loudly —
    // the silent-erasure interleaving is structurally impossible now
    intercept[Upsert.ConcurrentWriterException] {
      Upsert.withCompositeLease(spark, dir) {
        IvfIndex.ingest(spark, dir, corp.filter(col("vec_id") < 20), batchVersion = 1L)
      }
    }

    // lifecycle: ingest → skew → rebuild (new epoch) → ingest again;
    // the post-rebuild batch must land in the NEW epoch and the final
    // index must answer exactly like a fresh build of the same rows
    IvfIndex.ingest(spark, dir, corp.filter(col("vec_id") < 20), batchVersion = 1L)
    val dup = spark.range(100000, 102000).select(col("id").as("vec_id"))
      .crossJoin(corp.filter(col("vec_id") === 0).select(col("embedding").as("e0")))
      .select(col("vec_id"), expr(
        "transform(e0, (x, i) -> cast(x + pmod(vec_id * 31 + i, 97) / 1e3 as float))")
        .as("embedding"))
    IvfIndex.ingest(spark, dir, dup, batchVersion = 2L)
    val rebuilt = IvfIndex.rebuildIfImbalanced(spark, dir,
      corp.filter(col("vec_id") >= 40 || col("vec_id") < 20).unionByName(dup),
      policy = IvfIndex.RebuildPolicy(maxByteImbalance = 1.1))
    assert(rebuilt.nonEmpty, "gate must fire")
    IvfIndex.ingest(spark, dir,
      corp.filter(col("vec_id") >= 20 && col("vec_id") < 40), batchVersion = 3L)

    assert(rows(IvfIndex.topK(spark, dir, queries(), k = 10, nprobe = 8)).nonEmpty,
      "post-rebuild ingest must serve")
    val epoch = Upsert.currentManifest(spark, s"$dir/centroids").get
      .props("epoch").toInt
    val served = (0 until 8).flatMap(c =>
      Upsert.readIfExists(spark, s"$dir/epoch=$epoch/cell=$c").toSeq
        .flatMap(_.select("vec_id").as[Long].collect()))
    assert(served.toSet == (corp.select("vec_id").as[Long].collect().toSet ++
      (100000L until 102000L)),
      "post-rebuild ingest must land in the current epoch exactly once")
    assert(served.size == served.distinct.size)
  }

  test("crash-mid-rebuild epoch is abandoned: reads stay on the committed " +
       "epoch, the next rebuild skips past it and retires it") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_crash").toString + "/idx"
    val corp = corpus
    IvfIndex.build(spark, dir, corp, nlist = 8)
    val before = rows(IvfIndex.topK(spark, dir, queries(), k = 10, nprobe = 8))

    // simulate a rebuild that died after writing one cell of epoch 1
    // but before the centroids commit: a poisoned row that must NEVER
    // be served (its vec_id would be a novel top-k hit if read)
    import graft.functions.functions.{norm_sq_long, quantize_vec}
    val poison = corp.limit(1).select(lit(999999L).as("vec_id"),
      col("embedding"))
    Upsert.merge(spark,
      s"$dir/epoch=1/cell=0",
      poison.select(col("vec_id"),
        quantize_vec(col("embedding"), 1000).as("q"))
        .withColumn("n", norm_sq_long(col("q")))
        .withColumn("__v", lit(0L)),
      pk = Seq("vec_id"), versionCol = "__v")

    // reads and ingest still resolve the COMMITTED epoch (0)
    val after = rows(IvfIndex.topK(spark, dir, queries(), k = 10, nprobe = 8))
    assert(after == before, "a crashed epoch's cells must be invisible")
    assert(!after.exists(_._2 == 999999L))

    // skew the index, rebuild: the new epoch must skip PAST the
    // crashed dir (never merge into it) and the crashed dir is retired
    val dup = spark.range(100000, 102000).select(col("id").as("vec_id"))
      .crossJoin(corp.filter(col("vec_id") === 0).select(col("embedding").as("e0")))
      .select(col("vec_id"), expr(
        "transform(e0, (x, i) -> cast(x + pmod(vec_id * 31 + i, 97) / 1e3 as float))")
        .as("embedding"))
    IvfIndex.ingest(spark, dir, dup, batchVersion = 1L)
    val actions = IvfIndex.rebuildIfImbalanced(spark, dir, corp.unionByName(dup),
      policy = IvfIndex.RebuildPolicy(maxByteImbalance = 1.5))
    assert(actions.nonEmpty, "gate must fire on the skewed index")
    val epoch = Upsert.currentManifest(spark, s"$dir/centroids").get
      .props("epoch").toInt
    assert(epoch > 1, s"rebuild must skip the crashed epoch 1, got $epoch")
    val served = rows(IvfIndex.topK(spark, dir, queries(), k = 10, nprobe = 8))
    assert(!served.exists(_._2 == 999999L), "poisoned crashed-epoch row served")
    assert(!new java.io.File(s"$dir/epoch=1").exists,
      "crashed epoch dir must be retired by the successful rebuild")
    // defaults came from the index's own config: nlist stayed 8
    assert(actions.exists(_.contains("nlist=8")), s"stored nlist must be reused: $actions")
  }
}
