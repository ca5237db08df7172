package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, content fingerprinting.
  *
  * All per-document (embarrassingly parallel — no shuffle except final
  * small aggregates), all codegen'd expressions (no UDFs), all
  * deterministic: ratios are single int/int IEEE divisions, digests are
  * md5 over canonicalized token sets.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a")

  /** Language ID via stopword-marker counting (n-gram heuristic class).
    * The marker lexicon is deliberately tiny/deterministic so the
    * prediction is a pure function of the text — at scale this extends
    * to per-language n-gram profile tables broadcast to executors.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val stops = stopwords.map(s => s"'$s'").mkString(", ")
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("stop_ct", expr(s"size(filter(toks, t -> t in ($stops)))").cast("long"))
      .withColumn("pred_lang", when(col("stop_ct") >= 2, lit("en")).otherwise(lit("und")))
      .select(col("doc_id"), col("lang"), col("stop_ct"), col("pred_lang"))
  }

  /** Quality scoring: token counts, lexical diversity, stopword load.
    * q_score = uniq_ratio * (1 - stop_ratio) — a deterministic proxy for
    * the length/punct/stopword-ratio features the curation literature
    * uses (e.g. C4/Gopher rules).
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val stops = stopwords.map(s => s"'$s'").mkString(", ")
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("uniq_ct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("stop_ct", expr(s"size(filter(toks, t -> t in ($stops)))").cast("long"))
      .withColumn("uniq_ratio", col("uniq_ct").cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("stop_ct").cast("double") / col("n_tokens"))
      .withColumn("q_score", col("uniq_ratio") * (lit(1.0) - col("stop_ratio")))
      .select(col("doc_id"), col("n_tokens"), col("uniq_ct"), col("stop_ct"),
        col("uniq_ratio"), col("stop_ratio"), col("q_score"))
  }

  /** Token counting: whitespace tokens, alphabetic regex tokens, and a
    * BPE-ish chars/4 estimate (the standard LLM budgeting heuristic).
    */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+")).cast("long").as("alpha_tokens"),
        ceil(col("n_chars").cast("double") / 4.0).cast("long").as("approx_bpe_tokens"))

  /** Text normalization for dedup/canonicalization: lowercase,
    * whitespace collapse, trim — the canonical pre-hash transform.
    */
  def normalize(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm_text"))
      .withColumn("norm_hash", md5(col("norm_text")))

  /** Winnowing rolling-hash fingerprints (MOSS): one row per
    * (doc, fingerprint) — the join-able form for shared-run near-dup
    * detection. Native expression, no shuffle until the final explode.
    */
  def winnowFingerprints(spark: SparkSession, sfDir: String,
                         k: Int = 5, w: Int = 4): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.functions.winnow_fingerprint(
          split(col("text"), " "), k, w)).as("fp"))

  /** Greedy sequence packing (token budgeting for training runs):
    * within each source, documents pack into fixed-token bins in
    * doc_id order — pack_id = floor(preceding-cumulative-tokens /
    * maxTokens). One window cumsum, no driver loop; deterministic.
    */
  def sequencePack(spark: SparkSession, sfDir: String, maxTokens: Int = 2048): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / maxTokens).as("pack_id"))
  }

  /** End-to-end corpus curation keep-list: language gate + quality
    * gates + exact-dedup canonical + near-dup canonical — the composed
    * pipeline a pretraining corpus actually runs, as ONE declarative
    * plan Catalyst optimizes jointly.
    */
  def curateCorpus(spark: SparkSession, sfDir: String): DataFrame =
    curateCorpusWithClusters(spark, sfDir, Dedup.nearDupClusters(spark, sfDir))

  /** Curation keep-list from PRECOMPUTED near-dup clusters, so a
    * pipeline that already built the shingle pair graph (for its dedup
    * report) doesn't rebuild it here — compose as:
    *
    *   val pairs = Dedup.ngramJaccard(spark, dir).cache()
    *   val clusters = Dedup.nearDupClustersFromPairs(spark, pairs)
    *   val keep = TextAnalysis.curateCorpusWithClusters(spark, dir, clusters)
    *
    * CurationSpec pins composed == standalone.
    */
  def curateCorpusWithClusters(spark: SparkSession, sfDir: String,
                               clusters: DataFrame): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("uniq_ratio",
        size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
    val gated = docs.filter(col("n_tokens") >= 20 && col("n_tokens") <= 2000 &&
      col("uniq_ratio") >= 0.2)
    val exactCanon = gated
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val nearDupLosers = clusters
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    gated.join(exactCanon, "doc_id")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"))
  }

  /** PII redaction — the standard pre-training scrub pass (emails,
    * phone-style numbers → typed placeholder tokens), as codegen'd
    * regexp_replace/regexp_count: per-row, no shuffle, linear scan.
    * Patterns use lookaround-free syntax that behaves identically in
    * Java regex (Spark) and RE2 (DuckDB oracle).
    *
    * The synthetic corpus carries no PII, so the query plants a
    * deterministic contact line per doc (derived from doc_id — both
    * engines build the identical string) and the redaction itself is
    * oracle-checked end-to-end: counts + the hash of the scrubbed text.
    */
  def redactPii(spark: SparkSession, sfDir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\b555-[0-9]{4,}\\b"
    Tables.documents(spark, sfDir)
      .withColumn("dirty",
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-"), format_string("%04d", col("doc_id"))))
      .withColumn("clean",
        regexp_replace(regexp_replace(col("dirty"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"))
      .select(col("doc_id"),
        regexp_count(col("dirty"), lit(emailRe)).cast("long").as("email_ct"),
        regexp_count(col("dirty"), lit(phoneRe)).cast("long").as("phone_ct"),
        md5(col("clean")).as("clean_hash"))
  }

  /** Chunk-level duplication report — boilerplate detection below the
    * document granularity (the "repeated spans" pass training-data
    * pipelines run after doc-level dedup): split each doc into
    * non-overlapping `chunkTokens`-token chunks, hash each, count
    * corpus-wide occurrences. One explode + one hash-groupBy shuffle;
    * chunk hashes are 16-byte md5s so the shuffle is narrow.
    */
  def chunkDedup(spark: SparkSession, sfDir: String, chunkTokens: Int = 20): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("chunk", explode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / $chunkTokens.0d) as int) - 1)," +
          s" i -> array_join(slice(toks, i * $chunkTokens + 1, $chunkTokens), ' '))")))
      .groupBy(md5(col("chunk")).as("chunk_hash"))
      .agg(count(lit(1)).as("dup_ct"), min(col("doc_id")).as("first_doc"))

  /** Repetition signals (the Gopher/C4 rule family): how much of a doc
    * is the same bigram over and over. Per doc: bigram count, the top
    * bigram's share of all bigrams, and the duplicate-token ratio.
    * High rep2_ratio ⇒ boilerplate/spam; the downstream gate is a
    * filter on these columns. One explode + per-doc aggregate; ratios
    * are single int/int divisions (bit-exact vs oracle).
    */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame = {
    // ZERO shuffles (r15, guide §2.4 "remove shuffles outright"): the
    // signals are per-document, so the former explode → count(doc,
    // bigram) → per-doc rollup → join-back pipeline shuffled every
    // bigram of the corpus twice to compute a value each row already
    // determines alone. The native one-pass kernel (rep2_stats:
    // [n2, top2], exact token-pair identity) makes the operator
    // embarrassingly parallel — one corpus scan, no exchange, same
    // integer counts so the output is bit-identical.
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .withColumn("r2", graft.functions.functions.rep2_stats(col("toks")))
      .select(col("doc_id"),
        col("r2").getItem(0).as("n2"),
        col("r2").getItem(1).as("top2_ct"),
        (col("r2").getItem(1).cast("double") / col("r2").getItem(0)).as("rep2_ratio"),
        (lit(1.0) - size(array_distinct(col("toks"))).cast("double")
          / size(col("toks"))).as("dup_tok_ratio"))
  }

  /** Benchmark decontamination: flag corpus docs sharing ≥ minShared
    * distinct word n-grams with a benchmark set (test-set leakage
    * detection — the pass every serious pretraining pipeline runs).
    * Shingles are 64-bit xxhash64 (the native ShingleHashes kernel) so
    * the overlap join shuffles 8-byte longs; the benchmark side is
    * DISTINCT shingles of the (small) benchmark — at 100 TB it
    * broadcasts while the corpus streams once. The synthetic benchmark
    * here is every 10th doc; swap for the real eval-set table.
    */
  def decontaminate(spark: SparkSession, sfDir: String,
                    ngram: Int = 8, minShared: Long = 1L): DataFrame = {
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.functions.shingle_hashes(
          split(col("text"), " "), ngram)).as("s"))
    val bench = broadcast(sh.filter(col("doc_id") % 10 === 0)
      .select(col("s")).distinct())
    sh.filter(col("doc_id") % 10 =!= 0)
      .join(bench, "s")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }

  /** The decontamination FILTER — what a pipeline actually applies:
    * the surviving corpus after dropping every non-benchmark doc the
    * [[decontaminate]] report flags (n-gram overlap with the eval
    * set) and the eval docs themselves. Anti-join against the
    * (small, already-aggregated) flagged set; the corpus streams
    * once.
    */
  def decontaminateFilter(spark: SparkSession, sfDir: String,
                          ngram: Int = 8, minShared: Long = 1L): DataFrame = {
    val flagged = decontaminate(spark, sfDir, ngram, minShared)
      .select(col("doc_id"))
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 =!= 0) // the eval set never ships as training data
      .join(broadcast(flagged), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"))
  }

  /** Winnowing coverage gate (VERDICT r3 #3 family, covers-jaccard
    * mold): Schleimer et al.'s guarantee is DETERMINISTIC — any shared
    * token run of length ≥ w+k−1 contains one full hash window in both
    * documents, whose minimum VALUE both emit — and "docs sharing a
    * (w+k−1)-token run" is SQL-expressible. This query emits the pairs
    * that share a (w+k−1)-gram AND at least one winnow fingerprint;
    * the DuckDB oracle independently reproduces the full
    * shared-(w+k−1)-gram pair set. Hash-equal iff the rolling-hash
    * kernel never misses a guaranteed match. (The short-doc branch is
    * covered too: a doc of exactly w+k−1 tokens takes its global min
    * over exactly that one window.)
    */
  def winnowCoversRuns(spark: SparkSession, sfDir: String,
                       k: Int = 5, w: Int = 4): DataFrame = {
    val run = w + k - 1
    val grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.functions.shingle_hashes(
          split(col("text"), " "), run)).as("s"))
    // both self-joins are skew-guarded (guide §2 / VERDICT r15 #5): a
    // boilerplate (w+k−1)-gram or fingerprint shared by m docs would
    // emit m² candidate rows from a single task; detected hot values
    // take the salted two-stage path, everything else joins as before
    val nDocs = Tables.rowCount(spark, s"$sfDir/documents.parquet")
    val gramPairs = Dedup.skewGuardedEquiJoin(
        grams.select(col("doc_id").as("doc_a"), col("s")),
        grams.select(col("doc_id").as("doc_b"), col("s")),
        Seq("s"), saltBy = "doc_a", idCountBound = nDocs)
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val fps = winnowFingerprints(spark, sfDir, k, w)
    val fpPairs = Dedup.skewGuardedEquiJoin(
        fps.select(col("doc_id").as("doc_a"), col("fp")),
        fps.select(col("doc_id").as("doc_b"), col("fp")),
        Seq("fp"), saltBy = "doc_a", idCountBound = nDocs)
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    gramPairs.join(fpPairs, Seq("doc_a", "doc_b"))
  }

  /** 2^48 — the exclusive upper bound of [[u48]]. */
  val U48Range: Long = 1L << 48

  /** Deterministic uniform draw in [0, 2^48): the first 12 hex chars of
    * md5(salt ‖ key) as an integer. A pure function of the key — the
    * same doc draws the same value on every run, every engine, every
    * cluster size — which is what makes hash-based sampling and split
    * assignment REPRODUCIBLE (rand()-based sampling changes membership
    * under retries, re-partitioning, and re-runs; at 100 TB a retry-safe
    * sample must be content-addressed). Distinct salts give independent
    * draws from the same key.
    */
  private def u48(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 12), 16, 10)
      .cast("long")

  /** Deterministic Bernoulli sample: keep a doc iff its u48 draw falls
    * below keepNum/keepDen of the range. Per-row, no shuffle, no state;
    * the keep decision is stable under re-runs and data growth (a doc's
    * membership never flips when other docs arrive — the property that
    * keeps downstream caches and eval sets valid). The integer
    * threshold compare is bit-exact across engines.
    */
  def sampleHash(spark: SparkSession, sfDir: String,
                 keepNum: Long = 1, keepDen: Long = 4): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("u48", u48(col("doc_id"), "smpl:"))
      .filter(col("u48") < lit(U48Range / keepDen * keepNum))
      .select(col("doc_id"), col("u48"))

  /** Stratified EXACT-k sample: the k smallest u48 draws per source —
    * the per-group twin of [[sampleHash]] (a rate keeps a BINOMIAL
    * count per group; audits, eval slices, and human-review queues
    * need exactly k). Content-addressed ranks keep membership
    * rerun-stable, and growing a source can only displace members
    * whose draws straddle the k-th rank — never reshuffle the sample.
    * Shape at 100 TB: one shuffle (window by source); for billion-doc
    * sources pre-prune with a broadcast per-source k-th-draw
    * over-estimate before the exact window — the final top-k stays
    * exact whenever the prune keeps ≥ k rows per source.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String, k: Int = 20,
                       prePrune: Boolean = false): DataFrame = {
    val ranked = Tables.documents(spark, sfDir)
      .withColumn("rk", u48(col("doc_id"), "strat:"))
      .select(col("doc_id"), col("source"), col("rk"))
    val base = if (!prePrune) ranked else prePruned(ranked, k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))
    base
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col("doc_id"), col("source"), col("sample_rank"))
  }

  /** The billion-doc-source path: the exact window above SORTS each
    * source's full partition, so prune first. u48 draws are uniform on
    * [0, 2^48), so rows with rk below ≈ 4·k/n of the range are a ~4×
    * over-sample of the k winners — a per-row integer compare against
    * a broadcast per-source threshold, after which the exact window
    * sorts ~4k rows per source instead of n. EXACTNESS GUARD: pruning
    * is only a shortcut if ≥ k rows survive per source; any source
    * under k (astronomically rare at safety 4, but possible — and
    * certain when k ≳ n/4) is re-included IN FULL, so the final top-k
    * is always identical to the unpruned window (spec-pinned).
    */
  private[graft] def prePruned(ranked: DataFrame, k: Int): DataFrame = {
    val safety = 4L
    val counts = ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n")) // map-side combinable; |sources| rows
    val thr = counts.withColumn("thr",
      least(lit(U48Range),
        (lit(U48Range) / col("n")) * lit(safety * k)).cast("long"))
    val pruned = ranked.join(broadcast(thr), "source")
      .filter(col("rk") <= col("thr"))
    // LEFT join from the full source list: a source pruned to ZERO rows
    // has no group in the kept counts at all — exactly the case that
    // must fall back
    val short = thr.select(col("source"))
      .join(pruned.groupBy(col("source")).agg(count(lit(1)).as("kept")),
        Seq("source"), "left_outer")
      .filter(coalesce(col("kept"), lit(0L)) < k)
      .select(col("source"))
    // usually empty: one tiny broadcast anti/semi pair, no extra pass
    pruned.join(broadcast(short), Seq("source"), "left_anti")
      .select(col("doc_id"), col("source"), col("rk"))
      .unionByName(ranked.join(broadcast(short), Seq("source"), "left_semi")
        .select(col("doc_id"), col("source"), col("rk")))
  }

  /** Train/val/test split assignment by hash bucket (90/6/4 here):
    * bucket = u48 mod 100 under its own salt, so the split is
    * independent of any sampling pass. Content-addressed splits are the
    * standard leakage guard — a doc can never migrate between train and
    * test across pipeline runs or dataset versions, and the assignment
    * needs no global coordination (no shuffle, no driver state).
    */
  def splitAssign(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bucket", (u48(col("doc_id"), "split:") % 100).cast("long"))
      .withColumn("split",
        when(col("bucket") < 90, lit("train"))
          .when(col("bucket") < 96, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("bucket"), col("split"))

  /** Domain mixing: downsample each source to hit a target mixture.
    * Target weight here derives from the source index ((idx+1)/210 over
    * src0..src19 — swap for the real mixture table); the largest
    * total size T honoring the mixture is min over sources of n_g/w_g,
    * and each source keeps min(1, w_g·T/n_g) of its docs by u48
    * threshold. Shape at 100 TB: one map-side-combinable count per
    * source (sources are few), the per-source rates broadcast back, and
    * the corpus streams once through a per-row integer compare — no
    * shuffle of the data itself. Returns the per-source audit
    * (n_docs, keep_rate, n_kept); the keep-list is the same filter
    * without the final rollup.
    */
  def domainMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val rates = mixRates(docs)
    docs.join(broadcast(rates), "source")
      .withColumn("k",
        when(mixKeeps, lit(1L)).otherwise(lit(0L)))
      .groupBy(col("source"), col("n_docs"), col("keep_rate"))
      .agg(sum(col("k")).as("n_kept"))
      .select(col("source"), col("n_docs"), col("keep_rate"), col("n_kept"))
  }

  /** The per-source keep rates the mixture implies — shared by the
    * audit ([[domainMix]]) and the keep-list ([[domainMixMembers]]) so
    * the two can never drift.
    */
  private def mixRates(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", (substring(col("source"), 4, 10).cast("int") + 1) / 210.0)
    val t = counts.agg(min(col("n_docs") / col("w")).as("t"))
    counts.crossJoin(broadcast(t))
      .withColumn("keep_rate", least(lit(1.0), col("w") * col("t") / col("n_docs")))
      .select(col("source"), col("n_docs"), col("keep_rate"))
  }

  /** A doc's keep decision under its source's `keep_rate` column. */
  private def mixKeeps: Column =
    u48(col("doc_id"), "mix:") < floor(col("keep_rate") * U48Range).cast("long")

  /** The domain-mix KEEP-LIST itself: every (doc_id, source) the
    * mixture retains — [[domainMix]]'s filter without the rollup, so
    * membership (not just per-source counts) is oracle-pinned. Same
    * 100 TB shape: tiny rate table broadcast, corpus streams once
    * through a per-row integer compare, no data shuffle.
    */
  def domainMixMembers(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs.join(broadcast(mixRates(docs)), "source")
      .where(mixKeeps)
      .select(col("doc_id"), col("source"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set —
    * an order-insensitive document signature (bag-of-words identity)
    * for cheap cross-corpus duplicate detection.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")).as("fp"))
}
