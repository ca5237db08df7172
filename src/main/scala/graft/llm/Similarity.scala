package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.functions.{dot_long, norm_sq_long, quantize_vec, sign_proj_bucket}
import graft.io.Tables

/** Similarity search over an embedding column (Array[Float]).
  *
  * Determinism design: embeddings are quantized to integer milli-units
  * (floor(x*1000)) before any arithmetic. Integer dot products and
  * norms are exact and addition-order-independent, so similarity values
  * are bit-identical across Spark, the DuckDB oracle, and any cluster
  * topology — float accumulation order can never flip a top-k rank.
  *
  * Scale path: bruteForceTopK broadcasts the (small) query set and
  * streams the corpus — one pass, no corpus shuffle, embarrassingly
  * parallel. lshTopK adds sign-random-projection bucketing so each
  * query only scans its bucket (IVF-style), trading recall for a
  * ~2^planes scan reduction.
  */
object Similarity {

  /** (vec_id, q: array<long> quantized, n: long squared-norm).
    * quantize/norm/dot run as native Catalyst expressions
    * (graft.functions.VectorExprs) — the interpreted higher-order
    * equivalents (transform/aggregate/zip_with) cost one lambda call
    * per element and dominated the benchmark.
    */
  private def quantized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir).select(
      col("vec_id"),
      quantize_vec(col("embedding"), 1000).as("q"))
      .withColumn("n", norm_sq_long(col("q")))

  /** Brute-force cosine top-k of the corpus for each query vector
    * (query set = vec_id < numQueries). Rank ties broken by vec_id.
    */
  def bruteForceTopK(spark: SparkSession, sfDir: String,
                     numQueries: Int = 20, k: Int = 10): DataFrame = {
    val vecs = quantized(spark, sfDir)
    val queries = vecs.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qv"), col("n").as("qn"))
    val corpus = vecs.select(col("vec_id").as("c_id"), col("q").as("cv"), col("n").as("cn"))
    val scored = corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("dot", dot_long(col("qv"), col("cv")))
      .withColumn("sim", col("dot").cast("double") / sqrt((col("qn") * col("cn")).cast("double")))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("c_id"), col("rnk").cast("long").as("rnk"), col("sim"))
  }

  /** LSH-bucketed approximate top-k: queries only scan their own
    * bucket (sign-random-projection coarse quantizer with hyperplanes
    * derived deterministically from xxhash — no stored codebook).
    * Recall measured vs bruteForceTopK in DedupSpec.
    */
  def lshTopK(spark: SparkSession, sfDir: String,
              numQueries: Int = 20, k: Int = 10, planes: Int = 4): DataFrame = {
    val vecs = quantized(spark, sfDir)
      .withColumn("bucket", sign_proj_bucket(col("q"), planes))
    val queries = vecs.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qv"), col("n").as("qn"), col("bucket"))
    val corpus = vecs.select(col("vec_id").as("c_id"), col("q").as("cv"),
      col("n").as("cn"), col("bucket"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("dot", dot_long(col("qv"), col("cv")))
      .withColumn("sim", col("dot").cast("double") / sqrt((col("qn") * col("cn")).cast("double")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("c_id"), col("rnk").cast("long").as("rnk"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity floor,
    * for a bounded query slab (id_a < slab) vs the whole corpus — the
    * chunked-scan shape a 100 TB near-dup sweep actually runs (each
    * slab broadcasts; the corpus streams once per slab). The documented
    * scale path replaces the slab loop with lshTopK-style bucketing.
    * Threshold 0.3 because the synthetic embeddings are near-orthogonal
    * (max cos ≈ 0.48): emits a small deterministic pair set.
    */
  def cosineNearDup(spark: SparkSession, sfDir: String,
                    threshold: Double = 0.3, slab: Int = 200): DataFrame = {
    val vecs = quantized(spark, sfDir)
    val a = broadcast(vecs.filter(col("vec_id") < slab)
      .select(col("vec_id").as("id_a"), col("q").as("qa"), col("n").as("na")))
    val b = vecs.select(col("vec_id").as("id_b"), col("q").as("qb"), col("n").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot", dot_long(col("qa"), col("qb")))
      .withColumn("sim", col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
