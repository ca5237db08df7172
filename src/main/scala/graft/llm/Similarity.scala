package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** (vec_id, q: array<long> quantized, n: long squared-norm). */
  private def quantized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir).select(
      col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as long))").as("q"))
      .withColumn("n", expr("aggregate(q, 0L, (acc, v) -> acc + v * v)"))

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
      .withColumn("dot", expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
      .withColumn("sim", col("dot").cast("double") / sqrt((col("qn") * col("cn")).cast("double")))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("c_id"), col("rnk").cast("long").as("rnk"), col("sim"))
  }

  /** Sign-random-projection bucket id (LSH / IVF-style coarse quantizer).
    * Plane p (p < planes) has deterministic ±1 components derived from
    * xxhash64(p, i) — reproducible on any cluster, no stored codebook.
    */
  private def bucketExpr(planes: Int): String = {
    val bits = (0 until planes).map { p =>
      s"""if(aggregate(zip_with(q, transform(sequence(0, size(q) - 1), i -> if(xxhash64($p, i) % 2 = 0, 1L, -1L)), (a, b) -> a * b), 0L, (acc, v) -> acc + v) > 0, ${1 << p}L, 0L)"""
    }
    bits.mkString(" + ")
  }

  /** LSH-bucketed approximate top-k: queries only scan their own
    * bucket. Recall measured vs bruteForceTopK in SimilaritySpec.
    */
  def lshTopK(spark: SparkSession, sfDir: String,
              numQueries: Int = 20, k: Int = 10, planes: Int = 4): DataFrame = {
    val vecs = quantized(spark, sfDir)
      .withColumn("bucket", expr(bucketExpr(planes)))
    val queries = vecs.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qv"), col("n").as("qn"), col("bucket"))
    val corpus = vecs.select(col("vec_id").as("c_id"), col("q").as("cv"),
      col("n").as("cn"), col("bucket"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("dot", expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
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
      .withColumn("dot", expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("sim", col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
