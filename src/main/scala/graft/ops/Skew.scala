package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the shapes AQE can't fix alone.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most
  * sort-merge skew at runtime; salting is still needed when (a) the
  * skew is in an AGGREGATION key, or (b) a shuffled join's hot key is
  * so dominant that even split partitions overwhelm one task. Both
  * utilities are deterministic (salt from a hash of stable columns, not
  * rand()) so results are reproducible and retries are safe — rand()
  * salting breaks task-retry idempotency at scale.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial → groupBy
    * (key) final. `saltCols` should be high-cardinality stable columns
    * (e.g. the row's id) used to derive the salt.
    */
  def saltedSum(df: DataFrame, key: Column, saltFrom: Column, buckets: Int,
                value: Column): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(buckets)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("k"))
      .agg(sum(col("__partial")).as("total"))

  /** Two-phase top-N ROWS per key for a skew-hot partition key.
    * Phase 1 salts the key deterministically and takes the local top-N
    * inside each (key, salt) slice — a hot key's sort splits across
    * `buckets` tasks — then phase 2 ranks the surviving ≤ N·buckets
    * rows per key. Results are identical to the naive window whenever
    * `order` is a TOTAL order per key (tie-break on a unique column):
    * the global top-N of a union is always contained in the union of
    * per-slice top-Ns. Equality is pinned in SkewSpec.
    *
    * MEASURED caveat (`ScaleProbe skew`, 8M/20M rows, 25% on one key):
    * on this engine a `row_number ≤ n` filter already plans a
    * WindowGroupLimit — per-map-partition top-k BEFORE the shuffle, so
    * the hot key receives ≤ k·mapPartitions rows and the naive window
    * times at parity with (slightly ahead of) this form. Keep the
    * naive rank-filter where the predicate is a plain rank limit (the
    * optimizer handles it); reach for this form on engines without
    * WindowGroupLimit or when the limit predicate is computed in a way
    * the pushdown can't see.
    */
  def topNRowsPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                     saltFrom: Column, buckets: Int, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(keys.map(col) :+ col("__salt"): _*).orderBy(order: _*)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(buckets)))
      .withColumn("__lrn", row_number().over(w1))
      .filter(col("__lrn") <= n)
      .drop("__salt", "__lrn")
      .withColumn("rnk", row_number().over(w2).cast("long"))
      .filter(col("rnk") <= n)
  }

  /** Salted join of a skewed fact against a small-but-not-broadcastable
    * dim: fact side salts each row into one of `buckets`; the dim side
    * is replicated `buckets` times — shuffle pressure on the hot key
    * divides by `buckets`.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFrom: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(saltFrom), lit(buckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
