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
