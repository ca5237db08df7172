package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: pre-shuffle facts once at write time so
  * every subsequent join/aggregation on the bucket key runs
  * shuffle-free (SURVEY.md §4 / the "partitioning & shuffle" posture).
  *
  * At 100 TB this is the difference between re-shuffling 100 TB per
  * join and never shuffling it again: land fact tables bucketed by
  * their join key (order key for order-grain facts), and Catalyst
  * plans SortMergeJoin with both sides' outputPartitioning already
  * satisfying the requirement — zero Exchange.
  */
object Bucketing {

  /** Write df as a bucketed managed table (bucket pruning + co-located
    * joins). Spark requires saveAsTable for bucket metadata.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Run `body` with partially-clustered SPJ distribution ON: a
    * co-located join's hot bucket fans out across its file-range
    * splits (one task per split on the bigger side, the smaller
    * side's matching partition replicated) instead of capping the
    * join at one task per bucket — the runtime rescue AQE's skew-join
    * cannot provide once SPJ has elided the exchange it operates on.
    * SCOPED, not a session default, because Spark disables
    * shuffle-one-side SPJ (the [[MergeOnRead]] big-delta path, SQL
    * `bucket(n, pk)` shuffles into a layout) while the conf is on —
    * the two optimizations are per-query exclusive in Spark itself.
    * Replication limits which join types fan out (inner/semi/anti and
    * one-sided outers; a full outer silently keeps the grouped form —
    * correct, just ungrouped-rescue-free).
    */
  def withPartialClustering[T](spark: SparkSession)(body: => T): T = {
    val k = "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
    val old = spark.conf.getOption(k)
    spark.conf.set(k, "true")
    try body
    finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  /** Co-located PK join of two same-bucketed [[Upsert]] tables through
    * the DSv2 bucket reader ([[graft.sources.UpsertBucketSource]]):
    * reads both sides with their placement reported and adds the
    * `__bucket` equality the planner needs to elide the exchange.
    * `keys` maps left-PK → right-PK column names. Mismatched layouts
    * degrade to a plain shuffle join — never wrong rows. The result
    * keeps both sides' columns (left `__bucket` retained as the join
    * key; select what you need above).
    */
  def colocatedJoin(spark: SparkSession, leftDir: String, rightDir: String,
                    keys: Seq[(String, String)],
                    joinType: String = "inner"): DataFrame = {
    val a = graft.sources.UpsertBucketSource.read(spark, leftDir).as("l")
    val b = graft.sources.UpsertBucketSource.read(spark, rightDir).as("r")
    val pkCond = keys.map { case (lc, rc) =>
      org.apache.spark.sql.functions.col(s"l.$lc") ===
        org.apache.spark.sql.functions.col(s"r.$rc")
    }.reduce(_ && _)
    // the bucket equality is only VALID when both sides hash the SAME
    // key into the same bucket id: equal bucket counts AND the join
    // keys being exactly each table's recorded placement pk (same
    // columns, same order — placement hashes the -joined pk in
    // recorded order). Anything else (a different key, a reordered
    // composite, a snapshot layout with no recorded pk) falls back to
    // the plain pk join — a normal shuffle, never dropped rows.
    val bucket = graft.sources.UpsertBucketSource.BucketCol
    val ll = Upsert.bucketLayout(spark, leftDir)
    val rl = Upsert.bucketLayout(spark, rightDir)
    val sameLayout = ll.numBuckets == rl.numBuckets &&
      ll.pk.nonEmpty && ll.pk == keys.map(_._1) && rl.pk == keys.map(_._2)
    val cond =
      if (sameLayout)
        pkCond && org.apache.spark.sql.functions.col(s"l.$bucket") ===
          org.apache.spark.sql.functions.col(s"r.$bucket")
      else pkCond
    a.join(b, cond, joinType)
  }
}
