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
}
