package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed upsert (the K3/K5 MERGE substitute — SURVEY.md §2.2).
  *
  * The reference terminates DWD facts in upsert-kafka / HBase puts
  * keyed by PK (SQLUtil.getUpsertKafkaSQL:46-54,
  * DimHBaseSinkFunction.java:50-104). The Spark-native design is
  * `MERGE INTO` on an ACID table format; this container ships bare
  * parquet, so we implement last-writer-wins merge as
  * read + union + rank-1-per-key + atomic directory swap. The swap
  * (write to `<dir>.tmp`, rename over) keeps readers from ever seeing
  * a half-written table. On a lakehouse deployment this entire object
  * is replaced by `MERGE INTO`; call sites don't change shape.
  */
object Upsert {

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def readIfExists(spark: SparkSession, dir: String): Option[DataFrame] =
    if (exists(spark, dir)) Some(spark.read.parquet(dir)) else None

  /** Merge `updates` into the parquet table at `dir`.
    *  - rows with type='delete' remove their key;
    *  - otherwise newest `versionCol` per `pk` wins (ties: updates win).
    */
  def merge(spark: SparkSession, dir: String, updates: DataFrame,
            pk: Seq[String], versionCol: String,
            deleteFlagCol: Option[String] = None): Unit = {
    val existing = readIfExists(spark, dir)
    val tagged = updates.withColumn("__src", lit(1))
    val combined = existing match {
      case Some(cur) =>
        val aligned = tagged.select(cur.columns.map(col) :+ col("__src"): _*)
        cur.withColumn("__src", lit(0)).unionByName(aligned)
      case None => tagged
    }
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    val merged0 = combined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
    val merged = deleteFlagCol match {
      case Some(f) => merged0.filter(col(f) =!= "delete" || col(f).isNull)
      case None => merged0
    }
    overwriteAtomic(spark, dir, merged)
  }

  /** Write df to `<dir>.tmp` then swap directories (readers of the old
    * data finish against already-open files; new readers see the new
    * version — the poor man's snapshot isolation).
    */
  def overwriteAtomic(spark: SparkSession, dir: String, df: DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(dir)
    val tmp = new Path(dir + ".tmp")
    val fs = target.getFileSystem(conf)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(tmp, target)
  }
}
