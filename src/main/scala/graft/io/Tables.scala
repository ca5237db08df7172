package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers over the driver-generated parquet star schema.
  *
  * Single scan entry point so every operator benefits from parquet
  * column pruning + predicate pushdown (operators select/filter on the
  * returned DataFrame; Catalyst pushes both into the scan — verified via
  * `.explain("formatted")` showing PushedFilters/ReadSchema).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts arrives in whichever physical type the generator chose, so
    * branch on the type Spark actually inferred rather than hard-coding one
    * generation's contract:
    *   - LongType: the file is parquet TIMESTAMP(NANOS), which the vectorized
    *     reader only surfaces as raw nanos under the legacy conf (set below so
    *     this branch is reachable instead of an analysis error). Convert with
    *     integer `div` — a double division would lose precision above 2^53 ns.
    *   - TIMESTAMP_NTZ: plain timestamp[us] with no UTC adjustment. Cast to
    *     the session-TZ TimestampType (sessions pin UTC, so the wall-clock
    *     value is preserved) — downstream windows/joins and the verify
    *     pipeline were built against TimestampType outputs.
    *   - TimestampType: use directly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Order-independent content fingerprint of `cols`: count + wrapping
    * sum of per-row xxhash64. Build-once caches (MVs, zones/bloom
    * serving snapshots) key their markers on this instead of a bare
    * row count, so a regenerated source with the SAME cardinality but
    * different content rebuilds instead of silently serving stale rows
    * — the failure mode a driver testdata regeneration would otherwise
    * cause. One scan of the named columns; at the serving layer's own
    * scale the operator versions tables explicitly instead.
    */
  def contentKey(df: DataFrame, cols: Seq[String]): String = {
    // per-row hash bounded to < 1e9 so the ANSI long sum cannot
    // overflow below ~9e9 rows (far above any ensure-cached table here)
    val r = df.agg(
      count(lit(1)).as("n"),
      sum(pmod(xxhash64(cols.map(col): _*), lit(1000000007L))).as("h")).head()
    s"${r.getLong(0)}_${java.lang.Long.toHexString(if (r.isNullAt(1)) 0L else r.getLong(1))}"
  }

  /** Register every table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
