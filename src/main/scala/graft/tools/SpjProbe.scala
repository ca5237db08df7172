package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("spjprobe", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    val dir = java.nio.file.Files.createTempDirectory("spjS").toString
    val df = spark.range(2000).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      (col("id") * 3).as("v"))
    graft.io.Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    val base = graft.sources.UpsertBucketSource.read(spark, dir).as("base")
    // small delta side: plain DataFrame with the placement hash recomputed
    val delta = spark.range(100).select(
        concat(lit("k"), col("id") * 7).as("dk"), lit(9L).as("dv"))
      .withColumn("__dbucket",
        pmod(xxhash64(col("dk").cast("string")), lit(8)).cast("int")).as("d")
    val j = base.join(delta,
      col("base.k") === col("d.dk") && col("base.__bucket") === col("d.__dbucket"))
    val plan = j.queryExecution.executedPlan.toString
    val exch = "Exchange".r.findAllIn(plan).size
    println(s"spjprobe] shuffle-one-side exchanges=$exch rows=${j.count()}")
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("BatchScan") || l.contains("Join") || l.contains("Scan parquet")).map(_.trim.take(120)).mkString("spjprobe] ", "\nspjprobe] ", ""))
    spark.stop()
  }
}
