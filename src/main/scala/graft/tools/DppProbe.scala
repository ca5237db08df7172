package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("dppprobe", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    val df = spark.range(50000).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      pmod(col("id"), lit(100)).as("grp"), col("id").as("v"))
    graft.io.Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = 16, bloom = true)
    // a selective dim keyed by the fact PK
    val dim = spark.range(2000).select(concat(lit("k"), col("id") * 997).as("dk"),
      when(col("id") < 20, lit("x")).otherwise(lit("y")).as("attr"))
    val fact = graft.sources.UpsertBucketSource.read(spark, dir)
    val j = fact.join(dim.filter(col("attr") === "x"), col("k") === col("dk"))
    val plan = j.queryExecution.executedPlan.toString
    println("dpp] rows=" + j.count())
    println("dpp] runtimeFilters line: " +
      plan.linesIterator.filter(_.contains("RuntimeFilters")).map(_.trim.take(200)).mkString(" || "))
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) bytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    def measure(label: String): Unit = {
      bytes.set(0); spark.sparkContext.addSparkListener(l)
      try {
        val fact2 = graft.sources.UpsertBucketSource.read(spark, dir)
        val n = fact2.join(dim.filter(col("attr") === "x"), col("k") === col("dk")).count()
        Thread.sleep(1500)
        println(s"dpp] $label rows=$n bytesRead=" + bytes.get())
      } finally spark.sparkContext.removeSparkListener(l)
    }
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    measure("dpp_off")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    measure("dpp_on")
    spark.stop()
  }
}
