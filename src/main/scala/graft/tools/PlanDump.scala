package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the normalized final physical plan of named
  * queries (the exact string Bench.planSha hashes) so cross-run hash
  * instability can be diffed down to its cause.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val qe = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution
      qe.toRdd.count()
      val normalized = qe.executedPlan.toString
        .replaceAll("#\\d+", "#")
        .replaceAll("plan_id=\\d+", "plan_id=")
        .replaceAll("@[0-9a-fA-F]+", "@")
        .replaceAll("id=#?\\d+", "id=")
      println(s"===== $name =====")
      println(normalized)
    }
    spark.stop()
  }
}
