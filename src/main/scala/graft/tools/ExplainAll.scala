package graft.tools

import org.apache.spark.sql.SparkSession
import scala.util.chaining._

/** Round-15 deliverable helper: write `.explain("formatted")` for the
  * named queries (or every registered query) into a target directory —
  * the `plans/r15/<query>_{before,after}.txt` evidence files. The
  * session mirrors [[graft.Bench]]'s exactly (same master/conf
  * decorator) so the captured plans are the plans the bench times; the
  * query is EXECUTED first so the formatted output is the final
  * adaptive plan (isFinalPlan=true), not the pre-AQE guess.
  *
  * Usage: runMain graft.tools.ExplainAll <outDir> <suffix> [names...]
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1) // "before" | "after"
    val names = if (args.length > 2) args.drop(2).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .pipe(graft.core.GraftSession.engineConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val qe = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution
        qe.toRdd.count() // materialize so AQE finalizes the plan
        val formatted = qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), formatted)
        println(s"explained] $name -> $outDir/${name}_$suffix.txt")
      } catch {
        case t: Throwable => println(s"explained] $name FAILED: ${t.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
