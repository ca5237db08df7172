package graft.tools

import org.apache.spark.sql.SparkSession
import scala.util.chaining._

/** Guide §1 measurement helper: split each registered head's steady
  * time into build (the query function itself — eager fixture work,
  * driver collects, catalog/manifest metadata), plan (analysis +
  * optimization + physical planning, forced via executedPlan), and
  * exec (toRdd.count, the actual job). Two timed rounds after a
  * sf0.001 warm-up, same session shape as Bench. The split shows which
  * lever matters per head: an exec-dominated head needs a better plan,
  * a build/plan-dominated head needs fewer driver round-trips.
  *
  * Usage: runMain graft.tools.ProfileQ [names...]   (default: all)
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
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
    // warm-up at the smallest sibling SF of the configured dir (ADVICE
    // r15: a hardcoded path silently no-ops off this box and round-1
    // timings absorb JIT noise); fall back to the measured dir itself
    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.getPath else sfDir
    }
    names.foreach { n =>
      try { graft.SparkEntry.queries(n)(spark, warmDir).queryExecution.toRdd.count() }
      catch { case t: Throwable =>
        println(s"profq] warm-up $n failed: ${t.getClass.getSimpleName}") }
      spark.catalog.clearCache()
    }
    names.foreach { n =>
      (1 to 2).foreach { i =>
        try {
          val t0 = System.nanoTime()
          val df = graft.SparkEntry.queries(n)(spark, sfDir)
          val t1 = System.nanoTime()
          val qe = df.queryExecution
          qe.executedPlan // force plan
          val t2 = System.nanoTime()
          qe.toRdd.count()
          val t3 = System.nanoTime()
          println(f"profq] $n%-34s r$i build=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f total=${(t3 - t0) / 1e9}%6.3f")
        } catch {
          case t: Throwable => println(s"profq] $n r$i FAILED ${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(120)}")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
