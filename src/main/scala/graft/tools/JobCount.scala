package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.util.chaining._

/** Guide §1 attribution helper for the 32-core anti-scaling cluster
  * (VERDICT r15 #1): per head, count the driver-scheduled jobs, stages
  * and tasks behind one steady-state evaluation, plus the summed task
  * run time vs the wall time. A head whose wall time is many times the
  * summed task time is paying scheduling/launch latency on a chain of
  * tiny jobs — the selective inflation signature — and the fix is
  * fewer jobs / fewer tasks per tiny stage, not faster operators.
  *
  * Usage: runMain graft.tools.JobCount [names...]   (default: all)
  */
object JobCount {
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
    val verbose = sys.env.get("JOBCOUNT_VERBOSE").contains("1")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskNanos = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val st = j.stageInfos.map(s => s"${s.name.takeWhile(_ != ' ')}:${s.numTasks}").mkString(",")
          println(s"jobv ] job=${j.jobId} stages=${j.stageInfos.size} tasks=${j.stageInfos.map(_.numTasks).sum} [$st]")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(t.taskMetrics).foreach(m => taskNanos.addAndGet(m.executorRunTime * 1000000L))
      }
    })
    // warm-up (classload/codegen + fixture builds at the target SF so
    // the measured pass counts steady-state evaluation only)
    names.foreach { n =>
      try { graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count() }
      catch { case _: Throwable => }
      try { graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => }
      spark.catalog.clearCache()
    }
    names.foreach { n =>
      // settle the async listener queue from the previous head before
      // zeroing (listenerBus.waitUntilEmpty is private[spark])
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L)
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"jobct] $n%-34s jobs=${jobs.get}%4d stages=${stages.get}%4d tasks=${tasks.get}%6d taskSec=${taskNanos.get / 1e9}%8.3f wall=$wall%7.3f")
      } catch {
        case t: Throwable => println(s"jobct] $n FAILED ${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(120)}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
