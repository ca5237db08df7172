package graft

import scala.util.chaining._
import org.apache.spark.sql.SparkSession

/** Dev smoke: schema sanity + run every registered query at sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .pipe(graft.core.GraftSession.engineConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.io.Tables.all.foreach { t =>
      val df = graft.io.Tables.table(spark, sf, t)
      println(s"== $t: ${df.schema.simpleString}")
    }
    spark.read.parquet(s"$sf/events.parquet").show(3, false)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val n = fn(spark, sf).count()
        println(f"[smoke] $name%-24s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable =>
          println(s"[smoke] $name FAILED: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}")
      }
    }
    spark.stop()
  }
}
