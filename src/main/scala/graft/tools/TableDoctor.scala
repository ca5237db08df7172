package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the job-free health snapshot of one or more tables:
  *
  *   runMain graft.tools.TableDoctor /path/to/upsert_table ...
  *   runMain graft.tools.TableDoctor mor:/path/to/mor_table ...
  *
  * Plain paths are read as io.Upsert tables; a `mor:` prefix reads the
  * merge-on-read layout (base stats + delta backlog).
  */
object TableDoctor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach {
      case p if p.startsWith("mor:") =>
        val dir = p.stripPrefix("mor:")
        val s = graft.io.MergeOnRead.stats(spark, dir)
        println(s"[doctor] $dir (merge-on-read)")
        println(s"[doctor]   compacted upto batch ${s.compactedUpto}; " +
          s"delta backlog ${s.liveDeltaBatches} batches / ${s.liveDeltaBytes} B")
        s.base match {
          case Some(b) => println(s"[doctor]   base: $b")
          case None    => println(s"[doctor]   base: not yet compacted")
        }
      case dir =>
        graft.io.Upsert.stats(spark, dir) match {
          case Some(s) => println(s"[doctor] $dir\n[doctor]   $s")
          case None    => println(s"[doctor] $dir: no committed manifest")
        }
    }
    spark.stop()
  }
}
