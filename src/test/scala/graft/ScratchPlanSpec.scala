package graft

import org.apache.spark.sql.functions._

import graft.io.{MergeOnRead, Upsert}

/** TEMPORARY debug spec — deleted before commit. */
class ScratchPlanSpec extends SparkSpec {
  import spark.implicits._

  test("repro evolve compact") {
    val dir = java.nio.file.Files.createTempDirectory("mor_evolve_dbg").toString
    val pk = Seq("id")
    MergeOnRead.merge(spark, dir,
      Seq(("k1", 1L, 100L), ("k2", 1L, 200L)).toDF("id", "ver", "cents"))
    MergeOnRead.compact(spark, dir, pk, "ver")
    MergeOnRead.merge(spark, dir,
      Seq(("k2", 2L, 250L, "promo"), ("k3", 1L, 300L, "new")).toDF("id", "ver", "cents", "tag"))
    MergeOnRead.compact(spark, dir, pk, "ver")
    val man = Upsert.currentManifest(spark, s"$dir/base").get
    println(s"[dbg] props=${man.props}")
    println(s"[dbg] files=${man.files}")
    val df = MergeOnRead.read(spark, dir, pk, "ver")
    println(s"[dbg] read cols=${df.columns.mkString(",")}")
    df.show(false)
  }
}
