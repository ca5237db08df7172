package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TEMPORARY debug spec — deleted before commit. */
class ScratchPlanSpec extends SparkSpec {

  private def md(id: Int) = new MetadataBuilder()
    .putLong("parquet.field.id", id).build()

  test("parquet field-id rename semantics") {
    val dir = java.nio.file.Files.createTempDirectory("fieldid").toString
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

    // file 1: columns (a:1, b:2) WITH field ids
    spark.range(3).select(
      col("id").as("a", md(1)),
      (col("id") * 10).as("b", md(2)))
      .write.parquet(s"$dir/f1")

    // file 2: columns (a, b) WITHOUT ids (plain write)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    spark.range(3).select(
      (col("id") + 100).as("a"), (col("id") * 10 + 100).as("b"))
      .write.parquet(s"$dir/f2")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")

    // read f1 under RENAMED schema (a->x, same id 1)
    val renamed = StructType(Seq(
      StructField("x", LongType, nullable = true, md(1)),
      StructField("b", LongType, nullable = true, md(2))))
    val r1 = spark.read.schema(renamed).parquet(s"$dir/f1")
    println("[dbg] f1 under rename: " + r1.collect().map(_.toString).mkString(" "))

    // read f2 (no ids in file) under the id-ful ORIGINAL schema
    val orig = StructType(Seq(
      StructField("a", LongType, nullable = true, md(1)),
      StructField("b", LongType, nullable = true, md(2))))
    try {
      val r2 = spark.read.schema(orig).parquet(s"$dir/f2")
      println("[dbg] f2 under id-schema: " + r2.collect().map(_.toString).mkString(" "))
    } catch { case e: Exception =>
      println("[dbg] f2 under id-schema FAILED: " +
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).take(3).mkString(" | "))
    }

    // read BOTH together under the renamed schema
    try {
      val r3 = spark.read.schema(renamed).parquet(s"$dir/f1", s"$dir/f2")
      println("[dbg] f1+f2 under rename: " + r3.collect().map(_.toString).mkString(" "))
    } catch { case e: Exception =>
      println("[dbg] f1+f2 FAILED: " +
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).take(3).mkString(" | "))
    }

    // vectorized off too? also check pushed filter on renamed col
    val f = spark.read.schema(renamed).parquet(s"$dir/f1").filter(col("x") === 1)
    println("[dbg] filter on renamed: " + f.collect().map(_.toString).mkString(" "))
  }
}
