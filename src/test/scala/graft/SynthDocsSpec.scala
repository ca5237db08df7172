package graft

import org.apache.spark.sql.functions._

/** The ScaleProbe corpus generator moved from 60 unrolled CASE columns
  * (janino-fatal at 20M — backlog #0) to one transform lambda; every
  * measured trend line depends on the corpus staying THE SAME, so the
  * two formulations are pinned bit-identical here.
  */
class SynthDocsSpec extends SparkSpec {
  import spark.implicits._

  test("loop-form generator emits bit-identical docs to the unrolled formulation") {
    val n = 3000L
    // the retired unrolled formulation, verbatim
    val base = when(pmod(col("id"), lit(10)) === 0, col("id") - 1).otherwise(col("id"))
    val toks = (0 until 60).map { k =>
      val h = xxhash64(base, lit(k))
      val rare = concat(lit("r"), pmod(h, lit(50000L)).cast("string"))
      val u = pmod(xxhash64(base, lit(k + 2000)), lit(100000L)).cast("double") / 100000.0
      val zipfIdx = floor(exp(u * lit(math.log(200.0)))).cast("long")
      val common = concat(lit("c"), zipfIdx.cast("string"))
      when(pmod(xxhash64(base, lit(k + 1000)), lit(10)) < 3, common).otherwise(rare)
    }
    val perturbed = when(pmod(col("id"), lit(10)) === 0,
      concat(lit("dup"), col("id").cast("string"))).otherwise(toks.head)
    val unrolled = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (perturbed +: toks.tail): _*).as("text"))

    val diff = ScaleProbe.synthDocs(spark, n).as[(Long, String)].collect().toMap
    val old = unrolled.as[(Long, String)].collect().toMap
    assert(diff.size == n && old.size == n)
    old.foreach { case (id, text) =>
      assert(diff(id) == text, s"doc $id diverged:\n new=${diff(id)}\n old=$text")
    }
  }
}
