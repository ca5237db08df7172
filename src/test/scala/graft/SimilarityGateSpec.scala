package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.llm.Similarity

/** VERDICT r2 #4: cosineNearDup's exact-vs-LSH path decision must be
  * metadata-only — the old `vecs.count()` gate ran a full corpus scan
  * before the real query (at 100 TB the gate costs as much as the
  * answer). A SparkListener proves constructing the DataFrame fires
  * ZERO jobs; the result itself stays oracle-checked by the driver
  * (sim_cosine_neardup).
  */
class SimilarityGateSpec extends SparkSpec {

  override val sf = "/root/testdata/sf0.001"

  test("path choice is metadata-only: the gate adds no Spark job over opening the table") {
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = jobs += 1
    }
    def jobsDuring(body: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      try {
        jobs = 0
        body
        Thread.sleep(2000) // listener bus is async; give events time to land
        jobs
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // baseline: just opening the parquet table costs one driver-side
    // schema-inference job; that is the reader's price, not the gate's
    val baseline = jobsDuring {
      graft.io.Tables.embeddings(spark, sf).select("vec_id"); ()
    }
    val gate = jobsDuring {
      val df = Similarity.cosineNearDup(spark, sf) // mode = auto
      assert(df.columns.toSeq == Seq("id_a", "id_b", "sim"))
    }
    assert(gate == baseline,
      s"gate must not run extra Spark jobs: table open costs $baseline, call cost $gate")
  }

  test("auto resolves to the exact slab at test scale; explicit modes override") {
    def hasBnlj(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
    // small corpus → auto takes the exact (BNLJ slab) path
    assert(hasBnlj(Similarity.cosineNearDup(spark, sf)))
    // forced LSH: equi-join on the bucket, no BNLJ anywhere
    assert(!hasBnlj(Similarity.cosineNearDup(spark, sf, mode = "lsh")))
    // forced exact matches auto here
    import spark.implicits._
    val auto = Similarity.cosineNearDup(spark, sf, threshold = 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.cosineNearDup(spark, sf, threshold = 0.25, mode = "exact")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto == exact && auto.nonEmpty)
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDup(spark, sf, mode = "nope")
    }
  }

  test("SQ8: codes are 1 byte/dim binary; ADC ranking holds ≥0.9 recall@10 " +
       "vs the full-precision ranking") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col, expr, length, max, size}
    val sq8 = Similarity.sq8TopK(spark, sf)
    // the compression is real: BinaryType, one byte per dimension
    val emb = graft.io.Tables.embeddings(spark, sf)
    val amax = emb.agg(max(
      expr("array_max(transform(embedding, x -> abs(cast(x as double))))")).as("a"))
    val codes = emb.join(broadcast(amax))
      .select(graft.functions.functions.sq8_encode(col("embedding"), col("a")).as("codes"))
    assert(codes.schema("codes").dataType == org.apache.spark.sql.types.BinaryType)
    val dims = emb.select(size(col("embedding"))).as[Int].head()
    assert(codes.select(length(col("codes"))).as[Int].head() == dims)

    // recall@10 of the compressed ranking vs the exact one
    val got = sq8.select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean SQ8 recall@10 $mean below floor")
  }
}
