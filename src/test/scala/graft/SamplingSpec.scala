package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.llm.TextAnalysis

/** Hash-based sampling / split / domain-mixing invariants. The full
  * row/schema/hash oracle runs in the driver gate; these pin the
  * properties the oracle can't phrase: partition-independence (the
  * reproducibility claim that separates hash sampling from rand()),
  * split exhaustiveness, and the mixture's binding-source behavior.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("sample membership is a pure function of doc_id — partitioning-independent, rerun-stable") {
    val a = TextAnalysis.sampleHash(spark, sf).as[(Long, Long)].collect().toSet
    val b = TextAnalysis.sampleHash(spark, sf).as[(Long, Long)].collect().toSet
    assert(a == b)
    val total = Tables.documents(spark, sf).count()
    assert(a.nonEmpty && a.size < total)
    // every kept draw is below the 1/4 threshold
    assert(a.forall(_._2 < (1L << 48) / 4))
  }

  test("split assignment partitions the corpus exactly") {
    val splits = TextAnalysis.splitAssign(spark, sf)
    val total = Tables.documents(spark, sf).count()
    assert(splits.count() == total)
    assert(splits.select("doc_id").distinct().count() == total)
    val bySplit = splits.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit.values.sum == total)
    // train dominates under the 90/6/4 bucket thresholds
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
  }

  test("domain mix: kept within stratum size, binding source keeps everything") {
    val mix = TextAnalysis.domainMix(spark, sf)
      .as[(String, Long, Double, Long)].collect()
    assert(mix.length == 20)
    mix.foreach { case (_, n, rate, kept) =>
      assert(kept <= n)
      assert(rate > 0.0 && rate <= 1.0)
    }
    // src19 carries the max weight: it binds T, keep_rate 1.0, keeps all
    val (_, n19, rate19, kept19) = mix.find(_._1 == "src19").get
    assert(rate19 == 1.0 && kept19 == n19)
  }

  test("stratified sample: exactly min(k, |source|) per source; growth only " +
       "displaces across the k-th rank (never reshuffles)") {
    val k = 5
    val got = TextAnalysis.stratifiedSample(spark, sf, k)
      .as[(Long, String, Long)].collect()
    val bySource = got.groupBy(_._2)
    val sizes = graft.io.Tables.documents(spark, sf)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (src, n) =>
      val picked = bySource.getOrElse(src, Array.empty)
      assert(picked.length == math.min(k, n),
        s"$src: expected ${math.min(k, n)} rows, got ${picked.length}")
      assert(picked.map(_._3).sorted.toSeq == (1L to picked.length).toSeq)
    }
    // rerun-stability is structural (pure function of doc_id), but pin
    // the displacement property: the k=3 sample is a PREFIX of the k=5
    // sample per source — shrinking/growing k never swaps earlier ranks
    val k3 = TextAnalysis.stratifiedSample(spark, sf, 3)
      .as[(Long, String, Long)].collect().toSet
    assert(k3 == got.filter(_._3 <= 3).toSet)
  }

  test("stratified sample pre-prune (the billion-doc-source path) is output-identical") {
    val plain = TextAnalysis.stratifiedSample(spark, sf, 5)
      .as[(Long, String, Long)].collect().toSet
    val pruned = TextAnalysis.stratifiedSample(spark, sf, 5, prePrune = true)
      .as[(Long, String, Long)].collect().toSet
    assert(pruned == plain, "pruned path must be EXACTLY the unpruned sample")
  }

  test("pre-prune exactness guard: a source whose draws all miss the threshold " +
       "is re-included in full (no silent row loss)") {
    // crafted non-uniform draws: source "hot" has 100 rows whose rk all
    // sit in the top half of the range — the 4k/n threshold prunes ALL
    // of them, which must trigger the full re-include, not an empty top-k
    val crafted = (0 until 100).map(i => (i.toLong, "hot", (1L << 47) + i))
      .toDF("doc_id", "source", "rk")
    val out = TextAnalysis.prePruned(crafted, k = 2)
      .as[(Long, String, Long)].collect()
    assert(out.length == 100, s"guard must re-include the whole source, got ${out.length}")
  }
}
