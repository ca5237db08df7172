package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextAnalysis}

/** The shared-pair-graph composition: one cached pair graph feeds both
  * the cluster report and the curation keep-list, and the composed
  * results equal the standalone queries exactly.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("composed pipeline over one cached pair graph equals standalone queries") {
    val pairs = Dedup.ngramJaccard(spark, sf)
      .select(col("doc_a"), col("doc_b")).cache()
    try {
      val clusters = Dedup.nearDupClustersFromPairs(spark, pairs)
      val composedClusters = clusters.as[(Long, Long)].collect().toSet
      val standaloneClusters = Dedup.nearDupClusters(spark, sf)
        .as[(Long, Long)].collect().toSet
      assert(composedClusters == standaloneClusters)

      val composedKeep = TextAnalysis.curateCorpusWithClusters(spark, sf, clusters)
        .as[(Long, Long)].collect().toSet
      val standaloneKeep = TextAnalysis.curateCorpus(spark, sf)
        .as[(Long, Long)].collect().toSet
      assert(composedKeep == standaloneKeep)
    } finally { pairs.unpersist(); () }
  }
}
