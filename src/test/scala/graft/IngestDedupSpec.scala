package graft

import org.apache.spark.sql.functions.col
import graft.llm.Dedup

/** Dedup-on-ingest (`Dedup.ingestDeduped`): the foreachBatch body of
  * a streaming corpus pipeline — each wave deduped against the
  * persisted signature index, survivors folded back in.
  */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  // 40-token docs: near-dups share all but the last token → jaccard of
  // 3-shingles ≈ 0.92, far above the 0.8 drop threshold and reliably
  // banded into a shared bucket; distinct docs share no shingles
  private def doc(id: Long, seed: String, tail: String = "end"): (Long, String) =
    id -> ((1 to 39).map(i => s"$seed$i") :+ tail).mkString(" ")

  test("waves dedupe against history and within-batch; replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("ingest_dedup").toString
    val sigDir = s"$root/sigs"
    def ingest(rows: Seq[(Long, String)], v: Long): Set[Long] =
      Dedup.ingestDeduped(spark, sigDir,
        rows.toDF("doc_id", "text"), batchVersion = v)
        .select("doc_id").as[Long].collect().toSet

    // wave 1: three distinct docs + an in-batch near-dup of doc 1
    // (greedy keep-first: 1 survives, 10 drops)
    val w1 = Seq(doc(1, "alpha"), doc(2, "beta"), doc(3, "gamma"),
      doc(10, "alpha", tail = "variant"))
    assert(ingest(w1, v = 1) == Set(1L, 2L, 3L))

    // wave 2: an exact dup of history (drops), a near-dup of history
    // (drops), one genuinely new doc (survives)
    val w2 = Seq(doc(21, "beta"), doc(22, "gamma", tail = "tweaked"), doc(23, "delta"))
    assert(ingest(w2, v = 2) == Set(23L))

    // wave 2 REPLAYED (crash-recovery path): same decisions, and the
    // index is unchanged — survivorship is content+index-deterministic
    val before = graft.io.Upsert.read(spark, sigDir)
      .select("doc_id").as[Long].collect().sorted
    assert(ingest(w2, v = 2) == Set(23L))
    val after = graft.io.Upsert.read(spark, sigDir)
      .select("doc_id").as[Long].collect().sorted
    assert(after.sameElements(before), "replay must not change the index")
    assert(after.toSet == Set(1L, 2L, 3L, 23L),
      s"index must hold exactly the survivors, got ${after.mkString(",")}")

    // wave 3: near-dup of a DROPPED doc's survivor (alpha survives as
    // doc 1) still drops — dedup is against the index, not the wave
    val w3 = Seq(doc(31, "alpha", tail = "another"), doc(32, "epsilon"))
    assert(ingest(w3, v = 3) == Set(32L))

    // the banded projection tracks the sig index doc-for-doc (8 bands
    // each) — this is what keeps per-batch probes from re-exploding
    // the historical index
    val sigIds = graft.io.Upsert.read(spark, sigDir)
      .select("doc_id").as[Long].collect().toSet
    val bandRows = graft.io.Upsert.read(spark, s"${sigDir}_bands")
      .select("doc_id").as[Long].collect()
    assert(bandRows.toSet == sigIds && bandRows.length == sigIds.size * 8,
      s"banded projection out of sync: ${bandRows.length} rows for ${sigIds.size} sigs")
  }
}
