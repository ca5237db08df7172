package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.io.{ChangeFeed, Upsert}

/** The streaming SINK over Upsert tables: micro-batches land as the
  * table's own LWW merge (write half of the upsert-kafka equivalence;
  * [[ChangeFeedSource]] is the read half). Pins: LWW semantics across
  * epochs, exactly-once under kill/restart replay, the per-query epoch
  * watermark riding the SAME manifest commit as the content, feed
  * cooperation, and the contract guardrails.
  */
class UpsertStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def table(dir: String) =
    Upsert.read(spark, dir).select("k", "ver", "v").as[(String, Long, String)]

  test("micro-batches land as LWW merges; restart continues the same table") {
    val root = Files.createTempDirectory("ssink").toString
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    val in = MemoryStream[(String, Long, String)]
    def start() = UpsertStreamSink.writer(
      in.toDF().toDF("k", "ver", "v"), dir, pk = Seq("k"), versionCol = "ver",
      numBuckets = 4)
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()

    in.addData(("a", 1L, "a1"), ("b", 1L, "b1"))
    start().awaitTermination(120000)
    assert(table(dir).collect().toSet ==
      Set(("a", 1L, "a1"), ("b", 1L, "b1")))

    // second run from the SAME checkpoint: newer version wins, stale
    // version loses, new key appears — the table's own merge contract
    in.addData(("a", 2L, "a2"), ("b", 0L, "b0"), ("c", 1L, "c1"))
    start().awaitTermination(120000)
    assert(table(dir).collect().toSet ==
      Set(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1")))
    // no staging residue outside hidden dirs
    val hist = Upsert.history(spark, dir).collect()
    assert(hist.map(_.getString(2)).forall(Set("create", "merge")))
  }

  test("a replayed epoch is a no-op: the recorded watermark gates the merge") {
    val root = Files.createTempDirectory("ssink_replay").toString
    val dir = s"$root/t"
    Upsert.merge(spark, dir, Seq(("a", 1L, "a1")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val w = new UpsertStreamingWrite(dir,
      table(dir).schema, pk = Seq("k"), versionCol = "ver",
      numBuckets = 4, changeLog = false, queryId = "q-test")
    // stage one epoch's file the way an executor would
    val staged = s"$root/stage.parquet"
    Seq(("a", 2L, "a2")).toDF("k", "ver", "v").coalesce(1)
      .write.parquet(staged)
    val file = new java.io.File(staged).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    w.commit(7L, Array(StreamFileCommit(file)))
    val gensAfterFirst = Upsert.manifestGens(spark, dir).size
    assert(table(dir).collect().toSet == Set(("a", 2L, "a2")))
    // the sink's epoch watermark rides the same commit as the content
    val man = Upsert.currentManifest(spark, dir).get
    assert(man.props.get("streamEpoch.q-test").contains("7"))
    // replay of epoch 7 (crash between sink commit and checkpoint
    // advance): no new manifest generation, rows unchanged
    w.commit(7L, Array(StreamFileCommit(file)))
    assert(Upsert.manifestGens(spark, dir).size == gensAfterFirst)
    assert(table(dir).collect().toSet == Set(("a", 2L, "a2")))
  }

  test("a table with a change feed is FED by the sink, not refused") {
    val root = Files.createTempDirectory("ssink_feed").toString
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    Upsert.merge(spark, dir, Seq(("a", 1L, "a1")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4, changeLog = true)
    val before = ChangeFeed.batches(spark, dir).size
    val in = MemoryStream[(String, Long, String)]
    in.addData(("a", 2L, "a2"))
    UpsertStreamSink.writer(in.toDF().toDF("k", "ver", "v"), dir,
      pk = Seq("k"), versionCol = "ver")
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow())
      .start().awaitTermination(120000)
    // the epoch appended a retract batch (pre-image a1, post-image a2)
    val after = ChangeFeed.batches(spark, dir)
    assert(after.size == before + 1)
    val last = ChangeFeed.since(spark, dir, after.map(_._1).max - 1).get._1
      .select("k", "v", ChangeFeed.ChangeCol).as[(String, String, String)]
      .collect().toSet
    assert(last == Set(("a", "a1", "retract"), ("a", "a2", "add")))
  }

  test("contract guardrails: fresh table needs pk; recorded contract binds") {
    val root = Files.createTempDirectory("ssink_guard").toString
    val in = MemoryStream[(String, Long, String)]
    in.addData(("a", 1L, "a1"))
    // fresh table without pk option: loud at query start
    val q1 = in.toDF().toDF("k", "ver", "v").writeStream
      .format(classOf[UpsertStreamSink].getName)
      .option("path", s"$root/fresh")
      .option("checkpointLocation", s"$root/c1")
      .trigger(Trigger.AvailableNow()).start()
    val e1 = intercept[Exception] { q1.awaitTermination(120000) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(e1).exists(_.contains("needs .option(\"pk\"")))
    // existing table: a contradicting pk option refuses
    val dir = s"$root/t"
    Upsert.merge(spark, dir, Seq(("a", 1L, "a1")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val q2 = UpsertStreamSink.writer(in.toDF().toDF("k", "ver", "v"), dir,
      pk = Seq("v"), versionCol = "ver")
      .option("checkpointLocation", s"$root/c2")
      .trigger(Trigger.AvailableNow()).start()
    val e2 = intercept[Exception] { q2.awaitTermination(120000) }
    assert(msgs(e2).exists(_.contains("contradicts the recorded pk")))
  }

  test("guards: versionFromEpoch refuses non-epoch-bred tables; numBuckets contradictions refuse") {
    val root = Files.createTempDirectory("ssink_guards").toString
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val dir = s"$root/t"
    // a table bred by BATCH merges: its versionCol holds data-domain
    // versions — epoch counters (0,1,2,…) would lose every LWW
    // comparison and the stream would never change the table
    Upsert.merge(spark, dir,
      Seq(("a", 1700000000000L, "a1")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    val in = MemoryStream[(String, String)]
    in.addData(("a", "a2"))
    val q1 = in.toDF().toDF("k", "v").writeStream
      .format(classOf[UpsertStreamSink].getName)
      .option("path", dir).option("versionFromEpoch", "true")
      .option("checkpointLocation", s"$root/c1")
      .trigger(Trigger.AvailableNow()).start()
    val e1 = intercept[Exception] { q1.awaitTermination(120000) }
    assert(msgs(e1).exists(_.contains("non-epoch writers")), s"got ${msgs(e1)}")
    // a numBuckets option contradicting the recorded placement refuses
    // at query start (silently ignoring it reads as a re-bucket)
    val in2 = MemoryStream[(String, Long, String)]
    in2.addData(("b", 2L, "b1"))
    val q2 = UpsertStreamSink.writer(in2.toDF().toDF("k", "ver", "v"), dir,
      pk = Seq("k"), versionCol = "ver", numBuckets = 16)
      .option("checkpointLocation", s"$root/c2")
      .trigger(Trigger.AvailableNow()).start()
    val e2 = intercept[Exception] { q2.awaitTermination(120000) }
    assert(msgs(e2).exists(_.contains("contradicts the recorded numBuckets")),
      s"got ${msgs(e2)}")
    // the recorded content is untouched by both refusals
    assert(Upsert.read(spark, dir).select("v").as[String].collect().toSeq ==
      Seq("a1"))
  }
}
