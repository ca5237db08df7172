package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.streaming.DailyServing

/** Streaming legs for the pivot and percentile serving heads (VERDICT
  * r7 #6): windowed streaming finals folded into the served Upsert
  * tables must equal the BATCH twins computed over the same waves —
  * the same finals==batch contract LeaderboardSpec pins for top-N.
  */
class DailyServingSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L // 2024-01-01 00:00:00 UTC

  /** Wave = one day's events at noon: three types, seven events each,
    * deterministic spread-out values so percentiles cut something.
    */
  private def rows(day: Int): Seq[(Long, String, Double)] = {
    val noon = t0 + day * 86400000L + 43200000L
    Seq("click", "purchase", "signup").flatMap(et =>
      (0 to 6).map(j =>
        (noon + j * 1000L, et, ((day * 31 + j * 17 + et.length * 7) % 97) + 0.25)))
  }

  test("streaming pivot + percentile finals == batch twins across a mid-wave kill/restart") {
    val root = Files.createTempDirectory("dailyserving").toString
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    val schema = new StructType()
      .add("ts", "long").add("event_type", "string").add("value", "double")
    def stream = spark.readStream.schema(schema).json(in)
      .withColumn("event_time", timestamp_millis(col("ts")))
    def startPivot() = DailyServing.pivotFinals(stream)
      .writeStream.option("checkpointLocation", s"$root/ck_pivot")
      .foreachBatch { (b: DataFrame, id: Long) =>
        DailyServing.foldPivot(spark, root, b, id); ()
      }.start()
    def startPct() = DailyServing.percentileFinals(stream)
      .writeStream.option("checkpointLocation", s"$root/ck_pct")
      .foreachBatch { (b: DataFrame, id: Long) =>
        DailyServing.foldPercentiles(spark, root, b, id); ()
      }.start()
    var qPivot = startPivot()
    var qPct = startPct()

    val all = scala.collection.mutable.Buffer.empty[(Long, String, Double)]
    (0 to 4).foreach { d =>
      val rs = rows(d); all ++= rs
      Files.write(Paths.get(s"$in/wave-$d.json"),
        rs.map { case (ts, et, v) =>
          s"""{"ts":$ts,"event_type":"$et","value":$v}"""
        }.mkString("\n").getBytes)
      if (d == 2) {
        // mid-wave kill, no drain: the in-flight batch dies and must
        // replay through the LWW fold — the scaladoc's idempotence
        // claim, exercised rather than asserted
        qPivot.stop(); qPct.stop()
        qPivot = startPivot(); qPct = startPct()
      }
      qPivot.processAllAvailable(); qPct.processAllAvailable()
    }
    // flush: a far-future event closes every real window; its own day
    // (pivot) / type (percentiles) is excluded from the comparison
    Files.write(Paths.get(s"$in/wave-flush.json"),
      s"""{"ts":${t0 + 999L * 86400000L},"event_type":"__flush","value":0.0}""".getBytes)
    qPivot.processAllAvailable(); qPct.processAllAvailable()
    qPivot.stop(); qPct.stop()

    val batch = all.toSeq.toDF("ts", "event_type", "value")
      .withColumn("day", to_date(timestamp_millis(col("ts"))).cast("string"))

    // pivot leg: served rows (real days only) == batch conditional counts
    def ct(v: String) = sum(when(col("event_type") === v, 1L).otherwise(0L)).as(v)
    val types = Seq("click", "view", "purchase", "signup", "error")
    val servedPivot = DailyServing.currentPivot(spark, root).get
      .filter(col("day") <= "2024-01-05")
      .select(col("day") +: types.map(col): _*)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val expectedPivot = batch.groupBy(col("day")).agg(ct(types.head), types.tail.map(ct): _*)
      .select(col("day") +: types.map(col): _*)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(servedPivot.nonEmpty && servedPivot.size == 5, s"got $servedPivot")
    assert(servedPivot == expectedPivot,
      s"pivot diverged:\n stream=$servedPivot\n batch=$expectedPivot")

    // percentile leg: served rows == the batch percentile_approx twin
    // (accuracy >> group size, so the sketch is the exact value set on
    // both sides and merge order cannot matter)
    val servedPct = DailyServing.currentPercentiles(spark, root).get
      .filter(col("event_type") =!= "__flush")
      .select("day", "event_type", "p50_cents", "p90_cents", "p99_cents", "n")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    val expectedPct = batch
      .groupBy(col("day"), col("event_type"))
      .agg(percentile_approx(floor(col("value") * 100).cast("long"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pcts"),
        count(lit(1)).as("n"))
      .select(col("day"), col("event_type"),
        element_at(col("pcts"), 1).as("p50_cents"),
        element_at(col("pcts"), 2).as("p90_cents"),
        element_at(col("pcts"), 3).as("p99_cents"), col("n"))
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(servedPct.size == 15, s"expected 5 days × 3 types, got ${servedPct.size}")
    assert(servedPct == expectedPct,
      s"percentiles diverged:\n stream=$servedPct\n batch=$expectedPct")
    // the sketch at this accuracy must also match the EXACT rank-selection
    // value the batch head serves: groups are odd-sized so p50 is the
    // middle element
    val exact = batch.filter(col("event_type") === "click")
      .groupBy(col("day"))
      .agg(expr("percentile(cast(floor(value*100) as long), 0.5)").cast("long").as("p50x"))
      .as[(String, Long)].collect().toMap
    servedPct.filter(_._2 == "click").foreach { case (day, _, p50, _, _, _) =>
      assert(p50 == exact(day), s"approx p50 != exact middle element on $day")
    }
  }
}
