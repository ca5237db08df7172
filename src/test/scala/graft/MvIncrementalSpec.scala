package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.core.MvRegistry
import graft.io.Upsert
import graft.rtdw.MvIncremental

/** The composition the MV scaladoc promises (VERDICT r7 scope): an MV
  * maintained INCREMENTALLY from the fact's change feed must actually
  * SERVE transparent rewrites, and re-registration after each delta
  * fold must keep served answers equal to a full fact recompute across
  * inserts, corrections, and deletes.
  */
class MvIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def leafPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }

  test("change-feed-maintained MV serves rewrites and stays fresh across refreshes") {
    val root = Files.createTempDirectory("mvinc").toString
    val fact = s"$root/dwd_order_detail"
    val dws = s"$root/dws_rollup"

    def mergeBatch(rows: Seq[(String, String, Long, Long, String)]): Unit =
      Upsert.merge(spark,
        fact, rows.toDF("id", "province_id", "ver", "amount_cents", "op"),
        pk = Seq("id"), versionCol = "ver", deleteFlagCol = Some("op"),
        changeLog = true)

    def q = Upsert.read(spark, fact).groupBy("province_id")
      .agg(sum(col("amount_cents")).as("s"), count(lit(1)).as("c"))

    def refresh(): Unit =
      MvIncremental.refreshAndRegister(spark, "prov_rollup_mv", fact, dws,
        dims = Seq("province_id"), sumCols = Seq("amount_cents"))

    def assertServedFresh(): Unit = {
      val leaves = leafPaths(q)
      assert(leaves.exists(_.contains("dws_rollup/table")),
        s"expected rollup scan, got $leaves")
      assert(!leaves.exists(_.contains("dwd_order_detail")),
        s"fact scan survived the rewrite: $leaves")
      val served = q.as[(String, Long, Long)].collect().toSet
      MvRegistry.clear(spark)
      val recompute = try q.as[(String, Long, Long)].collect().toSet
      finally refresh() // re-register for the next phase
      assert(served == recompute,
        s"served rollup diverged from fact recompute:\n mv=$served\n fact=$recompute")
    }

    try {
      // batch 0: pure inserts
      mergeBatch(Seq(("d1", "p1", 1L, 1000L, "insert"),
        ("d2", "p1", 1L, 550L, "insert"), ("d3", "p2", 1L, 725L, "insert")))
      refresh()
      assertServedFresh()

      // batch 1: value correction + a new province
      mergeBatch(Seq(("d1", "p1", 2L, 1200L, "update"),
        ("d4", "p3", 2L, 300L, "insert")))
      refresh()
      assertServedFresh()
      assert(q.filter(col("province_id") === "p1")
        .as[(String, Long, Long)].head()._2 == 1750L,
        "correction must be visible through the served rollup")

      // batch 2: delete all of p2 — the group must vanish from the
      // SERVED answer, not just the rollup table
      mergeBatch(Seq(("d3", "p2", 3L, 725L, "delete")))
      refresh()
      assertServedFresh()
      assert(!q.as[(String, Long, Long)].collect().exists(_._1 == "p2"),
        "fully-deleted province must vanish from the served rollup")
    } finally MvRegistry.clear(spark)
  }
}
