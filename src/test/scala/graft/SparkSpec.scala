package graft

import scala.util.chaining._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session per suite (lazy; UTC-pinned like the harness). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .pipe(graft.core.GraftSession.engineConfs) // includes GraftExtensions
      .getOrCreate()
    // getOrCreate() may return a session created by an EARLIER suite, in
    // which case withExtensions above was a no-op. Fail loudly if that
    // session lacks GraftExtensions (graft_* functions registered) —
    // otherwise extension-dependent suites (MvSpec, ExtensionsSpec,
    // PlanSpec) fail far away from the cause, order-dependently.
    require(
      s.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64")),
      "shared test SparkSession was created without GraftExtensions — " +
        "some suite builds its session with a bare builder; fix that builder")
    s
  }

  val sf = "/root/testdata/sf0.001"
}
