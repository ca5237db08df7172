package graft

import scala.util.chaining._
import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: one JSON line with per-query seconds.
  *
  * A warm-up pass at the smallest scale factor runs before timing so
  * measurements reflect steady-state query time, not first-use JVM
  * costs (classloading, whole-stage-codegen compilation, broadcast
  * thread-pool spin-up) — the regime a long-running cluster actually
  * operates in.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // r15 NEGATIVE RESULT, kept as a comment so it is not retried:
      // size-targeted AQE coalescing (parallelismFirst=false +
      // advisoryPartitionSizeInBytes=256m, the guide §9 cluster
      // posture) was measured here and REGRESSED the board ~15–25%
      // (e.g. a_window_analytics 0.30→0.62 s) — with small-but-CPU-
      // heavy shuffles every reduce coalesces to ONE partition and the
      // stage serializes. parallelismFirst=true (default) is correct
      // when partitions are far below the advisory size; the 256m
      // advisory belongs in cluster submit conf, not in this harness.
      .pipe(graft.core.GraftSession.engineConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up on the smallest SF (not timed)
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, warmDir).queryExecution.toRdd.count() } catch { case _: Throwable => }
    }
    // toRdd.count() forces every output column to materialize —
    // df.count() would let Catalyst eliminate left-outer joins and
    // prune projections, under-measuring the queries. Best-of-2 per
    // query filters transient host noise (shared box); cache is
    // cleared between runs so no run benefits from a previous one.
    // A failing query reports an explicit "errors" entry and a -1
    // time sentinel (never a fast-looking small number), and is
    // excluded from the total.
    spark.catalog.clearCache()
    // plan_sha: hash of the FINAL (post-AQE) physical plan with the
    // run-varying ids stripped and node lines sorted — the shared
    // tools.PlanCanon pipeline (so PlanDump prints exactly what this
    // hashes). Plan hash unchanged + time inflated across rounds =
    // host contention, not a regression — the disambiguator the r2
    // bench episode lacked (VERDICT r3 #8).
    def planSha(plan: String): String = graft.tools.PlanCanon.sha(plan)
    // persist each query's canonical (hashed) plan text: when a
    // plan_sha moves between rounds or runs, the diff is a `diff` of
    // two small files instead of an unreproducible one-off
    // SELF-CLEANING (VERDICT r10 #7): stale plan files from previous
    // builds otherwise accumulate and a `<query>-<oldsha>.txt` can
    // masquerade as a re-baseline during an audit; after a run the dir
    // holds exactly the current run's plans (one per head, plus any
    // AQE twins the run itself produced)
    val planDir = java.nio.file.Paths.get("target/bench_plans")
    if (java.nio.file.Files.isDirectory(planDir)) {
      val listing = java.nio.file.Files.list(planDir)
      try listing.forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally listing.close() // Files.list leaks a dir handle unless closed
    }
    java.nio.file.Files.createDirectories(planDir)
    // fixture/query split (VERDICT r12 #7): table-building heads pay
    // their build-once cost (Tables.ensureBuilt) on the FIRST timed
    // run and reuse it on the second, so `best` (min of 2) is the
    // steady-state query EXECUTION time and `first − best` is the
    // fixture cost — reported separately so a regression in execution
    // is never masked by (or blamed on) fixture churn.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      var sha = ""
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try {
          val qe = fn(spark, sfDir).queryExecution
          qe.toRdd.count()
          val plan = qe.executedPlan.toString // final adaptive plan, free to read
          sha = planSha(plan)
          java.nio.file.Files.writeString(planDir.resolve(s"$name-$sha.txt"),
            graft.tools.PlanCanon.canonical(plan))
        } catch {
          case t: Throwable =>
            err = Some(t.getClass.getSimpleName + ": " +
              String.valueOf(t.getMessage).replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160))
        }
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      val dt = times.min
      val fixture = math.max(0.0, times.head - dt)
      (name, if (err.isEmpty) dt else -1.0, err, sha, fixture)
    }
    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _, _) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val shas = results.collect { case (k, _, None, s, _) => s"\"" + k + "\":\"" + s + "\"" }
      .mkString("{", ",", "}")
    // only fixture costs ≥ 50 ms are attributed — below that the
    // first-vs-best delta is run noise, not a build
    val fixtures = results.collect { case (k, _, None, _, f) if f >= 0.05 =>
      s"\"" + k + "\":" + f
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None, _, _) => v }.sum
    val fixtureTotal = results.collect { case (_, _, None, _, f) if f >= 0.05 => f }.sum
    val nErr = results.count(_._3.isDefined)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"fixture_s":$fixtures,"fixture_total":$fixtureTotal,"errors":$errs,"error_ct":$nErr,"plan_sha":$shas,"sf":"$sfDir"}"""
    println(line)
    // Self-contained artifact (r7 verdict #2): the driver captures only a
    // tail of stdout, which has twice truncated every per-query time out
    // of BENCH_rN.json. The same line on disk survives any truncation.
    // Keys inside each map are already sorted (results is sortBy name).
    val artifact = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(artifact.getParent)
    java.nio.file.Files.writeString(artifact, line + "\n")
    spark.stop()
  }
}
