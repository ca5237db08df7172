package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.{MergeOnRead, Upsert}
import graft.plans.{OrderedGuard, OrderedGuardViolation}

/** Incremental sorted compaction (VERDICT r12 #1): once a MOR base is
  * pk-sorted from a previous sorted compaction, the next
  * `compact(sortBase = true)` must NOT re-shuffle and re-sort the whole
  * resolved fold — it merges the sorted base with the sorted delta
  * winners per bucket (the storage-partitioned full-outer resolve,
  * which emits every partition already in (bucket, pk) order),
  * rewrites ONLY the touched buckets, and carries every untouched
  * bucket's files into the new manifest by reference. The ordering the
  * staged files claim is verified row-by-row by
  * [[graft.plans.OrderedGuard]] — a planner surprise aborts before any
  * commit and the caller falls back to the full re-sort.
  */
class IncrementalCompactSpec extends SparkSpec {
  import spark.implicits._

  private def pkOf(i: Int) = f"k$i%06d"

  private def rows(ids: Seq[Int], ver: Long, tag: String): DataFrame =
    ids.toDF("id").select(
      udfFreeKey(col("id")).as("k"),
      lit(ver).as("ver"),
      concat(lit(tag), col("id")).as("v"),
      lit(null).cast("string").as("op"))

  private def udfFreeKey(id: org.apache.spark.sql.Column) =
    concat(lit("k"), format_string("%06d", id))

  private def baseManifest(dir: String): Upsert.Manifest =
    Upsert.currentManifest(spark, s"$dir/base").get

  private def readAll(dir: String): Seq[(String, String)] =
    MergeOnRead.read(spark, dir, Seq("k"), "ver", Some("op"))
      .select("k", "v").as[(String, String)].collect().toSeq.sorted

  test("incremental sorted compact: content parity, carried files, sorted staging") {
    val dir = Files.createTempDirectory("incr_compact").toString
    val n = 2000
    MergeOnRead.recordContract(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 64)
    MergeOnRead.merge(spark, dir, rows(0 until n, 1L, "a"))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 64, bloom = true, sortBase = true)
    val man1 = baseManifest(dir)
    assert(Upsert.sortedByOf(man1) == (Seq("k"), Seq(man1.gen)),
      "first sorted compact records its own generation")

    // a delta wave: updates to a slice of keys + a couple of deletes
    val updates = rows(0 until n by 97, 2L, "b")
    val deletes = Seq(5, 105).toDF("id").select(
      udfFreeKey(col("id")).as("k"), lit(3L).as("ver"),
      lit("x").as("v"), lit("delete").as("op"))
    MergeOnRead.merge(spark, dir, updates.unionByName(deletes))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 64, bloom = true, sortBase = true)
    val man2 = baseManifest(dir)

    // the second pass was INCREMENTAL: its manifest keeps the prior
    // sorted generation for carried buckets plus its own
    val (sb2, gens2) = Upsert.sortedByOf(man2)
    assert(sb2 == Seq("k"))
    assert(gens2.contains(man2.gen), "new generation joins the sorted set")

    // every bucket the delta wave did NOT touch carries its file(s)
    // verbatim — same relative paths, zero rewrite
    val touched = man2.files.filter { case (b, fs) =>
      fs.exists(_.contains(s"__gen=${man2.gen}/"))
    }.keySet
    val carried = man2.files.keySet.diff(touched)
    assert(carried.nonEmpty, s"expected untouched buckets at 64 buckets " +
      s"and a sparse wave; files=${man2.files.keySet}")
    carried.foreach { b =>
      assert(man2.files(b) == man1.files(b),
        s"untouched bucket $b must carry the previous manifest's files")
    }
    assert(touched.nonEmpty)
    if (gens2.size > 1) assert(gens2.contains(man1.gen))

    // content parity with LWW ground truth
    val expect = ((0 until n).map(i => pkOf(i) ->
        (if (i % 97 == 0) s"b$i" else s"a$i"))
      .filterNot { case (k, _) => k == pkOf(5) || k == pkOf(105) }).sorted
    assert(readAll(dir) == expect)

    // every file the incremental pass staged is internally pk-sorted
    touched.foreach { b =>
      man2.files(b).filter(_.contains(s"__gen=${man2.gen}/")).foreach { rel =>
        val ks = spark.read.parquet(s"$dir/base/$rel")
          .select("k").as[String].collect().toSeq
        assert(ks == ks.sorted, s"staged file $rel is not pk-sorted")
      }
    }

    // a third wave composes: the sorted-generation set self-prunes to
    // generations still owning referenced files
    MergeOnRead.merge(spark, dir, rows(0 until n by 101, 4L, "c"))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 64, bloom = true, sortBase = true)
    val man3 = baseManifest(dir)
    val (_, gens3) = Upsert.sortedByOf(man3)
    val referenced = man3.allFiles.flatMap(rel =>
      """__gen=(\d+)/""".r.findFirstMatchIn(rel).map(_.group(1).toLong)).toSet
    assert(gens3.toSet == referenced + man3.gen ||
      gens3.toSet == referenced,
      s"sorted gens $gens3 must prune to referenced generations $referenced")
    val expect3 = ((0 until n).map { i =>
      pkOf(i) -> (if (i % 101 == 0) s"c$i"
        else if (i % 97 == 0) s"b$i" else s"a$i")
    }.filterNot { case (k, _) =>
      (k == pkOf(5) || k == pkOf(105)) && !(5 % 101 == 0)
    }).sorted
    // keys 5 and 105 were deleted; 5 % 101 != 0 and 105 % 101 != 0, so
    // neither resurrects
    assert(readAll(dir) == expect3.filterNot(e =>
      e._1 == pkOf(5) || e._1 == pkOf(105)))
  }

  test("brand-new buckets (no base file) land through the insert leg, sorted") {
    val dir = Files.createTempDirectory("incr_newbucket").toString
    MergeOnRead.recordContract(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 64)
    // 3 initial keys occupy at most 3 of 64 buckets
    MergeOnRead.merge(spark, dir, rows(Seq(1, 2, 3), 1L, "a"))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 64, sortBase = true)
    val man1 = baseManifest(dir)
    // 200 new keys scatter across mostly-empty buckets
    MergeOnRead.merge(spark, dir, rows(100 until 300, 2L, "n"))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 64, sortBase = true)
    val man2 = baseManifest(dir)
    assert(man2.files.keySet.size > man1.files.keySet.size,
      "new buckets must appear")
    val expect = (Seq(1, 2, 3).map(i => pkOf(i) -> s"a$i") ++
      (100 until 300).map(i => pkOf(i) -> s"n$i")).sorted
    assert(readAll(dir) == expect)
    // new-bucket files are sorted too
    man2.files.values.flatten.filter(_.contains(s"__gen=${man2.gen}/"))
      .foreach { rel =>
        val ks = spark.read.parquet(s"$dir/base/$rel")
          .select("k").as[String].collect().toSeq
        assert(ks == ks.sorted, s"insert-leg file $rel is not pk-sorted")
      }
  }

  test("ineligible bases fall back to the full path") {
    val dir = Files.createTempDirectory("incr_fallback").toString
    MergeOnRead.recordContract(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 8)
    MergeOnRead.merge(spark, dir, rows(0 until 100, 1L, "a"))
    // UNSORTED first compact: no ordering to extend
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 8, sortBase = false)
    MergeOnRead.merge(spark, dir, rows(0 until 100 by 7, 2L, "b"))
    MergeOnRead.compact(spark, dir, Seq("k"), "ver", Some("op"),
      numBuckets = 8, sortBase = true)
    val man = baseManifest(dir)
    // full path: ONE sorted generation, every file from it
    assert(Upsert.sortedByOf(man)._2 == Seq(man.gen))
    assert(man.allFiles.forall(_.contains(s"__gen=${man.gen}/")))
    val expect = (0 until 100).map(i =>
      pkOf(i) -> (if (i % 7 == 0) s"b$i" else s"a$i")).sorted
    assert(readAll(dir) == expect)
  }

  test("OrderedGuard verifies the claim instead of trusting it") {
    // true claim: passes, and the plan reports the ordering
    val sorted = spark.range(100)
      .select((col("id") / 10).cast("int").as("b"), col("id").as("k"))
      .repartition(2, col("b"))
      .sortWithinPartitions("b", "k")
    val ok = OrderedGuard.assertSorted(sorted, Seq("b", "k"))
    assert(ok.count() == 100)
    assert(ok.queryExecution.optimizedPlan.collect {
      case n: graft.plans.OrderedGuardNode => n
    }.nonEmpty, "the guard node must survive optimization")

    // false claim: loud typed failure, never silent misorder
    val shuffled = spark.range(100)
      .select((col("id") % 7).cast("int").as("b"), (lit(99) - col("id")).as("k"))
      .repartition(2)
    val err = intercept[Exception] {
      OrderedGuard.assertSorted(shuffled, Seq("b", "k")).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16).toSeq
    assert(chain(err).exists(_.isInstanceOf[OrderedGuardViolation]),
      s"expected OrderedGuardViolation in ${chain(err).map(_.getClass.getName)}")
  }
}
