package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.model._
import graft.streaming.{BoundedDays, StateLogic, Stateful}

/** Property-based invariants (SURVEY.md §5.3) for the stateful
  * operator family — randomized inputs, algebraic postconditions.
  */
object StatefulProps extends Properties("Stateful") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val keyGen = Gen.oneOf("u1", "u2", "u3", "u4")
  private val dayGen = Gen.choose(1, 9).map(d => f"2024-01-0$d%d")

  property("firstSeenPerDay emits exactly distinct (key, day)") =
    Prop.forAll(Gen.listOf(Gen.zip(keyGen, dayGen))) { evs =>
      import spark.implicits._
      val in = evs.map { case (k, d) => KeyDay(k, d) }
      val out = Stateful.firstSeenPerDay(in.toDS()).collect()
      out.map(f => (f.key, f.day)).toSet == in.map(e => (e.key, e.day)).toSet &&
        out.length == in.map(e => (e.key, e.day)).distinct.length
    }

  property("upsertDeltas telescopes to the newest version per key") =
    Prop.forAll(Gen.listOf(Gen.zip(keyGen, Gen.choose(0L, 5L), Gen.choose(-100L, 100L)))) { evs =>
      import spark.implicits._
      val in = evs.map { case (k, ts, amt) => VersionedAmount(k, ts, amt) }
      val out = Stateful.upsertDeltas(in.toDS()).collect()
      val sums = out.groupBy(_.key).view.mapValues(_.map(_.delta).sum).toMap
      val expected = in.groupBy(_.key).view
        .mapValues(vs => vs.maxBy(v => (v.ts, v.amount)).amount).toMap
      sums == expected
    }

  property("isNewFix: at most one day per mid carries is_new=1") =
    Prop.forAll(Gen.listOf(Gen.zip(keyGen, dayGen, Gen.oneOf("0", "1")))) { evs =>
      import spark.implicits._
      val in = evs.map { case (m, d, n) => VisitorHit(m, d, n) }
      val out = Stateful.isNewFix(in.toDS()).collect()
      out.filter(_.isNew == "1").groupBy(_.mid)
        .forall { case (_, hits) => hits.map(_.day).distinct.size <= 1 }
    }

  property("salted aggregation equals plain aggregation") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(keyGen, Gen.choose(-1000L, 1000L)))) { rows =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val df = rows.toDF("k", "v").withColumn("rid",
        monotonically_increasing_id())
      val plain = df.groupBy(col("k")).agg(sum(col("v")).as("total"))
        .as[(String, Long)].collect().toMap
      val salted = graft.ops.Skew.saltedSum(df, col("k"), col("rid"), 8, col("v"))
        .as[(String, Long)].collect().toMap
      salted == plain
    }

  property("upsertDeltas window-sum equals latest-value sum (A7 contract)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(keyGen, Gen.choose(0L, 9L), Gen.choose(0L, 500L)))) { evs =>
      import spark.implicits._
      val in = evs.map { case (k, ts, amt) => VersionedAmount(k, ts, amt) }
      val deltaTotal = Stateful.upsertDeltas(in.toDS()).collect().map(_.delta).sum
      val latestTotal = in.groupBy(_.key).values
        .map(vs => vs.maxBy(v => (v.ts, v.amount)).amount).sum
      deltaTotal == latestTotal
    }

  // ---- pure StateLogic properties (no Spark job): the 100 TB state
  // contract for the A6/login family ----

  private def foldFirstSeen(days: Seq[String]): (Int, Option[BoundedDays]) = {
    var st: Option[BoundedDays] = None
    var emits = 0
    days.foreach { d =>
      val (e, next) = StateLogic.firstSeenStep(st, d)
      if (e) emits += 1
      st = Some(next)
    }
    (emits, st)
  }

  /** Adversarial replay over 10 years of day offsets in arbitrary
    * order: per-key state NEVER exceeds retainDays+1 entries. */
  property("firstSeenStep state is bounded under adversarial multi-year replay") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 3650))) { offs =>
      val base = java.time.LocalDate.parse("2020-01-01")
      var st: Option[BoundedDays] = None
      offs.forall { o =>
        val (_, next) = StateLogic.firstSeenStep(st, base.plusDays(o.toLong).toString)
        st = Some(next)
        next.recent.size + 1 <= StateLogic.DefaultRetainDays + 1 &&
          next.recent.forall(_ < next.maxDay)
      }
    }

  property("firstSeenStep ascending replay emits exactly once per day; re-replay emits zero") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 3650))) { offs =>
      val base = java.time.LocalDate.parse("2020-01-01")
      val days = offs.map(o => base.plusDays(o.toLong).toString).distinct.sorted
      val (emits, st) = foldFirstSeen(days)
      // replaying the same days against the final state emits nothing
      val replayEmits = days.map { d =>
        if (StateLogic.firstSeenStep(st, d)._1) 1 else 0
      }.sum
      emits == days.size && replayEmits == 0
    }

  private def foldLogin(days: Seq[String], gapDays: Int): Long = {
    var st: Option[String] = None
    var uu = 0L
    days.foreach { d =>
      val (e, _, next) = StateLogic.loginStep(st, d, gapDays)
      if (e) uu += 1
      st = Some(next)
    }
    uu
  }

  /** VERDICT r1 #4: shuffled replay of the same events never increases
    * Σuu — an out-of-order or duplicated older day cannot re-emit. */
  property("loginStep: shuffled+duplicated replay never exceeds sorted Σuu") =
    Prop.forAll(
      Gen.listOf(Gen.choose(0, 60)),
      Gen.choose(0L, Long.MaxValue)) { (offs, seed) =>
      val base = java.time.LocalDate.parse("2024-01-01")
      val days = offs.map(o => base.plusDays(o.toLong).toString)
      val sortedUu = foldLogin(days.distinct.sorted, 7)
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(days ++ days) // duplicate + shuffle
      foldLogin(shuffled, 7) <= sortedUu &&
        sortedUu == days.distinct.size.toLong
    }

  property("window counts conserve total rows") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 86400L * 30))) { offsets =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val df = offsets.toDF("off")
        .select(timestamp_seconds(lit(1704067200L) + col("off")).as("ts"))
      val windowed = df.groupBy(window(col("ts"), "1 hour")).count()
      windowed.agg(sum("count")).as[Long].head() == offsets.size.toLong
    }
}
