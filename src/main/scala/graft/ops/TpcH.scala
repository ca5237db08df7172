package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** TPC-H-style headline queries over the driver's star schema — the
  * benchmark heads that exercise the scan→filter→join→agg spine at
  * sf0.1 and are the shapes that dominate at 100 TB.
  *
  * Scale notes: q1 is a pure scan+partial-agg (no shuffle besides the
  * 6-group final merge); q3/q5 shuffle facts on their join keys once and
  * broadcast every dimension; all money math is integer cents so results
  * are bit-exact vs the DuckDB oracle.
  */
object TpcH {

  private def cents(c: Column): Column = floor(c * 100).cast("long")

  /** Q1-style pricing summary: scan + wide aggregate, 6 output groups. */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
        count(lit(1)).as("count_order"))

  /** Q3-style shipping priority: dim-filtered 3-way join, per-order revenue. */
  def q3Shipping(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
  }

  /** Q7-style nation-pair volume: fact join + two dim legs on
    * different keys, grouped by (supplier nation, customer nation,
    * ship year). Exercises multi-alias dim reuse (nation joined twice).
    */
  def q7Volume(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n1 = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("volume_cents"))
  }

  /** Q18-style large-volume customers: aggregate-then-semi-join —
    * orders whose total quantity exceeds a threshold, with customer
    * context. The HAVING subquery becomes a filtered aggregate joined
    * back to the facts (no correlated subquery at scale).
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String, minQty: Long = 150L): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("total_qty"))
  }

  /** Q10-style returned-item report: which customers returned goods in
    * a quarter, ranked by lost revenue. Date-filtered fact join
    * (pushdown on o_orderdate + l_returnflag reaches both scans),
    * customer + nation broadcast, one agg shuffle on custkey.
    */
  def q10Returns(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val c = Tables.customer(spark, sfDir)
    val n = broadcast(Tables.nation(spark, sfDir))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_cents"), col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
  }

  /** Q14-style promo revenue share: two-table join + conditional
    * aggregate — the promo fraction as ONE pass over the joined facts
    * (sum(if)/sum, both integer cents; the division is a single
    * int/int IEEE op so the ratio is bit-exact vs the oracle).
    */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val p = broadcast(Tables.part(spark, sfDir))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).otherwise(0L))
          .as("promo_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("total_cents"))
      .withColumn("promo_share",
        col("promo_cents").cast("double") / col("total_cents").cast("double"))
  }

  /** Q5-style local-supplier revenue: 6-way join, group by nation.
    * Facts (lineitem⋈orders) shuffle once on the order key; customer /
    * supplier / nation / region all broadcast.
    */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = broadcast(Tables.nation(spark, sfDir))
    val r = broadcast(Tables.region(spark, sfDir))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
  }
}
