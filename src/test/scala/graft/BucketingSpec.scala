package graft

import org.apache.spark.sql.functions._
import graft.io.{Bucketing, Tables}

/** Plan-level proof of the co-located-join design: bucketed fact
  * tables join and aggregate on the bucket key with ZERO Exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join on the bucket key plans without a shuffle") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Bucketing.writeBucketed(Tables.lineitem(spark, sf), "li_b", "l_orderkey", 4,
        sortCols = Seq("l_orderkey"))
      Bucketing.writeBucketed(Tables.orders(spark, sf), "o_b", "o_orderkey", 4,
        sortCols = Seq("o_orderkey"))
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it's still correct
      val viaBuckets = joined.count()
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey").distinct().count()
      assert(viaBuckets == plain)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
