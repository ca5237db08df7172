package graft
class CboDbgSpec extends SparkSpec {
  test("dbg") {
    val df = graft.ops.Relational.aMetaAgg(spark, "/root/testdata/sf0.1")
    println("DBG schema=" + df.columns.mkString(","))
    println("DBG plan=" + df.queryExecution.executedPlan.toString.take(600))
    println("DBG row=" + df.collect().mkString)
  }
}
