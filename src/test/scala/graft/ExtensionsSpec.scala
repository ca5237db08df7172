package graft

import graft.core.GraftFunctions

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native functions usable from pure SQL after registration") {
    GraftFunctions.register(spark)
    graft.io.Tables.documents(spark, sf).createOrReplaceTempView("docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash64(split(text, ' ')) AS simhash FROM docs")
      .as[(Long, Long)].collect().toMap
    val viaApi = graft.llm.Dedup.simhashSignatures(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaApi)
  }

  test("graft_cjk_tokens segments mixed text: bigram CJK runs, whole latin runs") {
    GraftFunctions.register(spark)
    val toks = spark.sql(
      """SELECT graft_cjk_tokens('buy苹果手机 now  雪') AS t""")
      .as[Seq[String]].head()
    assert(toks == Seq("buy", "苹果", "果手", "手机", "now", "雪"))
    // pure whitespace text degrades to plain word split (no empties)
    val en = spark.sql("SELECT graft_cjk_tokens(' spark  engine ') AS t")
      .as[Seq[String]].head()
    assert(en == Seq("spark", "engine"))
  }

  test("SQL similarity pipeline composes from registered functions") {
    GraftFunctions.register(spark)
    graft.io.Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val rows = spark.sql(
      """SELECT a.vec_id ida, b.vec_id idb,
                graft_dot_long(graft_quantize_vec(a.embedding, 1000),
                               graft_quantize_vec(b.embedding, 1000)) AS dot
         FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id = 1""")
      .collect()
    assert(rows.length == 1)
    // cross-check against the Column API
    import graft.functions.functions._
    import org.apache.spark.sql.functions._
    val e = graft.io.Tables.embeddings(spark, sf)
      .select(col("vec_id"), quantize_vec(col("embedding"), 1000).as("q"))
    val q0 = e.filter(col("vec_id") === 0).select("q")
    val q1 = e.filter(col("vec_id") === 1).select(col("q").as("q2"))
    val apiDot = q0.crossJoin(q1).select(dot_long(col("q"), col("q2"))).as[Long].head()
    assert(rows.head.getAs[Long]("dot") == apiDot)
  }
}
