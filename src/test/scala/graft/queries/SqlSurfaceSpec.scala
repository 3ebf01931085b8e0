package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}
import graft.sources.Tables

/** SQL-surface parity: users who speak SQL instead of the DataFrame API
  * get identical results through temp views + spark.sql, including the
  * extension-registered functions.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit =
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).createOrReplaceTempView(t)
      catch { case _: Throwable => () }
    }

  test("SQL aggregation equals the DataFrame pack result") {
    registerViews()
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val df = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sql == df)
  }

  test("SQL window + join pipeline equals the gated query") {
    registerViews()
    val sql = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gated = SparkEntry.queries("w1_latest_order_per_customer")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql == gated)
  }

  test("extension functions are callable from SQL over views") {
    registerViews()
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("uuid3"),
      graft.functions.Uuid3.info, graft.functions.Uuid3.builder)
    val ids = spark.sql(
      "SELECT uuid3(concat(source, ':', cast(doc_id as string))) AS uid FROM documents LIMIT 5")
      .collect().map(_.getString(0))
    assert(ids.forall(u => u.length == 36 && u.charAt(14) == '3'))
    assert(ids.distinct.length == ids.length)
  }

  test("registered UDF helpers cover the new tiers from SQL") {
    registerViews()
    graft.GraftExtensions.registerUdfs(spark)
    val r = spark.sql(
      """SELECT lang_id('Le recours est rejeté dans la mesure où il est recevable.') AS l,
        |       size(sentences_icu('Erster Satz. Gemäss Art. 5 Abs. 2 gilt dies. Ende.', 'de')) AS n
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "fr")
    assert(r.getInt(1) == 3)
  }

  test("ngram family is callable from SQL with safe edges") {
    registerViews()
    graft.GraftExtensions.registerNative(spark)
    val r = spark.sql(
      """SELECT word_ngrams(array('a','b','c'), 2) AS wg,
        |       word_ngrams(array('a'), 0) AS w0,
        |       char_ngrams('abcd', 3) AS cg,
        |       char_ngrams('ab', 5) AS c0""".stripMargin).collect()(0)
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[String](1).isEmpty)
    assert(r.getSeq[String](2) == Seq("abc", "bcd"))
    assert(r.getSeq[String](3).isEmpty)
  }

  test("sorted_intersect_size is callable from SQL (sorted deduped int arrays)") {
    registerViews()
    graft.GraftExtensions.registerNative(spark)
    val r = spark.sql(
      """SELECT sorted_intersect_size(array(1, 3, 5, 9), array(2, 3, 5, 8, 9)) AS a,
        |       sorted_intersect_size(array(1, 2), array(3, 4)) AS b,
        |       sorted_intersect_size(array(), array(1)) AS c""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 0)
    assert(r.getInt(2) == 0)
  }

  test("sorted_intersect_size rejects non-int arrays and skips null slots (ADVICE r9)") {
    registerViews()
    graft.GraftExtensions.registerNative(spark)
    // string arrays fail at ANALYSIS (the old blind cast silently
    // counted all-null 'intersections')
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_intersect_size(array('a','b'), array('a'))").collect()
    }
    assert(ex.getMessage.contains("array<int>"))
    // null slots never match and never read garbage
    val r = spark.sql(
      """SELECT sorted_intersect_size(array(NULL, 1, 3), array(NULL, 3)) AS a,
        |       sorted_intersect_size(array(CAST(NULL AS INT)), array(CAST(NULL AS INT))) AS b""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) == 1)
    assert(r.getInt(1) == 0)
  }

  test("minhash_sig and cosine_sim compose in plain SQL") {
    registerViews()
    graft.GraftExtensions.registerNative(spark)
    // signature from SQL equals the operator's band source
    val sql = spark.sql(
      """SELECT doc_id, minhash_sig(split(text, ' '), 4) AS sig
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val op = graft.operators.MinHashLSH.bands(
      Tables.documents(spark, sfDir).where(col("doc_id") < 3),
      "doc_id", split(col("text"), " "), 4)
      .groupBy("doc_id").agg(sort_array(collect_list("h")).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((id, sig) <- sql) assert(sig.sorted == op(id), s"doc $id")
    // cosine self-similarity is exactly 1
    val cos = spark.sql(
      """SELECT cosine_sim(e, e, nn, nn) AS c FROM (
        |  SELECT embedding::array<double> AS e,
        |         aggregate(transform(embedding,
        |                     x -> cast(x as double) * cast(x as double)),
        |                   cast(0 as double), (a, x) -> a + x) AS nn
        |  FROM embeddings LIMIT 5)""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-9))
  }
}
