package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Scale-mechanics evidence: bucketed co-located joins eliminate the
  * join Exchange; salted joins preserve results while spreading hot
  * keys.
  */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored). The catalog is per-JVM but the directory persists
    // across runs, so clear both catalog entry AND location.
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sfDir)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    // bucketed join must not shuffle either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), Seq("o_orderkey"))
      joined.count()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed co-located join must not contain an Exchange:\n" + p.take(1200))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("degenerate LSH bucket: capped pair path equals uncapped, and hot bucket bypasses collect") {
    import spark.implicits._
    // 60 identical docs + 10 distinct ones: every band bucket of the
    // identical docs holds all 60 ids — degenerate by construction.
    val docs = ((0 until 60).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta")) ++
      (60 until 70).map(i => (i.toLong, s"unique$i text body number $i words here")))
      .toDF("doc_id", "text")
      .withColumn("w", split(col("text"), " "))

    val uncapped = MinHashLSH.candidatePairs(docs, "doc_id", col("w"), bucketCap = Int.MaxValue)
      .orderBy("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1)))
    val capped = MinHashLSH.candidatePairs(docs, "doc_id", col("w"), bucketCap = 10)
      .orderBy("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.sameElements(uncapped), "bucket cap must not change the candidate set")
    assert(uncapped.length >= 60 * 59 / 2, "degenerate bucket must produce the full pair set")

    // the hot bucket must actually be routed away from collect_list:
    // with cap=10 the cold path sees only the 10 distinct docs, whose
    // buckets are singletons -> no bucket on the collect path exceeds 10
    val bandsDf = MinHashLSH.bands(docs, "doc_id", col("w"), 4)
    val hot = bandsDf.groupBy("band", "h").agg(count(lit(1)).as("n"))
      .where(col("n") > 10)
    assert(hot.count() > 0, "test must actually create a hot bucket")
  }

  test("degenerate embedding bucket: capped neardup path equals uncapped") {
    import spark.implicits._
    // 40 identical vectors (one bucket, all pairs cos=1) + 8 varied
    val vecs = ((0 until 40).map(i => (i.toLong, Array(1.0f, 2.0f, 3.0f, 4.0f))) ++
      (40 until 48).map(i => (i.toLong, Array(i.toFloat, 1.0f, -2.0f, 0.5f))))
      .toDF("vec_id", "embedding")
    val e = VectorOps.vecs(vecs).withColumn("bucket", VectorOps.bucket)
    def run(cap: Int) = VectorOps.neardupPairs(e, minCos = 0.29, bucketCap = cap)
      .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))
      .orderBy("ia", "ib").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val uncapped = run(Int.MaxValue)
    val capped = run(8)
    assert(capped.sameElements(uncapped), "bucket cap must not change pairs or cosines")
    assert(uncapped.count(p => p._1 < 40 && p._2 < 40) == 40 * 39 / 2)
  }

  test("salted join equals the plain join") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val dim = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(dim, Seq("o_custkey"))
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedJoin(orders, dim, "o_custkey", nSalts = 4)
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }
}
