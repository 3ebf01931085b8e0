package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{KMeansLite, VectorOps}

/** Stage attribution for the centroids-as-DataFrame tier (d34/s24):
  * times each phase — coarse fit, dist fine fit, dist assignment,
  * dedup tail — separately at sf0.1, so a fixed-overhead band is
  * attributable to a stage instead of guessed at.
  */
object DistProbe {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"DISTPROBE $name ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val e = VectorOps.vecs(graft.sources.Tables.embeddings(spark, d))
      .select("vec_id", "v", "nn")
    val n = e.count()
    val k = math.max(4L, n / 100).toInt
    val kc = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    println(s"DISTPROBE n=$n k=$k kc=$kc")
    for (i <- 1 to 2) {
      println(s"DISTPROBE --- iter $i")
      val coarse = t("coarse_fit")(KMeansLite.fit(e, "vec_id", "v", kc, 1))
      val (c2, fineU) = t("udf_fit")(
        KMeansLite.fitHierarchical(e, "vec_id", "v", k, kc, 1))
      t("udf_assign")(e.withColumn("cid",
        KMeansLite.assignHierarchicalUdf(c2, fineU)(col("v"))).count())
      val (c3, fineDf) = t("dist_fit")(
        KMeansLite.fitHierarchicalDist(e, "vec_id", "v", k, kc, 1))
      val asg = t("dist_assign")(
        KMeansLite.assignHierDistDf(e, "vec_id", "v", c3, fineDf)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      t("dist_assign_count")(asg.count())
      asg.unpersist()
      fineDf.unpersist()
      t("gate_d33")(graft.SparkEntry.queries("d33_semantic_dedup_hier")(spark, d).count())
      t("gate_d34")(graft.SparkEntry.queries("d34_semantic_dedup_dist")(spark, d).count())
      // tail stages under a dist assignment, isolated
      val asg2 = KMeansLite.assignHierDistDf(e, "vec_id", "v", c3, fineDf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      asg2.count()
      val assigned = e.join(asg2, Seq("vec_id"))
        .withColumn("cid", col("cid").cast("bigint"))
      val a = assigned.select(col("cid"), col("vec_id").as("ia"),
        col("v").as("qv"), col("nn").as("qn"))
      val b = assigned.select(col("cid"), col("vec_id").as("ib"),
        col("v"), col("nn"))
      val pairs = a.join(b, "cid").where(col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          round(expr("cosine_sim(qv, v, qn, nn)"), 6).as("cos"))
        .where(col("cos") > 0.3)
      t("tail_pairs_count")(pairs.count())
      val pairKey = concat(col("ia"), lit("_"), col("ib"))
      val edges = pairs.select(col("ia").as("vec_id"),
          lit(0).as("band"), pairKey.as("h"))
        .union(pairs.select(col("ib").as("vec_id"),
          lit(0).as("band"), pairKey.as("h")))
      t("tail_edges_count")(edges.count())
      val (closed, rounds) = t("tail_converge")(
        graft.operators.MinHashLSH.convergeKeepListWithStats(edges, "vec_id"))
      println(s"DISTPROBE tail_rounds=$rounds")
      t("tail_final")(e.select("vec_id").join(closed, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("keep_id"), col("vec_id")).as("keep_id")).count())
      asg2.unpersist()
      // SAME tail under the UDF assignment — the control
      val assignedU = e.withColumn("cid",
        KMeansLite.assignHierarchicalUdf(c2, fineU)(col("v")).cast("bigint"))
      val aU = assignedU.select(col("cid"), col("vec_id").as("ia"),
        col("v").as("qv"), col("nn").as("qn"))
      val bU = assignedU.select(col("cid"), col("vec_id").as("ib"),
        col("v"), col("nn"))
      val pairsU = aU.join(bU, "cid").where(col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          round(expr("cosine_sim(qv, v, qn, nn)"), 6).as("cos"))
        .where(col("cos") > 0.3)
      val pairKeyU = concat(col("ia"), lit("_"), col("ib"))
      val edgesU = pairsU.select(col("ia").as("vec_id"),
          lit(0).as("band"), pairKeyU.as("h"))
        .union(pairsU.select(col("ib").as("vec_id"),
          lit(0).as("band"), pairKeyU.as("h")))
      t("tailU_edges_count")(edgesU.count())
      val (closedU, roundsU) = t("tailU_converge")(
        graft.operators.MinHashLSH.convergeKeepListWithStats(edgesU, "vec_id"))
      println(s"DISTPROBE tailU_rounds=$roundsU")
      closedU.unpersist()
    }
    spark.stop()
  }
}
