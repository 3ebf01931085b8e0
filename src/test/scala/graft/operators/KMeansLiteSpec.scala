package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KMeansLiteSpec extends SparkSpec {

  private def e = VectorOps.vecs(graft.sources.Tables.embeddings(spark, sfDir))

  /** mean squared distance to the assigned centroid */
  private def inertia(cents: Seq[(Int, Array[Double])]): Double = {
    val assigned = e.withColumn("cid", KMeansLite.assignUdf(cents)(col("v")))
    val dist = udf { (v: Seq[Double], cid: Int) =>
      val cv = cents.find(_._1 == cid).get._2
      var d = 0.0; var i = 0
      while (i < cv.length) { val x = v(i) - cv(i); d += x * x; i += 1 }
      d
    }
    assigned.agg(avg(dist(col("v"), col("cid")))).collect()(0).getDouble(0)
  }

  test("Lloyd iterations never increase inertia") {
    val i0 = inertia(KMeansLite.fit(e, "vec_id", "v", 4, 0))
    val i1 = inertia(KMeansLite.fit(e, "vec_id", "v", 4, 1))
    val i2 = inertia(KMeansLite.fit(e, "vec_id", "v", 4, 2))
    assert(i1 <= i0 + 1e-9, s"i0=$i0 i1=$i1")
    assert(i2 <= i1 + 1e-9, s"i1=$i1 i2=$i2")
    assert(i1 < i0, "first update must actually move the sampled centroids")
  }

  test("fit is deterministic") {
    val a = KMeansLite.fit(e, "vec_id", "v", 4, 2).map { case (c, v) => (c, v.toSeq) }
    val b = KMeansLite.fit(e, "vec_id", "v", 4, 2).map { case (c, v) => (c, v.toSeq) }
    assert(a == b)
  }

  test("trained codebooks swap into the IVF and PQ machinery") {
    val cents = KMeansLite.fit(e, "vec_id", "v", 4, 2)
    // PQ: trained centroids drive encode + ADC directly
    val pqCents = cents.map { case (cid, cv) => (cid.toLong, cv) }
    val enc = e.select(VectorOps.pqEncodeUdf(pqCents, 4)(col("v")).as("codes"))
    assert(enc.where(expr("exists(codes, c -> c < 0 OR c > 3)")).count() == 0)
    // IVF: add the squared norm and assign — every vector lands in a cell
    val ivfCents = cents.map { case (cid, cv) =>
      (cid.toLong, cv, cv.map(x => x * x).sum) }
    val cells = e.select(VectorOps.ivfAssignUdf(ivfCents)(col("v"), col("nn")).as("cell"))
    assert(cells.where(col("cell") < 0 || col("cell") > 3).count() == 0)
    assert(cells.select("cell").distinct().count() > 1, "clusters differentiate")
  }

  test("s8/s9/s10 share ONE trained codebook per (session, dir)") {
    val qs = graft.SparkEntry.queries
    val before = graft.queries.SimilarityQueries.codebookFits.get()
    qs("s8_kmeans_assign")(spark, sfDir).count()
    qs("s9_ivf_kmeans")(spark, sfDir).count()
    qs("s10_pq_kmeans")(spark, sfDir).count()
    val afterFirst = graft.queries.SimilarityQueries.codebookFits.get()
    assert(afterFirst - before <= 1,
      s"three trained-ANN queries must share one fit (got ${afterFirst - before})")
    qs("s9_ivf_kmeans")(spark, sfDir).count()
    qs("s10_pq_kmeans")(spark, sfDir).count()
    assert(graft.queries.SimilarityQueries.codebookFits.get() == afterFirst,
      "repeat queries must hit the codebook cache")
  }

  test("a cluster that loses every member keeps its previous centroid") {
    import spark.implicits._
    // two far groups + two sampled centroids that both land in group A:
    // cluster 1 empties after assignment, centroid must survive
    val df = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.1, 0.0)),
      (2L, Seq(0.2, 0.0)), (3L, Seq(100.0, 100.0)))
      .toDF("vec_id", "v")
    val cents = KMeansLite.fit(df.where(col("vec_id") < 3), "vec_id", "v", 2, 1)
    assert(cents.map(_._1) == Seq(0, 1))
    assert(cents.forall(_._2.length == 2))
  }
}
