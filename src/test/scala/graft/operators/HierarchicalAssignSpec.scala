package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the two-level (coarse → fine) centroid assignment — the
  * production remedy for scaled-k SemDeDup's n·k argmin term (PERF.md
  * round 10): exactness under a degenerate hierarchy, agreement with
  * the brute argmin on separated data, the empty-coarse-cell fallback,
  * deterministic tie-breaks, and the null-vector quarantine.
  */
class HierarchicalAssignSpec extends SparkSpec {

  import spark.implicits._

  private def vecsDf(vs: Seq[Array[Double]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "v")

  private def assignments(df: org.apache.spark.sql.DataFrame,
                          u: org.apache.spark.sql.expressions.UserDefinedFunction)
      : Map[Long, Int] =
    df.withColumn("cid", u(col("v"))).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap

  private val rnd = new scala.util.Random(7)
  private def rv(dim: Int): Array[Double] =
    Array.fill(dim)(rnd.nextDouble() * 10 - 5)

  test("coarse == fine degenerates to the brute argmin exactly") {
    val fine = (0 until 8).map(i => (i, rv(6)))
    val df = vecsDf(Seq.fill(50)(rv(6)))
    val brute = assignments(df, KMeansLite.assignUdf(fine))
    val two = assignments(df, KMeansLite.assignHierarchicalUdf(fine, fine))
    assert(two == brute)
  }

  test("well-separated clusters: two-level equals brute at sqrt-k coarse") {
    // four corners, fine centroids jittered around each corner, coarse
    // = the corner anchors; every vector near a corner must resolve
    // identically through either path
    val corners = Seq(Array(-10.0, -10.0), Array(-10.0, 10.0),
      Array(10.0, -10.0), Array(10.0, 10.0))
    val coarse = corners.zipWithIndex.map { case (c, i) => (i, c) }
    val fine = (0 until 12).map { i =>
      val c = corners(i % 4)
      (i, Array(c(0) + (i / 4) * 0.3, c(1) - (i / 4) * 0.2))
    }
    val vs = (0 until 80).map { i =>
      val c = corners(i % 4)
      Array(c(0) + rnd.nextDouble() - 0.5, c(1) + rnd.nextDouble() - 0.5)
    }
    val df = vecsDf(vs)
    val brute = assignments(df, KMeansLite.assignUdf(fine))
    val two = assignments(df,
      KMeansLite.assignHierarchicalUdf(coarse, fine))
    assert(two == brute)
  }

  test("a coarse cell owning no fine members falls back to the full argmin") {
    // coarse cell 0 at the origin attracts NO fine centroid (all fine
    // mass sits at the far corner); a vector near the origin routes to
    // the empty cell and must still get its true nearest fine centroid
    val coarse = Seq((0, Array(0.0, 0.0)), (1, Array(100.0, 100.0)))
    val fine = Seq((0, Array(99.0, 99.0)), (1, Array(101.0, 101.0)))
    val df = vecsDf(Seq(Array(1.0, 1.0)))
    val two = assignments(df,
      KMeansLite.assignHierarchicalUdf(coarse, fine))
    assert(two == Map(0L -> 0)) // (99,99) is nearest to (1,1)
  }

  test("ties break to the lowest cid at both levels") {
    // duplicate fine centroids: the equidistant vector takes cid 0;
    // duplicate coarse anchors: routing is stable (cid 0's group)
    val coarse = Seq((0, Array(0.0)), (1, Array(0.0)))
    val fine = Seq((0, Array(2.0)), (1, Array(2.0)), (2, Array(-2.0)))
    val df = vecsDf(Seq(Array(2.0), Array(-2.0), Array(0.0)))
    val two = assignments(df,
      KMeansLite.assignHierarchicalUdf(coarse, fine))
    assert(two(0L) == 0) // duplicate fine tie -> lowest cid
    assert(two(1L) == 2)
    assert(two(2L) == 0) // equidistant 2/-2 -> lowest cid wins
  }

  test("null/empty vectors quarantine as null, as in assignUdf") {
    val fine = Seq((0, Array(0.0, 0.0)))
    val df = Seq((0L, Seq(0.1, 0.1)), (1L, null.asInstanceOf[Seq[Double]]),
        (2L, Seq.empty[Double]))
      .toDF("id", "v")
    val rows = df.withColumn("cid",
        KMeansLite.assignHierarchicalUdf(fine, fine)(col("v")))
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(2) && rows(0).getInt(2) == 0)
    assert(rows(1).isNullAt(2) && rows(2).isNullAt(2))
  }
}
