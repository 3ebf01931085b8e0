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

  test("separated blobs: two-level fit + assign ≡ brute fit + assign end-to-end") {
    // d33's exactness-on-separated-data claim at the FIT level, not
    // just the assignment UDF: construct ids so the hash-ordered seeds
    // (fit's init contract) land one per blob — the first two anchor
    // the coarse fit, all four the fine — then the hierarchical Lloyd
    // step and corpus assignment must equal the brute path bit for bit
    val centers = Seq(Array(0.0, 100.0), Array(100.0, 0.0),
      Array(0.0, 110.0), Array(110.0, 0.0))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = (0L until 80L).toSeq
    val hashOrder = ids.sortBy(i => (md5hex(i.toString), i))
    val seedIds = hashOrder.take(4)
    val rest = ids.filterNot(seedIds.contains)
    val rows = seedIds.zipWithIndex.map { case (id, j) =>
        (id, centers(j).toSeq) } ++
      rest.zipWithIndex.map { case (id, j) =>
        val c = centers(j % 4)
        (id, Seq(c(0) + ((j * 7) % 10) * 0.01, c(1) - ((j * 3) % 10) * 0.01))
      }
    val df = rows.toDF("id", "v")
    val flat = KMeansLite.fit(df, "id", "v", 4, 1)
    val (coarse, fine) = KMeansLite.fitHierarchical(df, "id", "v", 4, 2, 1)
    assert(fine.map { case (c, a) => (c, a.toSeq) } ==
      flat.map { case (c, a) => (c, a.toSeq) })
    val brute = assignments(df, KMeansLite.assignUdf(flat))
    val two = assignments(df, KMeansLite.assignHierarchicalUdf(coarse, fine))
    assert(two == brute)
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
