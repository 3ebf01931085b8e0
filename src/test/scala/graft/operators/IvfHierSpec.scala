package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the two-level IVF routing in the tier's own metric (argmax
  * COSINE) — VectorOps.ivfAssignHierUdf / ivfProbeHierUdf, the s20
  * machinery: exactness under a degenerate hierarchy, agreement with
  * the flat argmax on direction-separated data, the empty-coarse-cell
  * fallback at both assign and probe, deterministic tie-breaks, and
  * the null-vector quarantine.
  */
class IvfHierSpec extends SparkSpec {

  import spark.implicits._

  private def nnOf(v: Seq[Double]): Double = v.map(x => x * x).sum

  private def vecsDf(vs: Seq[Array[Double]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq, nnOf(v.toSeq)) }
      .toDF("id", "v", "nn")

  private def cb(vs: Seq[Array[Double]]): Seq[(Long, Array[Double], Double)] =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v, nnOf(v.toSeq)) }

  private def assignments(df: org.apache.spark.sql.DataFrame,
                          u: org.apache.spark.sql.expressions.UserDefinedFunction)
      : Map[Long, Long] =
    df.withColumn("cell", u(col("v"), col("nn"))).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap

  private def probes(df: org.apache.spark.sql.DataFrame,
                     u: org.apache.spark.sql.expressions.UserDefinedFunction)
      : Map[Long, Seq[Long]] =
    df.withColumn("cells", u(col("v"), col("nn"))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](3)).toMap

  private val rnd = new scala.util.Random(11)
  private def rv(dim: Int): Array[Double] =
    Array.fill(dim)(rnd.nextDouble() * 10 - 5)

  test("coarse == fine degenerates to the flat cosine argmax exactly") {
    val fine = cb(Seq.fill(8)(rv(6)))
    val df = vecsDf(Seq.fill(50)(rv(6)))
    val flat = assignments(df, VectorOps.ivfAssignUdf(fine))
    val two = assignments(df, VectorOps.ivfAssignHierUdf(fine, fine))
    assert(two == flat)
  }

  test("direction-separated cones: two-level equals flat assign AND probe") {
    // four well-separated directions; fine cells are small angular
    // jitters of each anchor, coarse = the anchors. Every vector inside
    // a cone resolves identically through either path, and the probe's
    // two routed coarse cells always contain the flat probe's top-2
    // fine cells (the cones are far apart in angle).
    val anchors = Seq(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0), Array(-1.0, -1.0, -1.0))
    val coarse = cb(anchors)
    val fine = cb((0 until 12).map { i =>
      val a = anchors(i % 4)
      Array(a(0) * (1 + i / 4 * 0.1) + 0.02 * (i / 4),
        a(1) * (1 + i / 4 * 0.1) - 0.01 * (i / 4),
        a(2) * (1 + i / 4 * 0.1))
    })
    val vs = (0 until 80).map { i =>
      val a = anchors(i % 4)
      Array(a(0) * 3 + (rnd.nextDouble() - 0.5) * 0.1,
        a(1) * 3 + (rnd.nextDouble() - 0.5) * 0.1,
        a(2) * 3 + (rnd.nextDouble() - 0.5) * 0.1)
    }
    val df = vecsDf(vs)
    assert(assignments(df, VectorOps.ivfAssignHierUdf(coarse, fine)) ==
      assignments(df, VectorOps.ivfAssignUdf(fine)))
    // flat top-2 probe vs two-level (pc=2 coarse, nprobe=2): both cones
    // nearest a vector carry all their jittered fine cells, so the
    // candidate set contains the flat winner list
    assert(probes(df, VectorOps.ivfProbeHierUdf(coarse, fine, 2, 2)) ==
      probes(df, VectorOps.ivfProbeUdf(fine, 2)))
  }

  test("a coarse cell owning no fine members falls back to the full argmax") {
    // coarse cell 0 points +x and attracts NO fine cell (all fine mass
    // points -x-ish); a +x vector routes to the empty cell and must
    // still resolve its true cosine-nearest fine cell — and the probe
    // must fall back the same way instead of returning nothing
    val coarse = cb(Seq(Array(1.0, 0.0), Array(-1.0, 0.0)))
    val fine = cb(Seq(Array(-1.0, 0.1), Array(-1.0, -0.1)))
    val df = vecsDf(Seq(Array(2.0, 0.5)))
    val two = assignments(df, VectorOps.ivfAssignHierUdf(coarse, fine))
    assert(two == Map(0L -> 0L)) // (-1, .1) beats (-1, -.1) for (2, .5)
    val p = probes(df, VectorOps.ivfProbeHierUdf(coarse, fine, 1, 2))
    assert(p == Map(0L -> Seq(0L, 1L)))
  }

  test("cosine ties break to the lowest cell id at both levels") {
    // duplicate fine cells (same direction): the vector takes cid 0;
    // duplicate coarse anchors: routing is stable (cid 0's group owns
    // all fine members, assignment unchanged)
    val coarse = cb(Seq(Array(1.0, 1.0), Array(1.0, 1.0)))
    val fine = cb(Seq(Array(2.0, 0.0), Array(4.0, 0.0), Array(0.0, 2.0)))
    val df = vecsDf(Seq(Array(3.0, 0.0), Array(0.0, 5.0), Array(1.0, 1.0)))
    val two = assignments(df, VectorOps.ivfAssignHierUdf(coarse, fine))
    assert(two(0L) == 0L) // cells 0/1 are the same direction -> lowest cid
    assert(two(1L) == 2L)
    assert(two(2L) == 0L) // equidistant in angle to cid 0 and 2 -> lowest
    val p = probes(df, VectorOps.ivfProbeHierUdf(coarse, fine, 2, 2))
    assert(p(0L) == Seq(0L, 1L)) // equal-cosine duplicates rank by cid
  }

  test("null/empty vectors quarantine (null assign, empty probe list)") {
    val fine = cb(Seq(Array(1.0, 0.0)))
    val df = Seq((0L, Seq(0.5, 0.5), 0.5),
        (1L, null.asInstanceOf[Seq[Double]], 0.0),
        (2L, Seq.empty[Double], 0.0))
      .toDF("id", "v", "nn")
    val rows = df
      .withColumn("cell", VectorOps.ivfAssignHierUdf(fine, fine)(col("v"), col("nn")))
      .withColumn("cells", VectorOps.ivfProbeHierUdf(fine, fine, 1, 1)(col("v"), col("nn")))
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(3) && rows(0).getLong(3) == 0L)
    assert(rows(1).isNullAt(3) && rows(2).isNullAt(3))
    assert(rows(0).getSeq[Long](4) == Seq(0L))
    assert(rows(1).getSeq[Long](4).isEmpty && rows(2).getSeq[Long](4).isEmpty)
  }
}
