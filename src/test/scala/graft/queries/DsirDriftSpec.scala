package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit pins for the DSIR staleness metric (e31's decision function):
  * the drift is an exact integer cross-multiplication, so its zero,
  * its threshold boundary, and its partitioning-invariance are all
  * EXACT properties, not tolerances.
  */
class DsirDriftSpec extends SparkSpec {

  import spark.implicits._

  private def counts(rows: (Long, Long, Long)*) =
    rows.toDF("b", "cr", "ct")

  private def drift(f: org.apache.spark.sql.DataFrame,
                    l: org.apache.spark.sql.DataFrame,
                    tn: Int, td: Int): (Double, Boolean) = {
    val r = RelationalQueries.dsirDrift(f, l, tn, td).collect()(0)
    (r.getDouble(0), r.getBoolean(1))
  }

  test("identical distributions: drift exactly 0.0, never stale") {
    val c = counts((1L, 10L, 4L), (2L, 5L, 6L), (3L, 1L, 0L))
    val (d, s) = drift(c, c, 1, 1000000) // absurdly tight threshold
    assert(d == 0.0 && !s)
  }

  test("threshold boundary is an exact integer comparison (>= trips at equality)") {
    // frozen: ct = (2, 2); live: ct = (4, 0). Ntf = 4, Ntl = 4.
    // num = |2*4 - 4*4| + |2*4 - 0*4| = 8 + 8 = 16.
    // drift = 16 / (2*4*4) = 0.5 EXACTLY.
    val f = counts((1L, 0L, 2L), (2L, 0L, 2L))
    val l = counts((1L, 0L, 4L), (2L, 0L, 0L))
    val (d, sAtHalf) = drift(f, l, 1, 2)   // tau = 1/2 == drift -> stale
    assert(d == 0.5 && sAtHalf)
    val (_, sAbove) = drift(f, l, 501, 1000) // tau just above -> fresh
    assert(!sAbove)
  }

  test("buckets missing on either side count as zero (full-outer semantics)") {
    // frozen has bucket 1 only; live has bucket 2 only -> total disjoint
    // mass: num = |2*3 - 0| + |0 - 3*2| = 12, drift = 12/(2*2*3) = 1.0
    val f = counts((1L, 0L, 2L))
    val l = counts((2L, 0L, 3L))
    val (d, s) = drift(f, l, 1, 10)
    assert(d == 1.0 && s)
  }

  test("zero target mass is an explicit convention, never NaN") {
    // both sides massless -> nothing to compare, nothing to refresh from
    val z = counts((1L, 10L, 0L), (2L, 5L, 0L))
    val (d0, s0) = drift(z, z, 1, 10)
    assert(d0 == 0.0 && !s0)
    // one side massless, the other not -> maximal shift, must refresh
    val m = counts((1L, 10L, 4L))
    val (d1, s1) = drift(z, m, 1, 10)
    assert(d1 == 1.0 && s1)
    val (d2, s2) = drift(m, z, 1, 10)
    assert(d2 == 1.0 && s2)
  }

  test("drift is invariant to row order and partitioning") {
    val f = counts((1L, 0L, 7L), (2L, 0L, 3L), (3L, 0L, 5L))
    val l = counts((3L, 0L, 1L), (1L, 0L, 9L), (2L, 0L, 5L))
    val (d1, s1) = drift(f, l, 1, 10)
    val (d2, s2) = drift(f.repartition(7).orderBy(col("ct")),
      l.repartition(3), 1, 10)
    assert(d1 == d2 && s1 == s2)
  }
}
