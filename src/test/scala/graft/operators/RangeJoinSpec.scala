package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RangeJoin correctness: bucketization must be invisible — the result
  * equals the brute-force range predicate for every width, including
  * negative ordinals (floor-div vs truncate-div), boundary-inclusive
  * matches, and intervals much wider than the bucket.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def brute(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long, Long)])
  : Set[(Long, Long, Long)] =
    (for {
      (k, pt) <- points
      (ik, id, lo, hi) <- ivs
      if ik == k && pt >= lo && pt <= hi
    } yield (k, pt, id)).toSet

  private def run(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long, Long)],
                  width: Long): Set[(Long, Long, Long)] = {
    val p = points.toDF("k", "pt")
    val iv = ivs.toDF("k", "iv_id", "lo", "hi")
    RangeJoin.pointInInterval(p, iv, Seq("k"), "pt", "lo", "hi", width)
      .select("k", "pt", "iv_id").as[(Long, Long, Long)].collect().toSet
  }

  test("random band join equals brute force at several widths") {
    val rnd = new scala.util.Random(42)
    val points = Seq.tabulate(300)(i => (rnd.nextInt(5).toLong, rnd.between(-1000L, 1000L)))
    val ivs = Seq.tabulate(80) { i =>
      val lo = rnd.between(-1000L, 950L)
      (rnd.nextInt(5).toLong, i.toLong, lo, lo + rnd.between(0L, 120L))
    }
    val expect = brute(points, ivs)
    assert(expect.nonEmpty, "fixture must produce matches")
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L))
      assert(run(points, ivs, w) == expect, s"width=$w diverges from brute force")
  }

  test("boundaries are inclusive on both ends and bucket edges don't drop pairs") {
    // pt exactly at lo, at hi, and at a bucket boundary (multiple of width)
    val points = Seq((1L, 0L), (1L, 10L), (1L, 64L), (1L, -64L), (1L, 11L))
    val ivs = Seq((1L, 1L, 0L, 10L), (1L, 2L, 64L, 64L), (1L, 3L, -64L, -1L))
    val got = run(points, ivs, 64L)
    assert(got == Set((1L, 0L, 1L), (1L, 10L, 1L), (1L, 64L, 2L), (1L, -64L, 3L)))
  }

  test("negative ordinals bucket by floor, not truncation") {
    // with truncate-div, -1 and +1 share bucket 0 while -65 lands in -1;
    // floor-div keeps [-64,-1] one bucket: the interval [-2,-1] must
    // still meet point -1 whichever side of 0 the bucket math rounds
    val points = Seq((1L, -1L), (1L, -63L))
    val ivs = Seq((1L, 9L, -64L, -1L))
    assert(run(points, ivs, 64L) == Set((1L, -1L, 9L), (1L, -63L, 9L)))
  }

  test("no duplicate pairs when an interval spans many buckets") {
    val points = Seq((1L, 500L))
    val ivs = Seq((1L, 7L, 0L, 1000L)) // 100+ buckets at width 7
    val df = RangeJoin.pointInInterval(points.toDF("k", "pt"),
      ivs.toDF("k", "iv_id", "lo", "hi"), Seq("k"), "pt", "lo", "hi", 7L)
    assert(df.count() == 1L, "each (point, interval) pair must appear exactly once")
  }

  test("bandJoin derives inclusive [center-before, center+after]") {
    val points = Seq((1L, 90L), (1L, 100L), (1L, 110L), (1L, 111L), (1L, 89L))
    val centers = Seq((1L, 5L, 100L)).toDF("k", "c_id", "c")
    val got = RangeJoin.bandJoin(points.toDF("k", "pt"), centers,
        Seq("k"), "pt", "c", before = 10L, after = 10L)
      .select("pt").as[Long].collect().toSet
    assert(got == Set(90L, 100L, 110L))
  }

  test("keyless join (equiKeys = empty) matches on the interval alone") {
    val points = Seq((1L, 5L), (2L, 50L), (3L, 500L)).toDF("pid", "pt")
    val ivs = Seq((10L, 0L, 10L), (20L, 40L, 60L)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, Seq.empty,
        "pt", "lo", "hi", 16L)
      .select("pid", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  test("empty sides yield empty results, not errors") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "pt")
    val ivs = Seq((1L, 1L, 0L, 10L)).toDF("k", "iv_id", "lo", "hi")
    assert(RangeJoin.pointInInterval(empty, ivs, Seq("k"), "pt", "lo", "hi", 10L).count() == 0L)
    val points = Seq((1L, 5L)).toDF("k", "pt")
    val noIvs = Seq.empty[(Long, Long, Long, Long)].toDF("k", "iv_id", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, noIvs, Seq("k"), "pt", "lo", "hi", 10L).count() == 0L)
  }
}
