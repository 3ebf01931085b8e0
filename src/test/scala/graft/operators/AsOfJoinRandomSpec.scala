package graft.operators

import scala.util.Random
import graft.SparkSpec

/** Seeded randomized equivalence: the union-sort as-of join must match
  * a trivially-correct in-memory reference on arbitrary key/time
  * layouts (dup keys, empty sides, unmatched keys, boundary ties).
  */
class AsOfJoinRandomSpec extends SparkSpec {

  private def referenceAsOf(left: Seq[(Long, Long)], right: Seq[(Long, Long, String)],
                            strict: Boolean): Map[(Long, Long), Option[String]] =
    left.map { case (k, t) =>
      val cands = right.filter(r => r._1 == k && (if (strict) r._2 < t else r._2 <= t))
      (k, t) -> (if (cands.isEmpty) None
                 else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.toMap

  test("matches an in-memory reference over 10 random layouts") {
    import spark.implicits._
    val rnd = new Random(4242)
    for (trial <- 1 to 10) {
      val strict = trial % 2 == 0
      val nKeys = 1 + rnd.nextInt(5)
      val left = Seq.fill(30)((rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong))
        .distinct
      val right = Seq.fill(20)((rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong))
        .distinct // distinct (k, t) => unique payload per (k, t), no tie ambiguity
        .map { case (k, t) => (k, t, s"p$k-$t") }

      val l = left.toDF("k", "t")
      val r = right.toDF("k", "t", "payload")
      val got = AsOfJoin.joinBackward(l, r, Seq("k"), "t", "t",
          Seq("payload"), strict = strict)
        .collect()
        .map(x => (x.getLong(0), x.getLong(1)) -> Option(x.getString(2)))
        .toMap
      val want = referenceAsOf(left, right, strict)
      assert(got == want, s"trial=$trial strict=$strict")
    }
  }

  private def referenceForward(left: Seq[(Long, Long)], right: Seq[(Long, Long, String)],
                               strict: Boolean): Map[(Long, Long), Option[String]] =
    left.map { case (k, t) =>
      val cands = right.filter(r => r._1 == k && (if (strict) r._2 > t else r._2 >= t))
      (k, t) -> (if (cands.isEmpty) None
                 else Some(cands.minBy(r => (r._2, r._3))._3))
    }.toMap

  test("forward mirror matches an in-memory reference over 10 random layouts") {
    import spark.implicits._
    val rnd = new Random(777)
    for (trial <- 1 to 10) {
      val strict = trial % 2 == 0
      val nKeys = 1 + rnd.nextInt(5)
      val left = Seq.fill(30)((rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong))
        .distinct
      val right = Seq.fill(20)((rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong))
        .distinct
        .map { case (k, t) => (k, t, s"p$k-$t") }

      val l = left.toDF("k", "t")
      val r = right.toDF("k", "t", "payload")
      val got = AsOfJoin.joinForward(l, r, Seq("k"), "t", "t",
          Seq("payload"), strict = strict)
        .collect()
        .map(x => (x.getLong(0), x.getLong(1)) -> Option(x.getString(2)))
        .toMap
      val want = referenceForward(left, right, strict)
      assert(got == want, s"trial=$trial strict=$strict")
    }
  }
}
