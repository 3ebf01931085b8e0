package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpec {

  private def brute(docs: Seq[(Long, Seq[String])], tauNum: Int, tauDen: Int)
  : Set[(Long, Long, Long, Long)] =
    (for {
      (ia, ta) <- docs.map { case (i, t) => (i, t.distinct.toSet) }
      (ib, tb) <- docs.map { case (i, t) => (i, t.distinct.toSet) }
      if ia < ib
      inter = (ta & tb).size.toLong
      uni = (ta | tb).size.toLong
      if inter * tauDen >= uni * tauNum
    } yield (ia, ib, inter, uni)).toSet

  private def run(docs: Seq[(Long, Seq[String])], tauNum: Int, tauDen: Int)
  : Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    SetSimJoin.jaccardJoin(
      docs.toDF("doc_id", "ts"), "doc_id", col("ts"), tauNum, tauDen)
      .select("ia", "ib", "inter_sz", "union_sz")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("handcrafted boundary pairs at tau = 1/2") {
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),      // inter 3, union 5 → 3/5 ≥ 1/2 IN
      3L -> Seq("a", "b", "x", "y"),      // vs 1: inter 2, union 6 → OUT
      4L -> Seq("a", "b", "c", "d"),      // exact dup of 1 → 4/4 IN
      5L -> Seq("q", "r"),                // disjoint → OUT
      6L -> Seq("a", "b"),                // vs 1: inter 2, union 4 = 1/2 exact boundary IN
    )
    val got = run(docs, 1, 2)
    assert(got == brute(docs, 1, 2))
    assert(got.contains((1L, 2L, 3L, 5L)))
    assert(got.contains((1L, 4L, 4L, 4L)))
    assert(got.contains((1L, 6L, 2L, 4L)))
    assert(!got.exists { case (a, b, _, _) => Set(a, b) == Set(1L, 3L) })
  }

  test("duplicate tokens are deduped before set semantics") {
    val docs = Seq(
      1L -> Seq("a", "a", "a", "b"),
      2L -> Seq("a", "b", "b", "b"),
    )
    // as SETS both are {a,b}: jaccard 1
    assert(run(docs, 4, 5) == Set((1L, 2L, 2L, 2L)))
  }

  test("randomized: prefix-filtered join equals brute force (lossless pruning)") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"t$i")
    // clustered corpus: 15 seeds, each with up to 3 near-copies made by
    // swapping a few tokens — guarantees pairs straddling the threshold
    val docs = (0 until 15).flatMap { i =>
      val seed = rnd.shuffle(vocab).take(8 + rnd.nextInt(8))
      (0 to rnd.nextInt(4)).map { j =>
        val mutated = seed.map(t =>
          if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else t)
        (i * 10L + j, mutated)
      }
    }
    for ((tn, td) <- Seq((4, 5), (1, 2), (3, 10)))
      assert(run(docs, tn, td) == brute(docs, tn, td), s"tau=$tn/$td")
  }

  private def bruteContainment(docs: Seq[(Long, Seq[String])], tauNum: Int, tauDen: Int)
  : Set[(Long, Long, Long)] =
    (for {
      (ia, ta) <- docs.map { case (i, t) => (i, t.distinct.toSet) }
      (ib, tb) <- docs.map { case (i, t) => (i, t.distinct.toSet) }
      if ia != ib
      inter = (ta & tb).size.toLong
      if inter * tauDen >= ta.size.toLong * tauNum
    } yield (ia, ib, inter)).toSet

  test("randomized: containment join equals brute force (directed, asymmetric)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 30).map(i => s"t$i")
    // supersets force the asymmetric case: small docs embedded in
    // larger ones never reach a symmetric jaccard threshold
    val docs = (0 until 12).flatMap { i =>
      val small = rnd.shuffle(vocab).take(4 + rnd.nextInt(4))
      val big = (small ++ rnd.shuffle(vocab).take(8 + rnd.nextInt(8))).distinct
      Seq((i * 10L, small), (i * 10L + 1, big))
    }
    for ((tn, td) <- Seq((19, 20), (3, 4), (1, 2))) {
      val got = SetSimJoin.containmentJoin(
        docs.toDF("doc_id", "ts"), "doc_id", col("ts"), tn, td)
        .select("ia", "ib", "inter_sz")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == bruteContainment(docs, tn, td), s"tau=$tn/$td")
    }
  }

  test("jaccard column is the exact integer ratio as double") {
    import spark.implicits._
    val docs = Seq(1L -> Seq("a", "b", "c"), 2L -> Seq("a", "b", "d"))
    val row = SetSimJoin.jaccardJoin(
      docs.toDF("doc_id", "ts"), "doc_id", col("ts"), 1, 2)
      .select("jaccard").as[Double].collect()
    assert(row.toSeq == Seq(2.0 / 4.0))
  }
}
