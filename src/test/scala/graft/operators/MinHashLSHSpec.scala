package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class MinHashLSHSpec extends SparkSpec {

  test("fused signature equals the staged shingle→signature path") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("w", split(col("text"), " "))
    val fused = docs.select(col("doc_id"),
      MinHashLSH.fusedSignatureUdf(4)(col("w")).as("sig"))
    val staged = docs.select(col("doc_id"),
      MinHashLSH.signatureUdf(4)(MinHashLSH.shinglesUdf(col("w"))).as("sig"))
    val f = fused.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val s = staged.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(f == s)
  }

  test("native distinct word_ngrams equals the compiled shingle UDF") {
    // d3 swapped from shinglesUdf to array_distinct(word_ngrams(w,3));
    // element order included (first-occurrence, like the LinkedHashSet)
    graft.GraftExtensions.registerNative(spark)
    val docs = Tables.documents(spark, sfDir)
      .withColumn("w", split(col("text"), " "))
    val bad = docs.select(col("doc_id"),
        expr("array_distinct(word_ngrams(w, 3))").as("native"),
        MinHashLSH.shinglesUdf(col("w")).as("udf"))
      .where(not(col("native") <=> col("udf"))).count()
    assert(bad == 0)
  }

  test("identical docs share every band; disjoint docs share none") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),       // exact duplicate of 1
      (3L, "q r s t u v w x y z")  // fully disjoint
    ).toDF("doc_id", "text").withColumn("w", split(col("text"), " "))
    val pairs = MinHashLSH.candidatePairs(docs, "doc_id", col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("convergeKeepList closes a chain no fixed hop count would") {
    import spark.implicits._
    // 8 ids linked only through consecutive buckets: 0-[b0]-1-[b1]-2 …
    // — a diameter-7 chain; 2 fixed hops leave the tail unresolved,
    // the fixpoint maps everything to 0
    val edges = (0 until 8).flatMap { i =>
      Seq((i.toLong, 0, s"b$i")) ++
        (if (i > 0) Seq((i.toLong, 0, s"b${i - 1}")) else Nil)
    }
    val b = edges.toDF("doc_id", "band", "h")
    val fixed = MinHashLSH.convergeKeepList(b, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == (0 until 8).map(i => i.toLong -> 0L).toMap)
    // the same chain through the legacy 2-hop path does NOT fully
    // collapse — the caveat the fixpoint removes
    val twoHop = MinHashLSH.fixedHopKeepList(b, "doc_id", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoHop.values.toSet.size > 1, s"chain should defeat 2 hops: $twoHop")
  }

  test("pointer jumping converges a long chain in O(log d) rounds") {
    import spark.implicits._
    val n = 64 // diameter 63: plain min-propagation would need ~32 rounds
    val edges = (0 until n).flatMap { i =>
      Seq((i.toLong, 0, s"b$i")) ++
        (if (i > 0) Seq((i.toLong, 0, s"b${i - 1}")) else Nil)
    }
    val (keep, rounds) =
      MinHashLSH.convergeKeepListWithStats(edges.toDF("doc_id", "band", "h"), "doc_id")
    val m = keep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == (0 until n).map(i => i.toLong -> 0L).toMap)
    assert(rounds <= 8, s"pointer jumping should close a 64-chain in <=8 rounds, took $rounds")
  }

  test("convergeKeepList on an empty band frame returns empty, no error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "h")
    assert(MinHashLSH.convergeKeepList(empty, "doc_id").count() == 0)
  }

  test("dedupKeepList maps duplicates to one representative, pair-free") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),        // dup of 1
      (5L, "a b c d e f g"),        // dup of 1
      (3L, "q r s t u v w x y z"),  // unique
      (4L, "m n o p q r s")         // unique
    ).toDF("doc_id", "text").withColumn("w", split(col("text"), " "))
    val keep = MinHashLSH.dedupKeepList(docs, "doc_id", col("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep(1L) == 1L && keep(2L) == 1L && keep(5L) == 1L)
    assert(keep(3L) == 3L && keep(4L) == 4L)
    assert(keep.size == 5) // one row per doc, never pairs
  }

  test("multi-row bands raise precision: fewer candidates, dups still found") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("w", split(col("text"), " "))
    val loose = MinHashLSH.candidatePairs(docs, "doc_id", col("w"), k = 4, rowsPerBand = 1).count()
    val strict = MinHashLSH.candidatePairs(docs, "doc_id", col("w"), k = 4, rowsPerBand = 2).count()
    assert(strict <= loose, s"2-row bands must not add candidates ($strict > $loose)")

    import spark.implicits._
    val dups = Seq((1L, "a b c d e f"), (2L, "a b c d e f"))
      .toDF("doc_id", "text").withColumn("w", split(col("text"), " "))
    val p = MinHashLSH.candidatePairs(dups, "doc_id", col("w"), k = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(p.toSeq == Seq((1L, 2L)), "exact dups collide in every band config")
  }

  test("signature of an empty document is all-null and never joins") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "xy")).toDF("doc_id", "text")
      .withColumn("w", split(col("text"), " "))
    val bands = MinHashLSH.bands(docs, "doc_id", col("w"), 4)
    assert(bands.where(col("doc_id") === 2L).count() == 0)
  }

  test("incremental keep-list: a bridging batch doc merges two components via the remap; fresh docs open new ones") {
    import spark.implicits._
    // corpus: {1,2} share bucket a, {5,6} share bucket b, 9 isolated
    val corpusBands = Seq(
      (1L, 0, "a"), (2L, 0, "a"),
      (5L, 0, "b"), (6L, 0, "b"),
      (9L, 0, "own9")).toDF("doc_id", "band", "h")
    val state = MinHashLSH.convergeKeepList(corpusBands, "doc_id")
    assert(state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
    // batch: 3 BRIDGES both components (buckets a AND b); 20 is fresh
    val batch = Seq((3L, 0, "a"), (3L, 0, "b"), (20L, 0, "own20"))
      .toDF("doc_id", "band", "h")
    val (assign, remap) = MinHashLSH.incrementalKeepList(
      batch, "doc_id", corpusBands, state)
    assert(assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(3L -> 1L, 20L -> 20L))
    // only the LOSING component remaps; the winner and the untouched
    // component never appear in the delta
    assert(remap.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(5L -> 1L))
  }

  test("incremental keep-list: driver union-find path equals the distributed fixpoint") {
    import spark.implicits._
    // pseudo-random but deterministic topology: 60 docs, each banded to
    // its own id and to a shared bucket drawn from a small pool, so
    // components have varied shapes (chains, stars, singletons)
    val corpus = (0 until 40).flatMap { i =>
      Seq((i.toLong, 0, s"self$i"), (i.toLong, 0, s"pool${(i * 7) % 11}"))
    }.toDF("doc_id", "band", "h")
    val state = MinHashLSH.convergeKeepList(corpus, "doc_id")
    val batch = (40 until 60).flatMap { i =>
      Seq((i.toLong, 0, s"self$i"), (i.toLong, 0, s"pool${(i * 3) % 13}"))
    }.toDF("doc_id", "band", "h")
    def asMaps(p: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)) =
      (p._1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        p._2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val fast = asMaps(MinHashLSH.incrementalKeepList(
      batch, "doc_id", corpus, state))
    val slow = asMaps(MinHashLSH.incrementalKeepList(
      batch, "doc_id", corpus, state, driverSolveLimit = 0L))
    assert(fast == slow)
    assert(fast._1.keySet == (40L until 60L).toSet)
  }
}
