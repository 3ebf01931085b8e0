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
}
