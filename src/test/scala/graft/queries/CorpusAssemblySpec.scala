package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Corpus-assembly gates: temperature mixing (o10) and token-budget
  * selection (t24) — the invariants behind the oracle equalities.
  */
class CorpusAssemblySpec extends SparkSpec {

  test("o10: rates derive from counts — smallest source keeps all, rates fall with size") {
    val rows = graft.SparkEntry.queries("o10_temperature_mix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byTotal = rows.sortBy(_._2)
    // the smallest source's rate is exactly 1.0 (sqrt(n_min/n_min))
    assert(byTotal.head._3 === 1.0)
    // rates are monotone non-increasing in source size
    assert(byTotal.map(_._3).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b
      case _         => true
    })
    // sampling never exceeds the source, and rate^2 * n_total tracks
    // the expected count within binomial noise (4 sigma)
    for ((_, n, rate, kept) <- rows) {
      assert(kept <= n)
      val expect = rate * n
      val sigma = math.sqrt(n * rate * (1 - rate)).max(1.0)
      assert(math.abs(kept - expect) <= 4 * sigma,
        s"kept=$kept expect=$expect n=$n rate=$rate")
    }
  }

  test("t24: selection is budget-maximal in quality order") {
    val sel = graft.SparkEntry.queries("t24_token_budget_select")(spark, sfDir)
    val rows = sel.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val totalTokens = Tables.documents(spark, sfDir)
      .agg(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    val budget = totalTokens * 2 / 5
    val spent = rows.map(_._2).sum
    // within budget...
    assert(spent <= budget)
    val cumMax = rows.map(_._4).max
    assert(cumMax === spent)
    // ...and maximal: the next doc in quality order would overflow it.
    val selected = rows.map(_._1).toSet
    val next = Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("punct_ratio", round(
        size(regexp_extract_all(col("text"), lit("[!-/:-@\\[-`{-~]"), lit(0)))
          .cast("double") / col("n_chars"), 6))
      .where(!col("doc_id").isin(selected.toSeq: _*))
      .orderBy(col("punct_ratio"), col("doc_id"))
      .limit(1).collect()
    if (next.nonEmpty) {
      val nextToks = next(0).getAs[Long]("n_tokens")
      assert(spent + nextToks > budget,
        s"selection not maximal: next doc ($nextToks toks) still fits under $budget with $spent spent")
    }
  }
}
