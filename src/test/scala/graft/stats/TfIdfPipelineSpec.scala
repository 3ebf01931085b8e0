package graft.stats

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class TfIdfPipelineSpec extends SparkSpec {

  test("CountVectorizer/IDF pipeline matches the exact SQL tf-idf formula") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
    val result = TfIdfPipeline.fit(docs, "tokens", vocabSize = 100)
    assert(result.vocabulary.nonEmpty)

    val long = TfIdfPipeline.toLong(result, "doc_id")
    // MLlib idf = ln((N+1)/(df+1)) — same smoothing as t5_tfidf;
    // MLlib tf is the raw count, so weights must match tf * idf
    val words = docs.select(col("doc_id"), explode(col("tokens")).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = words.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val n = docs.count()
    val expected = tf.join(dfreq, "term")
      .withColumn("tfidf_expected",
        col("tf") * log((lit(n) + 1).cast("double") / (col("df") + 1)))
      .select("doc_id", "term", "tfidf_expected")

    val joined = long.join(expected, Seq("doc_id", "term"))
    val mismatches = joined.where(
      abs(col("tfidf") - col("tfidf_expected")) > 1e-9).count()
    assert(mismatches == 0)
    // vocab cap: every emitted term is in the fitted vocabulary
    assert(long.select("term").distinct().count() <= 100)
  }
}
