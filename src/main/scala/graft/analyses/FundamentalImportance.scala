package graft.analyses

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Ad-hoc analysis entry point (SURVEY §3.3, `scrc/analyses/
  * fundamental_importance.py:118-176`): scan with a pushed
  * string-contains predicate → sentence explode → negation detection
  * (contains-one-of-list, F40) → grouped summaries with an "All" grand
  * total → deterministic stratified sample for manual validation.
  *
  * The reference caps the scan at LIMIT 20k per language and runs
  * sentencizing in driver Python; here the filter pushes to the scan
  * and every stage stays distributed.
  */
object FundamentalImportance {

  val searchTerms = Seq("vector", "stream")
  val negationWords = Seq("slow", "filter")

  /** matching sentences with negation flags */
  def sentences(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      // P9: contains predicate, evaluated at the scan
      .where(searchTerms.map(t => col("text").contains(t)).reduce(_ || _))
      .withColumn("prose", concat(col("text"), lit(".")))
      .select(col("doc_id"), col("lang"),
        explode(split(regexp_replace(col("prose"), "([.!?]) ", "$1\n"), "\n"))
          .as("sentence"))
      .where(length(col("sentence")) > 0 &&
        searchTerms.map(t => col("sentence").contains(t)).reduce(_ || _))
      // F40: negation = contains-one-of-list
      .withColumn("negated",
        negationWords.map(w => col("sentence").contains(w)).reduce(_ || _))

  /** per-(lang, negated) counts + an "All" grand-total row (A12) */
  def summary(sent: DataFrame): DataFrame = {
    val byLang = sent.groupBy(col("lang"), col("negated"))
      .agg(count(lit(1)).as("n_sentences"))
    val total = sent.groupBy(col("negated"))
      .agg(count(lit(1)).as("n_sentences"))
      .withColumn("lang", lit("All"))
      .select("lang", "negated", "n_sentences")
    byLang.unionByName(total)
  }

  /** deterministic n-per-stratum sample for manual validation (O3) */
  def sample(sent: DataFrame, perStratum: Int = 3): DataFrame = {
    val w = Window.partitionBy("lang", "negated")
      .orderBy(md5(concat(col("doc_id").cast("string"), col("sentence"))))
    sent.withColumn("rn", row_number().over(w))
      .where(col("rn") <= perStratum)
      .drop("rn")
  }
}
