package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** doc2doc IR dataset creator (`scrc/dataset_creation/
  * doc2doc_ir_dataset_creator.py`): per document, the masked feature
  * text (every citation replaced by <ref-ruling>), the resolved cited
  * ruling ids as the retrieval labels, and a citation-frequency-capped
  * label vocabulary (the reference keeps the 1000 most common ruling
  * citations, `:110`).
  *
  * Scale: the vocabulary is an aggregate (top-k over citation counts,
  * TakeOrderedAndProject), broadcast back; masking is per-row regex;
  * resolution is the r7 equi-join shape.
  */
object Doc2DocIRDataset {

  val vocabSize = 100

  private val citePattern = "(?:BGE|ATF|DTF) \\d{1,3} [IVX]+ \\d{1,3}"

  /** corpus with synthesized citations (same graph as the x3/r7 packs) */
  private def corpus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("year", (col("doc_id") % 25 + 2000).cast("int"))
      .withColumn("cited_key", (col("doc_id") + 1) % 400)
      .withColumn("own_key", col("doc_id") % 400)
      .withColumn("body", concat(col("text"),
        lit(" Vgl. BGE "), (col("cited_key") % 50 + 100).cast("string"),
        lit(" II "), (col("cited_key") % 400 + 1).cast("string"), lit(".")))

  def prepare(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = corpus(spark, sfDir)

    // label vocabulary: top-k cited ruling keys by frequency
    val vocab = docs.groupBy("cited_key")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("cited_key"))
      .limit(vocabSize)
      .select(col("cited_key"), lit(true).as("in_vocab"))

    // resolution: cited_key → min doc whose own_key matches (r7 shape)
    val rulings = docs.select(col("own_key").as("cited_key"),
      col("doc_id").as("ruling_id"))
    val resolved = rulings.groupBy("cited_key")
      .agg(min("ruling_id").as("resolved_ruling_id"))

    docs
      .join(broadcast(vocab), Seq("cited_key"), "left")
      .join(resolved, Seq("cited_key"), "left")
      .where(col("in_vocab").isNotNull) // drop out-of-vocab labels (P8)
      .withColumn("feature_text",
        regexp_replace(col("body"), citePattern, "<ref-ruling>"))
      .withColumn("split", DatasetWriter.dateSplit("year"))
      .select("doc_id", "year", "lang", "feature_text", "cited_key",
        "resolved_ruling_id", "split")
  }

  def build(spark: SparkSession, sfDir: String, outDir: String): JudgmentDataset.Report =
    DatasetWriter.write(prepare(spark, sfDir), outDir, Some("cited_key"))
}
