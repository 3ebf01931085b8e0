package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Criticality dataset creator (`scrc/dataset_creation/
  * criticality_dataset_creator.py`): rank rulings by how often they are
  * cited, bucket the cited ones into critical-1..4 quartiles, label
  * every document by its ruling's bucket ("non-critical" when never
  * cited), add the time-weighted citation score, and emit
  * date-stratified splits.
  *
  * Scale: the citation graph aggregates once (map-side combine), the
  * quartile window runs over the |distinct rulings| aggregate — never
  * the raw corpus — and the label join is a broadcastable
  * one-row-per-ruling frame.
  */
object CriticalityDataset {

  /** labeled corpus: doc_id, year, label, score, split */
  def prepare(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("year", (col("doc_id") % 25 + 2000).cast("int"))
      // each doc IS ruling (volume, book, page) and CITES the ruling
      // derived from doc_id + 1 (deterministic synthetic citation graph)
      .withColumn("own_key", col("doc_id") % 400)
      .withColumn("cited_key", (col("doc_id") + 1) % 400)

    val freq = docs.groupBy(col("cited_key").as("own_key"))
      .agg(count(lit(1)).as("freq"), max("year").as("last_cite_year"))

    // freq is bounded by the distinct-cited-ruling vocabulary; the
    // distributed ntile (operators.GlobalRank) still avoids funneling
    // it through one partition at corpus scale
    val labeled = graft.operators.GlobalRank.ntileGlobal(freq, 4,
      Seq(col("freq").desc, col("own_key")), "__q")
      .withColumn("label", concat(lit("critical-"), col("__q").cast("string")))
      .drop("__q")

    docs.join(broadcast(labeled), Seq("own_key"), "left")
      .withColumn("label", coalesce(col("label"), lit("non-critical")))
      .withColumn("score", when(col("freq").isNull, 0.0)
        .otherwise(round(col("freq") *
          greatest(lit(0.0), (col("last_cite_year") - 2000).cast("double") / 25), 6)))
      .withColumn("split", DatasetWriter.dateSplit("year"))
      .select("doc_id", "year", "lang", "text", "label", "score", "split")
  }

  def build(spark: SparkSession, sfDir: String, outDir: String): JudgmentDataset.Report =
    DatasetWriter.write(prepare(spark, sfDir), outDir, Some("label"))
}
