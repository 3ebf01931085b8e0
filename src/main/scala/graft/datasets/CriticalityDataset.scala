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

  /** `prepare` plus the release handle of GlobalRank's internal cache
    * (a no-op on the small-input dispatch): consumers that OWN their
    * action — like `build` — must try/finally-release so the
    * range-partitioned frame's MEMORY_AND_DISK pin does not outlive
    * the action in a long-lived session (VERDICT r4 item 5).
    * `smallInputRows` is forwarded to the size-adaptive dispatch
    * (probes/specs pass 0 to force the distributed, caching path).
    */
  def prepareReleasable(spark: SparkSession, sfDir: String,
                        smallInputRows: Long = graft.operators.GlobalRank.SmallInputRows)
      : (DataFrame, () => Unit) = {
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
    val (tiled, release) = graft.operators.GlobalRank.ntileGlobalReleasable(
      freq, 4, Seq(col("freq").desc, col("own_key")), "__q", smallInputRows)
    val labeled = tiled
      .withColumn("label", concat(lit("critical-"), col("__q").cast("string")))
      .drop("__q")

    val out = docs.join(broadcast(labeled), Seq("own_key"), "left")
      .withColumn("label", coalesce(col("label"), lit("non-critical")))
      .withColumn("score", when(col("freq").isNull, 0.0)
        .otherwise(round(col("freq") *
          greatest(lit(0.0), (col("last_cite_year") - 2000).cast("double") / 25), 6)))
      .withColumn("split", DatasetWriter.dateSplit("year"))
      .select("doc_id", "year", "lang", "text", "label", "score", "split")
    (out, release)
  }

  /** labeled corpus: doc_id, year, label, score, split — handle-free
    * (for plan handoff where the caller cannot release; the cache then
    * lives until the plan is GC'd). Action-owning callers should use
    * `prepareReleasable`.
    */
  def prepare(spark: SparkSession, sfDir: String): DataFrame =
    prepareReleasable(spark, sfDir)._1

  def build(spark: SparkSession, sfDir: String, outDir: String): JudgmentDataset.Report = {
    val (ds, release) = prepareReleasable(spark, sfDir)
    try DatasetWriter.write(ds, outDir, Some("label"))
    finally release()
  }
}
