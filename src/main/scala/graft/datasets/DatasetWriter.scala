package graft.datasets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Shared split/write machinery for all dataset creators (`scrc/
  * dataset_creation/dataset_creator.py:819-939` — splits, JSONL,
  * labels, overview — factored once; each creator is then just its
  * labeling logic).
  */
object DatasetWriter {

  val splits = Seq("train", "validation", "test", "secret_test")

  /** Reference year boundaries (dataset_creator.py:158-159). */
  def dateSplit(yearCol: String): org.apache.spark.sql.Column =
    when(col(yearCol) <= 2015, "train")
      .when(col(yearCol) <= 2017, "validation")
      .when(col(yearCol) <= 2022, "test")
      .otherwise("secret_test")

  /** Write JSONL per split + labels.json + per-split/label overview
    * CSV; returns the overview counts.
    */
  def write(ds: DataFrame, outDir: String, labelCol: Option[String])
      : JudgmentDataset.Report = {
    val cached = ds.persist()
    try {
      val labels = labelCol match {
        case Some(c) => cached.select(c).distinct()
          .collect().map(_.get(0).toString).sorted.toSeq
        case None => Nil
      }
      if (labels.nonEmpty) Sinks.writeLabels(labels, outDir)
      for (split <- splits)
        Sinks.writeJsonl(cached.where(col("split") === split).drop("split"),
          s"$outDir/$split")
      val overview = labelCol match {
        case Some(c) => cached.groupBy(col("split"),
          col(c).cast("string").as("label")).count()
        case None => cached.groupBy("split").count().withColumn("label", lit("all"))
          .select("split", "label", "count")
      }
      Sinks.writeCsv(overview, s"$outDir/overview", dropTextCols = Nil)
      JudgmentDataset.Report(labels,
        overview.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
    } finally { cached.unpersist(); () }
  }

  /** Reference `save_sub_datasets` (dataset_creator.py:941-1004):
    * per-attribute dataset slices (input-length band, year, legal
    * area, region, canton, court, chamber). The reference loops one
    * filtered write per slice value; here each slice FAMILY is a
    * single `partitionBy(slice, split)` write — directory-per-value
    * from one pass over the data, which is the shape that survives a
    * 1000-way slice at corpus scale. `slices` maps family name → the
    * labeling column (a category column or a derived band such as
    * `floor(n_tokens / 512)`); null labels route to `__other`.
    * Returns PER-SLICE-VALUE row counts for each family (the write
    * manifest — one tiny groupBy per family, reading the same cache the
    * write used, instead of a full-count pass that would return the
    * identical total for every family).
    */
  def subDatasets(ds: DataFrame, outRoot: String,
                  slices: Map[String, org.apache.spark.sql.Column]): Map[String, Map[String, Long]] = {
    val cached = ds.persist()
    try {
      slices.map { case (name, labelCol) =>
        val sliced = cached
          .withColumn(name, coalesce(labelCol.cast("string"), lit("__other")))
        sliced.write.mode("overwrite")
          .partitionBy(name, "split")
          .json(s"$outRoot/by_$name")
        name -> sliced.groupBy(name).agg(count(lit(1)).as("__n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    } finally { cached.unpersist(); () }
  }
}
