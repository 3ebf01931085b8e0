package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Sink layer — the reference's K-family re-expressed as idempotent
  * Spark writes.
  *
  * Reference points: JSONL+xz export (`scrc/dataset_creation/
  * dataset_creator.py:482-489`), CSV-per-split with long text columns
  * dropped (`:907-917`), id2label/label2id JSON (`:1032-1056`),
  * delete-then-insert upsert (`scrc/preprocessors/extractors/
  * section_splitter.py:140-174` et al.), bulk keyed UPDATE
  * (`abstract_preprocessor.py:202-244`).
  *
  * Scale notes: every write here is partition-parallel; the upsert path
  * uses hash-bucketed dynamic partition overwrite so a re-run (or a
  * late redelivery) rewrites only the buckets containing touched keys —
  * the Spark analog of the reference's per-decision delete+insert
  * idempotency, without a transactional store.
  */
object Sinks {

  /** K5: JSONL export, gzip-compressed (xz in the reference; gzip is
    * the built-in codec — swap via spark.sql.sources codec conf).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "gzip").json(path)

  /** K6: CSV export with long text columns dropped first. */
  def writeCsv(df: DataFrame, path: String, dropTextCols: Seq[String]): Unit =
    df.drop(dropTextCols: _*)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** K7: id2label/label2id JSON (labels collected to driver — the label
    * vocabulary is small by construction).
    */
  def writeLabels(labels: Seq[String], path: String): Unit = {
    val id2 = labels.zipWithIndex
      .map { case (l, i) => s""""$i": "$l"""" }.mkString("{", ", ", "}")
    val l2i = labels.zipWithIndex
      .map { case (l, i) => s""""$l": $i""" }.mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(path))
    Files.write(Paths.get(path, "labels.json"),
      s"""{"id2label": $id2, "label2id": $l2i}""".getBytes(StandardCharsets.UTF_8))
  }

  /** K2/K3: idempotent keyed upsert via hash-bucketed dynamic partition
    * overwrite. Rows are routed to `numBuckets` partitions by key hash;
    * writing a batch replaces exactly the buckets it touches, so
    * re-processing a batch (the reference's delete-then-insert) is a
    * no-op rewrite of the same buckets. NOTE: the batch must contain
    * ALL rows for every key it touches (same contract as the
    * reference's per-decision delete+insert).
    */
  def upsertBucketed(batch: DataFrame, path: String, keyCol: String,
                     numBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      batch
        .withColumn("__bucket", pmod(xxhash64(col(keyCol)), lit(numBuckets)))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("__bucket")
        .parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Read back an upsert table (drops the routing column). */
  def readUpserted(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__bucket")

  /** Incremental append: only rows whose key is not yet present (the
    * reference's anti-join over already-processed files, J12 +
    * high-watermark). First write creates the table.
    */
  def appendNewKeys(batch: DataFrame, path: String, keyCol: String): Unit = {
    val spark = batch.sparkSession
    val isNew = !Files.exists(Paths.get(path))
    val toWrite =
      if (isNew) batch
      else batch.join(spark.read.parquet(path).select(keyCol), Seq(keyCol), "left_anti")
    toWrite.write.mode(if (isNew) SaveMode.Overwrite else SaveMode.Append).parquet(path)
  }

  /** Compact a table directory to ~`targetFileBytes` per file (the
    * small-files problem: incremental appends accumulate tiny files and
    * scan planning degrades). Reads, re-partitions by size, atomically
    * replaces via a temp dir + move.
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1, (bytes / BigInt(targetFileBytes)).toInt)
    val tmp = path + "__compact_tmp"
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Write a table partitioned by a low-cardinality column (court/lang/
    * year in the reference's layout) so scans with a partition predicate
    * prune at planning time.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** High-watermark read: rows strictly newer than the stored watermark
    * (the reference's process_new_files_only / decision-id lists).
    */
  def newerThan(df: DataFrame, watermarkCol: String, watermark: Option[Long]): DataFrame =
    watermark match {
      case Some(w) => df.where(col(watermarkCol) > w)
      case None => df
    }
}
