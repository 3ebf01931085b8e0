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

  /** K5: JSONL export. Default codec is xz for parity with the
    * reference's `xz -T0` pipe (`dataset_creator.py:482-489`), via the
    * stream-only [[XzCodec]]; pass "gzip"/"zstd"/… for the built-ins.
    * Registers the xz codec on the session so the read-back resolves
    * `.xz` by extension.
    */
  def writeJsonl(df: DataFrame, path: String, codec: String = "xz"): Unit = {
    val codecName = if (codec == "xz") {
      XzCodec.register(df.sparkSession)
      classOf[XzCodec].getName
    } else codec
    df.write.mode(SaveMode.Overwrite)
      .option("compression", codecName).json(path)
  }

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
    * overwrite, per-KEY semantics (the reference's delete-then-insert,
    * `section_splitter.py:140-174`). Rows route to `numBuckets`
    * partitions by key hash; before overwriting a touched bucket, the
    * existing rows of that bucket whose keys are NOT in the batch are
    * read back and carried over, so unrelated keys that happen to share
    * a bucket survive. Only touched buckets are read or rewritten —
    * untouched buckets are never opened, so batch cost scales with
    * |batch| + |touched buckets|, not table size.
    *
    * `numBuckets` is part of the table's LAYOUT CONTRACT: it must stay
    * constant for the table's lifetime (like Hive bucketing) — routing
    * and the touched-bucket pruning both derive from it, so changing
    * it mid-table would strand rows in partitions the new routing
    * never revisits. Re-bucketing = full rewrite through `compact`-
    * style read-all + fresh upsert.
    */
  def upsertBucketed(batch: DataFrame, path: String, keyCol: String,
                     numBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val routed = batch
      .withColumn("__bucket", pmod(xxhash64(col(keyCol)), lit(numBuckets)))
    val merged =
      if (!Files.exists(Paths.get(path))) {
        // an all-empty FIRST batch must write nothing: overwriting with
        // zero rows leaves a schemaless dir (only _SUCCESS) that poisons
        // every later read-back of this sink
        if (routed.isEmpty) return
        routed
      } else {
        val touched = routed.select("__bucket").distinct()
          .collect().map(_.getLong(0))
        if (touched.isEmpty) return // empty batch: nothing to rewrite
        // partition pruning keeps this read to the touched buckets only
        val survivors = spark.read.parquet(path)
          .where(col("__bucket").cast("long").isin(touched.toSeq: _*))
          .withColumn("__bucket", col("__bucket").cast("long"))
          .join(batch.select(keyCol).distinct(), Seq(keyCol), "left_anti")
        // materialize before the overwrite below deletes the files this
        // plan reads (Spark forbids/corrupts read-from-overwrite-target)
        routed.unionByName(survivors.select(routed.columns.map(col): _*))
          .localCheckpoint(true)
      }
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      merged.write.mode(SaveMode.Overwrite)
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
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    val tmpPath = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    // crash RECOVERY before anything else: a previous compact that died
    // between its two renames leaves `path` absent. The tmp dir is
    // complete by construction (it is fully written before any rename),
    // so it wins; with no tmp, roll back to the renamed-aside old dir.
    // (SinksCrashSpec exercises both windows.)
    if (!fs.exists(dst)) {
      if (fs.exists(tmpPath)) { fs.rename(tmpPath, dst); fs.delete(old, true) }
      else if (fs.exists(old)) fs.rename(old, dst)
    }
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1, (bytes / BigInt(targetFileBytes)).toInt)
    val tmp = path + "__compact_tmp"
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap via rename-aside: at no point is `path` absent AND the new
    // data unrecoverable — a crash leaves either the old dir live, or
    // the new dir one rename away plus the old dir at __old (healed by
    // the recovery block above on the next call)
    fs.delete(old, true) // clear any leftover from a previous crash
    fs.rename(dst, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(old, true)
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
