package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.MinHashLSH

/** Scaling measurement for d13's incremental persisted-index dedup: a
  * FIXED batch (the sf0.1 docs with doc_id % 10 == 0, re-keyed) is
  * deduped against corpora of 1×/10×/50× sf0.1, comparing
  *   (a) the incremental path — batch hashed, persisted band index
  *       probed with the batch side broadcast, and
  *   (b) the rehash path — the same verdicts but with the corpus bands
  *       recomputed in-flight (what a pipeline without a maintained
  *       index pays on EVERY batch).
  * The claim under test: (a)'s cost is dominated by |batch| hashing
  * plus one map-only scan of the (4 rows/doc, fixed-width) index, so
  * the (b)/(a) ratio must WIDEN with corpus size — the index turns the
  * per-batch corpus re-hash into a one-time build. Results feed
  * PERF.md.
  */
object IncDedupProbe {

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)
    val d = "/root/testdata/sf0.1"

    // fixed batch at every scale: 1/10th of sf0.1, re-keyed clear of
    // every replicated id range
    val batch = graft.sources.Tables.documents(spark, d)
      .where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000000L).as("doc_id"),
        col("text"), col("lang"), col("source"))
      .withColumn("w", split(col("text"), " "))
      .persist()
    val nBatch = batch.count()

    for (n <- Seq(1, 10, 50)) {
      val docsPath = s"/tmp/scale_docs_$n"
      // provenance marker: only reuse a cached replica that was built
      // from THIS source dir with THIS replication scheme — a stale
      // directory from another probe run would silently skew the curve
      val marker = java.nio.file.Paths.get(s"${docsPath}_src.txt")
      val tag = s"$d n=$n replicateDocs-v1"
      val fresh = new java.io.File(docsPath).exists() &&
        java.nio.file.Files.exists(marker) &&
        java.nio.file.Files.readString(marker) == tag
      if (!fresh) {
        ScaleProbe.replicateDocs(spark, d, n).write.mode("overwrite").parquet(docsPath)
        java.nio.file.Files.writeString(marker, tag)
      }
      val corpus = spark.read.parquet(docsPath)
        .withColumn("w", split(col("text"), " "))
      val nCorpus = corpus.count()

      // one-time index build (amortized across every future batch)
      val idxPath = s"/tmp/inc_idx_$n"
      val (_, tBuild) = time {
        MinHashLSH.bands(corpus, "doc_id", col("w"), 4)
          .write.mode("overwrite").parquet(idxPath)
      }

      // (a) incremental: hash the batch, probe the persisted index
      val ((nDupC, nAdmit), tInc) = time {
        val v = MinHashLSH.incrementalDedup(
          MinHashLSH.bands(batch, "doc_id", col("w"), 4), "doc_id",
          idxPath, appendAdmitted = false)
        val r = v.agg(
          sum(col("dup_of_corpus").cast("long")),
          sum(col("admitted").cast("long"))).first()
        (r.getLong(0), r.getLong(1))
      }

      // (b) rehash: identical verdict joins, corpus bands recomputed
      val (nDupC2, tRehash) = time {
        val cb = MinHashLSH.bands(corpus, "doc_id", col("w"), 4)
        val bb = MinHashLSH.bands(batch, "doc_id", col("w"), 4)
          .select(col("band"), col("h"), col("doc_id").as("__bid"))
        cb.join(broadcast(bb), Seq("band", "h"))
          .select("__bid").distinct().count()
      }
      require(nDupC == nDupC2, s"verdict mismatch: $nDupC vs $nDupC2")

      println(f"INCDEDUP n=$n%2d corpus=$nCorpus%9d batch=$nBatch%6d " +
        f"build=$tBuild%7.2fs inc=$tInc%6.2fs rehash=$tRehash%7.2fs " +
        f"ratio=${tRehash / tInc}%5.1fx dupC=$nDupC%6d admit=$nAdmit%6d")
    }
    spark.stop()
  }
}
