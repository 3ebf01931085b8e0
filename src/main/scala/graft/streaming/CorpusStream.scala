package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, StreamingQuery}

import graft.pipeline.CorpusPipeline
import graft.sources.Sinks

/** Continuous corpus construction (§3.1 as a STREAM): the landing dir
  * is consumed with the Structured Streaming file source — each
  * microbatch discovers the newly landed files and routes exactly
  * those documents through the SAME batch pipeline stages (ingest →
  * sections → judgments/citations/participations/lower courts) via
  * `foreachBatch` + the idempotent keyed upserts. This is the
  * Spark-first replacement for the reference's cron-driven re-runs
  * (`main.py:88`): instead of "run the whole pipeline again and skip
  * what the progress files remember", new files flow through
  * incrementally and re-delivery is absorbed by `Sinks.upsertBucketed`
  * keyed on decision_id.
  *
  * ALL THREE file kinds drive progress (checkpointed file offsets),
  * not just the `.json` metas: the landing protocol allows a payload
  * to land minutes after its meta, and a meta-only batch would skip
  * that document with no later file to re-trigger its stem. Because a
  * late `{stem}.html`/`{stem}.pdf` is itself a new file, its arrival
  * re-enters the stem and the batch rescan now sees the complete
  * triple — the keyed upsert replaces whatever the meta-only pass
  * produced (usually nothing: a payload-less triple fails min_chars).
  * Payload-before-meta inverts the same way: the stem joins to no
  * meta row until the `.json` lands and re-triggers it. This
  * sidesteps stream-stream joining of the three kinds (which would
  * need watermarks the landing protocol cannot promise).
  *
  * The per-batch rescan lists `srcDir`; at 100 TB the landing area is
  * date-partitioned and each stream instance pointed at the OPEN
  * partition via `openPartition` (e.g. `date=2026-08-13`), keeping
  * both the source listing and the rescan bounded by one partition —
  * closed partitions are never listed again. `maxFilesPerTrigger`
  * bounds a single microbatch during backfill.
  */
object CorpusStream {

  /** Start the continuous pipeline; returns the StreamingQuery (caller
    * owns its lifecycle — `processAllAvailable()` in tests, `awaitTermination()`
    * in production).
    *
    * @param openPartition when the landing dir is partitioned
    *   (`landing/date=…/`), the single open partition to watch; both
    *   the file source and the per-batch rescan are confined to it
    * @param maxFilesPerTrigger upper bound on files per microbatch
    */
  def run(spark: SparkSession, landingDir: String, outDir: String,
          spider: String, checkpointDir: String,
          minChars: Int = 50,
          openPartition: Option[String] = None,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val srcDir = openPartition.fold(landingDir)(p => s"$landingDir/$p")
    // the file streaming source requires an explicit schema — this is
    // binaryFile's fixed one (path, modificationTime, length, content);
    // only `path` is selected, so column pruning skips the payload bytes
    val reader: DataStreamReader = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .option("pathGlobFilter", "*.{json,html,pdf}")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    val landed = reader.load(srcDir)
      .select(regexp_extract(col("path"), "([^/]+)\\.[a-z]+$", 1).as("stem"))

    landed.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val stems = batch.select("stem").distinct()
        val docs = CorpusPipeline.ingest(spark, srcDir, minChars)
          .join(broadcast(stems), Seq("stem"))
          .persist()
        try {
          val sectioned = CorpusPipeline.splitSections(docs, spider).persist()
          try {
            // force the shared cache ONCE before fanning out, then run
            // the six independent table upserts CONCURRENTLY — they
            // write disjoint paths and all read from the materialized
            // caches, so the only serialization left is the scheduler's.
            // A micro-batch's wall time is then max(upsert), not
            // sum(upsert) — the same discipline a production job uses
            // to keep per-batch latency under the trigger interval.
            sectioned.count()
            val writes = Seq(
              () => Sinks.upsertBucketed(docs, s"$outDir/documents", "decision_id", 16),
              () => Sinks.upsertBucketed(sectioned, s"$outDir/sections", "decision_id", 16),
              () => Sinks.upsertBucketed(CorpusPipeline.citations(sectioned),
                s"$outDir/citations", "decision_id", 16),
              () => Sinks.upsertBucketed(CorpusPipeline.judgments(sectioned),
                s"$outDir/judgments", "decision_id", 16),
              () => Sinks.upsertBucketed(CorpusPipeline.participations(sectioned, spider),
                s"$outDir/participations", "decision_id", 16),
              () => Sinks.upsertBucketed(CorpusPipeline.lowerCourts(sectioned),
                s"$outDir/lower_courts", "decision_id", 16))
            // all-settled + sibling-cancel (ADVICE r15): the unpersists
            // below must never run while failed-batch siblings still
            // read the docs/sectioned caches
            Sinks.awaitAllWrites(spark, writes)
            ()
          } finally { sectioned.unpersist(); () }
        } finally { docs.unpersist(); () }
        ()
      }
      .start()
  }
}
