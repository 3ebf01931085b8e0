package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.CorpusPipeline
import graft.sources.Sinks

/** Continuous corpus construction (§3.1 as a STREAM): the landing dir
  * is consumed with the Structured Streaming file source — each
  * microbatch discovers the newly landed `{stem}.json` metas and routes
  * exactly those documents through the SAME batch pipeline stages
  * (ingest → sections → judgments/citations/participations/lower
  * courts) via `foreachBatch` + the idempotent keyed upserts. This is
  * the Spark-first replacement for the reference's cron-driven re-runs
  * (`main.py:88`): instead of "run the whole pipeline again and skip
  * what the progress files remember", new files flow through
  * incrementally and re-delivery is absorbed by `Sinks.upsertBucketed`
  * keyed on decision_id.
  *
  * The json meta stream is the DRIVER of progress (checkpointed file
  * offsets); payloads are resolved per batch through the batch triple
  * scan restricted to the batch's stems. That sidesteps stream-stream
  * joining of the three file kinds (which would need watermarks the
  * landing protocol cannot promise — a pdf may land minutes after its
  * meta). The per-batch rescan lists the full landing dir; at 100 TB
  * the landing area would be date-partitioned and each stream instance
  * pointed at the open partition, keeping listings bounded — the
  * per-document work is already restricted to the batch.
  */
object CorpusStream {

  /** Start the continuous pipeline; returns the StreamingQuery (caller
    * owns its lifecycle — `processAllAvailable()` in tests, `awaitTermination()`
    * in production).
    */
  def run(spark: SparkSession, landingDir: String, outDir: String,
          spider: String, checkpointDir: String,
          minChars: Int = 50): StreamingQuery = {
    // the file streaming source requires an explicit schema — this is
    // binaryFile's fixed one (path, modificationTime, length, content)
    val metas = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .option("pathGlobFilter", "*.json")
      .load(landingDir)
      .select(regexp_extract(col("path"), "([^/]+)\\.[a-z]+$", 1).as("stem"))

    metas.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val stems = batch.select("stem").distinct()
        val docs = CorpusPipeline.ingest(spark, landingDir, minChars)
          .join(broadcast(stems), Seq("stem"))
          .persist()
        try {
          val sectioned = CorpusPipeline.splitSections(docs, spider).persist()
          try {
            Sinks.upsertBucketed(docs, s"$outDir/documents", "decision_id", 16)
            Sinks.upsertBucketed(sectioned, s"$outDir/sections", "decision_id", 16)
            Sinks.upsertBucketed(CorpusPipeline.citations(sectioned),
              s"$outDir/citations", "decision_id", 16)
            Sinks.upsertBucketed(CorpusPipeline.judgments(sectioned),
              s"$outDir/judgments", "decision_id", 16)
            Sinks.upsertBucketed(CorpusPipeline.participations(sectioned, spider),
              s"$outDir/participations", "decision_id", 16)
            Sinks.upsertBucketed(CorpusPipeline.lowerCourts(sectioned),
              s"$outDir/lower_courts", "decision_id", 16)
          } finally { sectioned.unpersist(); () }
        } finally { docs.unpersist(); () }
        ()
      }
      .start()
  }
}
