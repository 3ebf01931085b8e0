package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side mechanics here are real and tested — schema, binary
  * column handling, partition-level batch iteration (the Scala analog
  * of mapInPandas' batch shape), metadata structs. The actual codec
  * work is STUBBED (no image/audio libs in this container): `decodeStub`
  * derives deterministic fake dimensions from the bytes. Swapping in a
  * real decoder changes only the function body, not the pipeline.
  *
  * Scale notes: decode work is embarrassingly parallel and CPU-bound —
  * `mapPartitions` amortizes per-batch setup (a real decoder's native
  * context) across the partition, exactly like a Pandas UDF amortizes
  * Arrow batch conversion. Binary payloads stay off the driver; only
  * small metadata structs flow into downstream joins/aggregations.
  * Partition sizing: binary columns dominate bytes — set
  * `spark.sql.files.maxPartitionBytes` so a partition of payloads fits
  * executor memory, and never collect() a binary column.
  */
object MediaPipeline {

  case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
                       width: Int, height: Int, n_frames: Int)

  /** STUB decoder — deterministic fake in lieu of a real codec.
    * Replace the body with (e.g.) javax.imageio / ffmpeg bindings in a
    * real deployment; signature and batch usage stay identical.
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    // fake but deterministic "decoded" properties derived from payload
    MediaMeta(
      doc_id = docId,
      n_bytes = n.toLong,
      format = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp",
      width = 320 + (n % 320),
      height = 240 + (n % 240),
      n_frames = 1 + (n % 4))
  }

  /** Attach a binary payload column (here: utf-8 bytes of `text` stand
    * in for real media bytes landed by an ingest job).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Decode payloads partition-by-partition. The iterator never
    * materializes the whole partition; a real decoder would also reuse
    * one native context per partition (the `// decoder setup` site).
    */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    import docs.sparkSession.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // decoder setup would happen here, once per partition
        batch.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Deterministic frame sampling: pick byte offsets for n_frames evenly
    * spaced "frames" — the shape of video frame extraction (each output
    * row = one frame reference), done with a generator-style explode.
    */
  def sampleFrames(meta: Dataset[MediaMeta]): DataFrame =
    meta.toDF()
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1)")))
      .withColumn("byte_offset",
        floor(col("frame_idx") * (col("n_bytes") / col("n_frames"))).cast("bigint"))
      .select("doc_id", "frame_idx", "byte_offset")
}
