package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class MediaPipelineSpec extends SparkSpec {

  test("decodeMeta is deterministic and keeps one row per doc") {
    val docs = Tables.documents(spark, sfDir)
    val meta = MediaPipeline.decodeMeta(docs)
    val a = meta.collect().sortBy(_.doc_id)
    val b = MediaPipeline.decodeMeta(docs).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.length == docs.count())
    assert(a.forall(m => m.width >= 320 && m.width < 640))
    assert(a.forall(m => m.n_frames >= 1 && m.n_frames <= 4))
  }

  test("payload bytes survive the binary cast round-trip") {
    val docs = Tables.documents(spark, sfDir).limit(5)
    val back = MediaPipeline.withPayload(docs)
      .select(col("text"), col("payload").cast("string").as("roundtrip"))
      .collect()
    back.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("sampleFrames emits n_frames rows per doc with in-range offsets") {
    val meta = MediaPipeline.decodeMeta(Tables.documents(spark, sfDir))
    val frames = MediaPipeline.sampleFrames(meta)
    val byDoc = frames.groupBy("doc_id").count()
      .join(meta.toDF().select("doc_id", "n_frames"), "doc_id")
      .where(col("count") =!= col("n_frames"))
    assert(byDoc.count() == 0, "every doc must emit exactly n_frames rows")
    val bad = frames.join(meta.toDF().select("doc_id", "n_bytes"), "doc_id")
      .where(col("byte_offset") < 0 || col("byte_offset") >= col("n_bytes"))
    assert(bad.count() == 0, "offsets must lie within the payload")
  }
}
