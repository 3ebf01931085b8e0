package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class MediaPipelineSpec extends SparkSpec {

  test("synthesize → decode recovers planted dimensions, format, frames, pixel") {
    for (id <- 0L to 20L) {
      val m = MediaPipeline.decodeImage(id, MediaPipeline.synthesizeImage(id))
      assert(!m.quarantined, s"id=$id must decode")
      val expFmt = (id % 4) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"; case _ => "bmp"
      }
      assert(m.format.contains(expFmt))
      assert(m.width.contains((16 + id % 48).toInt))
      assert(m.height.contains((12 + id % 36).toInt))
      val expFrames = if (expFmt == "gif") (1 + id % 3).toInt else 1
      assert(m.n_frames.contains(expFrames))
      if (expFmt == "png" || expFmt == "bmp")
        assert(m.px_red.contains((id % 256).toInt), s"planted pixel must survive ($id)")
      else assert(m.px_red.isEmpty)
    }
  }

  test("decodeMeta is deterministic over the corpus and keeps one row per doc") {
    val docs = MediaPipeline.withImagePayload(Tables.documents(spark, sfDir))
    val a = MediaPipeline.decodeMeta(docs).collect().sortBy(_.doc_id)
    val b = MediaPipeline.decodeMeta(docs).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.length == Tables.documents(spark, sfDir).count())
    assert(a.forall(!_.quarantined), "every synthesized payload must decode")
  }

  test("sampleFrames decodes one row per real frame with per-frame dims") {
    val docs = MediaPipeline.withImagePayload(Tables.documents(spark, sfDir))
    val meta = MediaPipeline.decodeMeta(docs).toDF()
    val frames = MediaPipeline.sampleFrames(docs).toDF()
    val mismatch = frames.groupBy("doc_id").count()
      .join(meta.select("doc_id", "n_frames"), "doc_id")
      .where(col("count") =!= col("n_frames"))
    assert(mismatch.count() == 0, "every doc must emit exactly n_frames rows")
    val badDims = frames.join(meta.select("doc_id", "width", "height"), "doc_id")
      .where(col("frame_w") =!= col("width") || col("frame_h") =!= col("height"))
    assert(badDims.count() == 0, "every frame raster must match the container dims")
  }

  test("hostile payloads quarantine (null meta, no throw); control rows decode") {
    for (id <- 0L to 19L) {
      val m = MediaPipeline.decodeImage(id, MediaPipeline.synthesizeHostileImage(id))
      if (id % 4 == 0) {
        assert(!m.quarantined, s"control row $id must decode")
        assert(m.format.contains("png"))
        assert(m.px_red.contains(((id * 4) % 256).toInt))
      } else {
        assert(m.quarantined, s"hostile row $id must quarantine")
        assert(m.format.isEmpty && m.width.isEmpty && m.n_frames.isEmpty)
      }
    }
  }

  test("decodeFrames on hostile bytes yields zero frames, never a throw") {
    assert(MediaPipeline.decodeFrames(1L, MediaPipeline.synthesizeHostileImage(1L)).isEmpty)
    assert(MediaPipeline.decodeFrames(2L, Array.emptyByteArray).isEmpty)
    assert(MediaPipeline.decodeFrames(3L, null).isEmpty)
    // truncated png: header readable, raster amputated → no frames
    assert(MediaPipeline.decodeFrames(3L, MediaPipeline.synthesizeHostileImage(3L)).isEmpty)
  }

  test("wav synthesize → decode recovers planted rate/channels/frames/peak") {
    for (id <- 0L to 20L) {
      val m = MediaPipeline.decodeWav(id, MediaPipeline.synthesizeWav(id))
      assert(!m.quarantined, s"id=$id must decode")
      val expSr = Array(8000, 11025, 16000, 22050)((id % 4).toInt)
      val expCh = (1 + id % 2).toInt
      val expFrames = 500 + id % 1000
      assert(m.sample_rate.contains(expSr))
      assert(m.channels.contains(expCh))
      assert(m.n_frames.contains(expFrames))
      assert(m.duration_ms.contains(expFrames * 1000 / expSr))
      val nSamples = expFrames * expCh
      val expPeak =
        if (id % 3000 + nSamples <= 3000) (id % 3000 + nSamples - 1 - 1500).toInt
        else 1499
      assert(m.peak.contains(expPeak), s"id=$id planted peak must survive the PCM pass")
    }
  }

  test("hostile audio quarantines: junk, empty, truncated wav") {
    assert(MediaPipeline.decodeWav(1L, Array.tabulate(64)(i => (i * 37).toByte)).quarantined)
    assert(MediaPipeline.decodeWav(2L, Array.emptyByteArray).quarantined)
    val wav = MediaPipeline.synthesizeWav(3L)
    assert(MediaPipeline.decodeWav(3L, java.util.Arrays.copyOf(wav, 20)).quarantined)
    assert(MediaPipeline.decodeWav(4L, null).quarantined)
  }

  test("image features: real pixel sums match the closed-form raster") {
    for (id <- Seq(0L, 3L, 4L, 7L, 8L, 11L)) { // png and bmp rows
      val f = MediaPipeline.imageFeatures(id, MediaPipeline.synthesizeImage(id))
      val w = (16 + id % 48).toInt; val h = (12 + id % 36).toInt
      var px = id % 256 // planted (0,0)
      for (y <- 0 until h; x <- 0 until w; if !(x == 0 && y == 0))
        px += (x * 31 + y * 17) & 63
      assert(f.px_sum.contains(px), s"id=$id full-raster sum")
      var th = 0L
      for (ty <- 0 until 6; tx <- 0 until 8) {
        val sx = tx * w / 8; val sy = ty * h / 6
        th += (if (sx == 0 && sy == 0) id % 256 else (sx * 31 + sy * 17) & 63)
      }
      assert(f.thumb_sum.contains(th), s"id=$id thumbnail resample sum")
    }
    // lossy/palette formats stay null by discipline
    assert(MediaPipeline.imageFeatures(1L, MediaPipeline.synthesizeImage(1L)).px_sum.isEmpty)
    assert(MediaPipeline.imageFeatures(2L, MediaPipeline.synthesizeImage(2L)).px_sum.isEmpty)
    // hostile bytes → nulls, no throw
    assert(MediaPipeline.imageFeatures(9L, Array.emptyByteArray).px_sum.isEmpty)
  }

  test("fuzz: bit-flipped and truncated images never throw") {
    val rnd = new scala.util.Random(42)
    for (id <- 0L to 7L) {
      val base = MediaPipeline.synthesizeImage(id)
      for (_ <- 0 until 25) {
        val mut = base.clone()
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
        MediaPipeline.decodeImage(id, mut) // must not throw; result free-form
        val cut = java.util.Arrays.copyOf(base, rnd.nextInt(base.length))
        MediaPipeline.decodeImage(id, cut)
      }
    }
  }
}
