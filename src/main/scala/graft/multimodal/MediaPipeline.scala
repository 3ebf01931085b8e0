package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/video payloads as opaque `binary` columns
  * with typed metadata, decoded per-partition in batches with a REAL
  * JDK-only codec tier (`javax.imageio` — PNG, JPEG, GIF, BMP; the same
  * no-new-dependency discipline as sources.PdfText).
  *
  * The fixture strategy mirrors the PDF tier (m3–m6): each row
  * SYNTHESIZES a real image with writer-known dimensions / frame count /
  * top-left pixel, the decoder recovers them from the actual bytes, and
  * the oracle restates the ground truth the writer planted — so a gate
  * passing proves the decode is real, not arithmetic on byte lengths.
  * Multi-frame payloads (the video stand-in) are animated GIFs written
  * with `writeToSequence`; frame sampling decodes EVERY frame's pixel
  * raster, the per-frame shape of video frame extraction.
  *
  * Hostile bytes follow the m5 quarantine discipline: no reader claims
  * the bytes, the container is truncated, or pixel-data decode throws →
  * a quarantined row with null metadata, never an exception. Validity is
  * decided by decoding frame 0's raster, not by trusting header fields
  * (a truncated PNG has a readable IHDR but undecodable pixel data).
  *
  * Scale notes: decode work is embarrassingly parallel and CPU-bound —
  * `mapPartitions` amortizes per-batch setup across the partition,
  * exactly like a Pandas UDF amortizes Arrow batch conversion. Binary
  * payloads stay off the driver; only small metadata structs flow into
  * downstream joins/aggregations. `ImageIO.setUseCache(false)` keeps the
  * codec in-memory (the default spills every decode through a temp
  * file — pathological with 32 executor threads on one disk). Partition
  * sizing: binary columns dominate bytes — set
  * `spark.sql.files.maxPartitionBytes` so a partition of payloads fits
  * executor memory, and never collect() a binary column.
  *
  * Reference: file-format handling in scrc's ingest
  * (text_to_database.py) treats media as opaque bytes + extracted
  * metadata; this is the Spark-native shape of that contract.
  */
object MediaPipeline {

  // In-memory ImageIO streams; runs once per JVM on first class use
  // (driver AND executors — the decode closures reference this object).
  ImageIO.setUseCache(false)

  /** Decoded image/video metadata; quarantined rows carry nulls.
    * `px_red` (top-left red channel) is only asserted for lossless
    * RGB formats (png, bmp) — JPEG is lossy, GIF is palette-quantized.
    */
  case class MediaMeta(doc_id: Long, quarantined: Boolean,
                       format: Option[String], width: Option[Int],
                       height: Option[Int], n_frames: Option[Int],
                       px_red: Option[Int])

  case class FrameMeta(doc_id: Long, frame_idx: Int, frame_w: Int, frame_h: Int)

  private def quarantine(id: Long) =
    MediaMeta(id, quarantined = true, None, None, None, None, None)

  /** Deterministic raster: ≤64 gray levels + one planted pixel, so the
    * GIF palette stays exact and the writer knows every ground truth.
    */
  private def frame(id: Long, w: Int, h: Int, idx: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 31 + y * 17 + idx * 7) & 0x3f) * 0x010101)
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0,
      ((id % 256).toInt << 16) | (((id * 7) % 256).toInt << 8) | ((id * 13) % 256).toInt)
    img
  }

  /** Synthesize a REAL image for doc `id` — the fixture writer.
    * format = id%4 ∈ {png, jpeg, gif, bmp}; width = 16 + id%48;
    * height = 12 + id%36; gif payloads are animated with 1 + id%3
    * frames (the multi-frame/video stand-in).
    */
  def synthesizeImage(id: Long): Array[Byte] = {
    val fmt = (id % 4) match {
      case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"; case _ => "bmp"
    }
    val w = (16 + id % 48).toInt
    val h = (12 + id % 36).toInt
    val baos = new ByteArrayOutputStream()
    if (fmt == "gif") {
      val nFrames = (1 + id % 3).toInt
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var i = 0
        while (i < nFrames) {
          writer.writeToSequence(new IIOImage(frame(id, w, h, i), null, null), null)
          i += 1
        }
        writer.endWriteSequence()
      } finally { ios.close(); writer.dispose() }
    } else ImageIO.write(frame(id, w, h, 0), fmt, baos)
    baos.toByteArray
  }

  /** Hostile fixture classes (id%4): 0 = valid png (control row);
    * 1 = junk bytes no reader claims; 2 = empty payload; 3 = truncated
    * png (valid header, amputated pixel data — the class that punishes
    * header-trusting decoders).
    */
  def synthesizeHostileImage(id: Long): Array[Byte] = (id % 4) match {
    case 0 => synthesizeImage(id * 4) // (id*4)%4 == 0 → png
    case 1 => Array.tabulate(64)(i => (i * 37).toByte)
    case 2 => Array.emptyByteArray
    case _ =>
      val p = synthesizeImage(id * 4)
      java.util.Arrays.copyOf(p, p.length / 2)
  }

  /** REAL decode of one payload: find a reader by magic bytes, count
    * frames, decode frame 0's raster (the validity check), read the
    * planted pixel. Any failure → quarantined row, never a throw.
    */
  def decodeImage(docId: Long, bytes: Array[Byte]): MediaMeta =
    try {
      if (bytes == null || bytes.isEmpty) quarantine(docId)
      else {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) quarantine(docId)
          else {
            val r = readers.next()
            try {
              r.setInput(iis, false, true)
              val n = r.getNumImages(true)
              val img0 = r.read(0)
              val fmt = r.getFormatName.toLowerCase
              val pxRed =
                if (fmt == "png" || fmt == "bmp") Some((img0.getRGB(0, 0) >> 16) & 0xff)
                else None
              MediaMeta(docId, quarantined = false, Some(fmt),
                Some(img0.getWidth), Some(img0.getHeight), Some(n), pxRed)
            } finally r.dispose()
          }
        } finally iis.close()
      }
    } catch { case scala.util.control.NonFatal(_) => quarantine(docId) }

  /** Decode EVERY frame of a payload (video frame extraction shape):
    * one output row per frame with that frame's real decoded raster
    * dimensions. Quarantined payloads yield zero frames.
    */
  def decodeFrames(docId: Long, bytes: Array[Byte]): Seq[FrameMeta] =
    try {
      if (bytes == null || bytes.isEmpty) Nil
      else {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Nil
          else {
            val r = readers.next()
            try {
              r.setInput(iis, false, true)
              val n = r.getNumImages(true)
              (0 until n).map { i =>
                val img = r.read(i)
                FrameMeta(docId, i, img.getWidth, img.getHeight)
              }
            } finally r.dispose()
          }
        } finally iis.close()
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }

  case class ImageFeatures(doc_id: Long, px_sum: Option[Long], thumb_sum: Option[Long])

  /** REAL pixel-level feature extraction over the decoded raster —
    * the feature-extract step of a multimodal pipeline, done on actual
    * decoded pixels (not header fields): full-raster red-channel sum,
    * plus an 8×6 nearest-neighbor THUMBNAIL resample (sample (tx,ty) →
    * source pixel (tx·w/8, ty·h/6), integer floor) summed the same way
    * — the deterministic core of a resize op, oracle-restatable because
    * the fixture raster is closed-form. Only the LOSSLESS RGB formats
    * (png, bmp) produce values; jpeg is lossy and gif palette-quantized
    * → nulls, same discipline as px_red in decodeImage.
    */
  def imageFeatures(docId: Long, bytes: Array[Byte]): ImageFeatures =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) ImageFeatures(docId, None, None)
        else {
          val r = readers.next()
          try {
            r.setInput(iis, false, true)
            val fmt = r.getFormatName.toLowerCase
            if (fmt != "png" && fmt != "bmp") ImageFeatures(docId, None, None)
            else {
              val img = r.read(0)
              val w = img.getWidth; val h = img.getHeight
              var pxSum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { pxSum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
                y += 1
              }
              var thumbSum = 0L
              var ty = 0
              while (ty < 6) {
                var tx = 0
                while (tx < 8) {
                  thumbSum += (img.getRGB(tx * w / 8, ty * h / 6) >> 16) & 0xff
                  tx += 1
                }
                ty += 1
              }
              ImageFeatures(docId, Some(pxSum), Some(thumbSum))
            }
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => ImageFeatures(docId, None, None) }

  def decodeImageFeatures(withPayload: DataFrame): Dataset[ImageFeatures] = {
    import withPayload.sparkSession.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(batch => batch.map { case (id, b) => imageFeatures(id, b) })
  }

  case class AudioMeta(doc_id: Long, quarantined: Boolean,
                       sample_rate: Option[Int], channels: Option[Int],
                       n_frames: Option[Long], duration_ms: Option[Long],
                       peak: Option[Int])

  private def audioQuarantine(id: Long) =
    AudioMeta(id, quarantined = true, None, None, None, None, None)

  private val sampleRates = Array(8000, 11025, 16000, 22050)

  /** WAV codec providers resolved ONCE per JVM via the public
    * ServiceLoader SPI and reused stateless: every `AudioSystem.*` call
    * re-walks a GLOBALLY SYNCHRONIZED provider registry — measured
    * FLAT throughput from 1→32 threads (the whole decode tier
    * serializes); the direct provider is 3× faster single-threaded and
    * scales linearly (50→9 ms for 4k decodes at 32 threads, PERF.md).
    */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val probe = synthesizeWavVia(null, 0L) // AudioSystem path, once
    var found: javax.sound.sampled.spi.AudioFileReader = null
    while (found == null && it.hasNext) {
      val r = it.next()
      try { r.getAudioFileFormat(new ByteArrayInputStream(probe)); found = r }
      catch { case scala.util.control.NonFatal(_) => () }
    }
    require(found != null, "no WAVE-capable AudioFileReader on this JVM")
    found
  }

  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        found = w
    }
    require(found != null, "no WAVE-capable AudioFileWriter on this JVM")
    found
  }

  /** Synthesize a REAL PCM-16 WAV for doc `id` (javax.sound.sampled —
    * the audio sibling of synthesizeImage): sample rate = id%4 of
    * {8000, 11025, 16000, 22050}; channels = 1 + id%2; frames =
    * 500 + id%1000; interleaved sample i carries the signed value
    * `(id + i) mod 3000 - 1500` so the decoder-recovered PEAK has a
    * writer-known closed form.
    */
  def synthesizeWav(id: Long): Array[Byte] = synthesizeWavVia(wavWriter, id)

  /** `via == null` uses the AudioSystem path — only for the one-time
    * provider probe (chicken-and-egg: the SPI lookup needs a valid WAV).
    */
  private def synthesizeWavVia(
      via: javax.sound.sampled.spi.AudioFileWriter, id: Long): Array[Byte] = {
    val sr = sampleRates(((id % 4) + 4).toInt % 4)
    val ch = (1 + id % 2).toInt
    val nFrames = (500 + id % 1000).toInt
    val nSamples = nFrames * ch
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((id + i) % 3000) - 1500).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, ch, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new ByteArrayOutputStream()
    if (via == null)
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    else via.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL WAV decode: container metadata via AudioSystem plus a full
    * sample pass (little-endian PCM-16) for the peak — the
    * feature-extraction shape over an audio column. Undecodable bytes
    * quarantine, never throw.
    */
  def decodeWav(docId: Long, bytes: Array[Byte]): AudioMeta =
    try {
      if (bytes == null || bytes.isEmpty) audioQuarantine(docId)
      else {
        val in = new ByteArrayInputStream(bytes)
        val aff = wavReader.getAudioFileFormat(in)
        val f = aff.getFormat
        val ais = wavReader.getAudioInputStream(new ByteArrayInputStream(bytes))
        val data = try ais.readAllBytes() finally ais.close()
        var peak = Int.MinValue
        var i = 0
        while (i + 1 < data.length) {
          val v = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toInt
          if (v > peak) peak = v
          i += 2
        }
        val sr = f.getSampleRate.toInt
        val frames = aff.getFrameLength.toLong
        AudioMeta(docId, quarantined = false, Some(sr), Some(f.getChannels),
          Some(frames), Some(frames * 1000L / sr),
          if (peak == Int.MinValue) None else Some(peak))
      }
    } catch { case scala.util.control.NonFatal(_) => audioQuarantine(docId) }

  case class AudioWindow(doc_id: Long, win_idx: Int, energy: Long)

  /** Windowed ENERGY over the decoded PCM stream (256-sample windows,
    * hop 128 — the framing stage of every audio front-end, MFCC
    * included): one row per window with the exact integer sum of
    * squared samples. Decodes the REAL payload bytes; quarantined
    * payloads emit no windows.
    */
  def decodeAudioWindows(docId: Long, bytes: Array[Byte],
                         win: Int = 256, hop: Int = 128): Seq[AudioWindow] =
    try {
      if (bytes == null || bytes.isEmpty) Nil
      else {
        val ais = wavReader.getAudioInputStream(new ByteArrayInputStream(bytes))
        val data = try ais.readAllBytes() finally ais.close()
        val n = data.length / 2
        if (n < win) Nil
        else (0 to (n - win) / hop).map { k =>
          var e = 0L
          var j = 0
          while (j < win) {
            val idx = k * hop + j
            val v = ((data(2 * idx) & 0xff) | (data(2 * idx + 1) << 8)).toShort.toLong
            e += v * v
            j += 1
          }
          AudioWindow(docId, k, e)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }

  def audioWindows(withPayload: DataFrame): Dataset[AudioWindow] = {
    import withPayload.sparkSession.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(batch => batch.flatMap { case (id, b) => decodeAudioWindows(id, b) })
  }

  case class ImageHash(doc_id: Long, ahash: Option[Long])

  /** Perceptual AVERAGE HASH over the decoded raster (the pHash-family
    * image near-dup fingerprint): 8×6 nearest-neighbor thumbnail of the
    * red channel, bit i set when sample i exceeds the integer mean —
    * a 48-bit fingerprint computed from REAL decoded pixels. Lossless
    * formats only (same discipline as imageFeatures); undecodable or
    * lossy rows → null.
    */
  def imageAHash(docId: Long, bytes: Array[Byte]): ImageHash =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) ImageHash(docId, None)
        else {
          val r = readers.next()
          try {
            r.setInput(iis, false, true)
            val fmt = r.getFormatName.toLowerCase
            if (fmt != "png" && fmt != "bmp") ImageHash(docId, None)
            else {
              val img = r.read(0)
              val w = img.getWidth; val h = img.getHeight
              val t = new Array[Long](48)
              var sum = 0L
              var ty = 0
              while (ty < 6) {
                var tx = 0
                while (tx < 8) {
                  val v = ((img.getRGB(tx * w / 8, ty * h / 6) >> 16) & 0xff).toLong
                  t(ty * 8 + tx) = v; sum += v
                  tx += 1
                }
                ty += 1
              }
              val mean = sum / 48 // integer mean — exact, oracle-restatable
              var hash = 0L
              var i = 0
              while (i < 48) { if (t(i) > mean) hash |= (1L << i); i += 1 }
              ImageHash(docId, Some(hash))
            }
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => ImageHash(docId, None) }

  def imageAHashes(withPayload: DataFrame): Dataset[ImageHash] = {
    import withPayload.sparkSession.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(batch => batch.map { case (id, b) => imageAHash(id, b) })
  }

  def withWavPayload(docs: DataFrame): DataFrame = {
    val mk = udf { id: Long => synthesizeWav(id) }
    byCores(docs).withColumn("payload", mk(col("doc_id")))
  }

  def decodeAudioMeta(withPayload: DataFrame): Dataset[AudioMeta] = {
    import withPayload.sparkSession.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(batch => batch.map { case (id, b) => decodeWav(id, b) })
  }

  /** Codec work is CPU-bound and per-row: parallelism must track CORES,
    * not input bytes — a small parquet file arrives as ONE partition and
    * would run the whole encode/decode serially (at 100 TB the same
    * mismatch appears as a few huge partitions; `maxPartitionBytes` is
    * sized for scan throughput, not per-row CPU). One narrow-shuffle
    * repartition to the cluster's parallelism before the heavy loop.
    */
  private def byCores(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)

  /** Attach a binary image payload column synthesized per row (the
    * stand-in for media bytes landed by an ingest job — real encoded
    * images, not text cast to binary).
    */
  def withImagePayload(docs: DataFrame): DataFrame = {
    val mkImage = udf { id: Long => synthesizeImage(id) }
    byCores(docs).withColumn("payload", mkImage(col("doc_id")))
  }

  def withHostilePayload(docs: DataFrame): DataFrame = {
    val mk = udf { id: Long => synthesizeHostileImage(id) }
    byCores(docs).withColumn("payload", mk(col("doc_id")))
  }

  /** Decode payloads partition-by-partition. The iterator never
    * materializes the whole partition; codec setup (ImageIO registry
    * lookup) amortizes across the partition's batch.
    */
  def decodeMeta(withPayload: DataFrame): Dataset[MediaMeta] = {
    import withPayload.sparkSession.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition decoder context lives here
        batch.map { case (id, bytes) => decodeImage(id, bytes) }
      }
  }

  /** Frame sampling: one row per DECODED frame (gif payloads emit one
    * row per animation frame; single-image formats emit one row), via a
    * flatMap generator over the partition batch.
    */
  def sampleFrames(withPayload: DataFrame): Dataset[FrameMeta] = {
    import withPayload.sparkSession.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(batch => batch.flatMap { case (id, bytes) => decodeFrames(id, bytes) })
  }
}
