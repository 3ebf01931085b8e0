package graft.sources

import java.io.{InputStream, OutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream,
  CompressionOutputStream, Compressor, Decompressor}
import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}

/** Hadoop CompressionCodec for the .zst container, backed by the
  * zstd-jni library Spark already ships (`zstd-jni-1.5.7-6.jar` — the
  * same JNI binding parquet's zstd pages go through, so no new native
  * dependency).
  *
  * Exists because zstd is the de-facto interchange compression for
  * large text corpora (RedPajama/SlimPajama/The Pile ship `.jsonl.zst`
  * shards), but Hadoop's own ZStandardCodec requires libhadoop — which
  * this JVM (and many Spark images) does not load. Like XzCodec this
  * is a STREAM-ONLY pure-JVM codec: no pooled Compressor/Decompressor
  * (both return null, which CodecPool and the text/json read+write
  * paths handle), not splittable — write many shards and let one task
  * decompress each, the layout those corpora already use.
  */
class ZstdCodec extends CompressionCodec {

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new CompressionOutputStream(out) {
      // closeFrameOnFlush: finish() must TERMINATE the frame per the
      // CompressionOutputStream contract (a flush that leaves the frame
      // open would hand Hadoop-API consumers a payload zstd decoders
      // reject as truncated); with it, flush writes the frame epilogue
      // — concatenated frames are valid zstd, and close() tolerates an
      // already-closed frame
      private val zs = new ZstdOutputStream(out, ZstdCodec.Level)
        .setCloseFrameOnFlush(true)
      private var done = false
      override def write(b: Int): Unit = zs.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        zs.write(b, off, len)
      override def finish(): Unit = if (!done) { done = true; zs.flush() }
      override def resetState(): Unit = ()
      override def close(): Unit = { finish(); zs.close() } // closes `out` too
    }

  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createInputStream(in: InputStream): CompressionInputStream =
    new CompressionInputStream(in) {
      private val zs = new ZstdInputStream(in)
      override def read(): Int = zs.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int = zs.read(b, off, len)
      override def resetState(): Unit = ()
      override def available(): Int = zs.available()
      override def close(): Unit = zs.close()
    }

  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def createCompressor(): Compressor = null
  override def createDecompressor(): Decompressor = null
  override def getCompressorType: Class[_ <: Compressor] = null
  override def getDecompressorType: Class[_ <: Decompressor] = null
  override def getDefaultExtension: String = ".zst"
}

object ZstdCodec {
  /** zstd level 3 = the `zstd` CLI default. */
  val Level = 3

  /** Make `.zst` files resolvable on READ (additive registration, same
    * contract as [[XzCodec.register]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val cls = classOf[ZstdCodec].getName
    val cur = Option(conf.get(key)).getOrElse("")
    if (!cur.contains(cls))
      conf.set(key, if (cur.isEmpty) cls else s"$cur,$cls")
  }
}
