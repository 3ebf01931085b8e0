package graft.sources

import java.io.{InputStream, OutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream,
  CompressionOutputStream, Compressor, Decompressor}
import org.tukaani.xz.{LZMA2Options, XZInputStream, XZOutputStream}

/** Hadoop CompressionCodec for the .xz container, backed by the
  * org.tukaani.xz library Spark already ships (`xz-1.10.jar`).
  *
  * Exists for sink parity with the reference's JSONL export, which
  * pipes through `xz -T0` (`scrc/dataset_creation/dataset_creator.py:
  * 482-489`). Spark's text sinks accept any CompressionCodec class
  * name as the `compression` option, and the read side resolves codecs
  * from the file extension via CompressionCodecFactory once the class
  * is listed in `io.compression.codecs` (see [[XzCodec.register]]).
  *
  * Stream-only codec: like Hadoop's pure-Java BZip2 path, there is no
  * pooled Compressor/Decompressor — `create{Compressor,Decompressor}`
  * return null and the stream constructors ignore the pooled argument.
  * CodecPool handles null types (its pool lookup and payback both
  * null-check), and Spark's text/json read+write paths only ever use
  * the stream API. Not splittable — at scale, write many shards (the
  * writer already does), each decompressed by one task; identical to
  * the reference's sharded `.jsonl.xz` layout.
  */
class XzCodec extends CompressionCodec {

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new CompressionOutputStream(out) {
      private val xz = new XZOutputStream(out, new LZMA2Options(XzCodec.Preset))
      private var done = false
      override def write(b: Int): Unit = xz.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        xz.write(b, off, len)
      override def finish(): Unit = if (!done) { done = true; xz.finish() }
      override def resetState(): Unit = ()
      override def close(): Unit = { finish(); xz.close() } // closes `out` too
    }

  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createInputStream(in: InputStream): CompressionInputStream =
    new CompressionInputStream(in) {
      private val xz = new XZInputStream(in)
      override def read(): Int = xz.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int = xz.read(b, off, len)
      override def resetState(): Unit = ()
      override def available(): Int = xz.available()
      override def close(): Unit = xz.close()
    }

  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def createCompressor(): Compressor = null
  override def createDecompressor(): Decompressor = null
  override def getCompressorType: Class[_ <: Compressor] = null
  override def getDecompressorType: Class[_ <: Decompressor] = null
  override def getDefaultExtension: String = ".xz"
}

object XzCodec {
  /** LZMA2 preset 6 = the `xz` CLI default the reference shells out to. */
  val Preset = 6

  /** Make `.xz` files resolvable on READ: CompressionCodecFactory only
    * consults registered codecs, and registration is additive — Hadoop
    * always service-loads the built-ins, the conf key only appends.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val cls = classOf[XzCodec].getName
    val cur = Option(conf.get(key)).getOrElse("")
    if (!cur.contains(cls))
      conf.set(key, if (cur.isEmpty) cls else s"$cur,$cls")
  }
}
