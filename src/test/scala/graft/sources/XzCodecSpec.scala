package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** Codec-level round-trip spec: arbitrary binary payloads through the
  * Hadoop stream API (what Spark's text sinks/sources actually call),
  * independent of the JSONL happy path SinksSpec covers.
  */
class XzCodecSpec extends AnyFunSuite {

  private val codec = new XzCodec

  private def roundTrip(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = codec.createOutputStream(bos)
    out.write(data, 0, data.length)
    out.close()
    val in = codec.createInputStream(new ByteArrayInputStream(bos.toByteArray))
    val buf = new ByteArrayOutputStream()
    val chunk = new Array[Byte](4096)
    var n = in.read(chunk, 0, chunk.length)
    while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk, 0, chunk.length) }
    in.close()
    buf.toByteArray
  }

  test("random binary payloads round-trip exactly (sizes 0..64k)") {
    val rnd = new scala.util.Random(0xC0DEC)
    for (size <- Seq(0, 1, 15, 16, 17, 1000, 65536)) {
      val data = new Array[Byte](size)
      rnd.nextBytes(data)
      assert(roundTrip(data).sameElements(data), s"size=$size")
    }
  }

  test("compressible text shrinks and single-byte writes agree with bulk") {
    val text = ("Die Beschwerde wird abgewiesen. " * 1000).getBytes("UTF-8")
    val bos = new ByteArrayOutputStream()
    val out = codec.createOutputStream(bos)
    text.foreach(b => out.write(b & 0xff)) // the write(int) path
    out.close()
    assert(bos.size() < text.length / 10, s"xz should crush repetition: ${bos.size()}")
    val in = codec.createInputStream(new ByteArrayInputStream(bos.toByteArray))
    val back = new Array[Byte](text.length)
    var off = 0
    var n = in.read(back, off, back.length - off)
    while (n > 0 && off + n < back.length) { off += n; n = in.read(back, off, back.length - off) }
    assert(back.sameElements(text))
  }

  test("pooled-API entry points tolerate the null compressor/decompressor") {
    // LineRecordReader passes CodecPool results straight back in
    val bos = new ByteArrayOutputStream()
    val out = codec.createOutputStream(bos, codec.createCompressor())
    out.write("zeile".getBytes("UTF-8")); out.close()
    val in = codec.createInputStream(
      new ByteArrayInputStream(bos.toByteArray), codec.createDecompressor())
    val buf = new Array[Byte](16)
    val n = in.read(buf, 0, 16)
    assert(new String(buf, 0, n, "UTF-8") == "zeile")
  }
}
