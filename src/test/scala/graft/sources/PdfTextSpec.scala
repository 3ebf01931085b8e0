package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite

/** S3: the native minimal PDF extractor against hand-authored PDF
  * fixtures — an uncompressed content stream, a FlateDecode stream
  * (deflated in the test, round-tripping the JDK Inflater path), PDF
  * string escapes/octal, TJ kerning arrays, and the failure channel.
  */
class PdfTextSpec extends AnyFunSuite {

  private def pdf(contents: String, flate: Boolean): Array[Byte] = {
    val content: Array[Byte] =
      if (!flate) contents.getBytes(ISO_8859_1)
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(contents.getBytes(ISO_8859_1)); d.finish()
        val buf = new Array[Byte](8192)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      }
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val head = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length}$filter >>\nstream\n").getBytes(ISO_8859_1)
    val tail = "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
      .getBytes(ISO_8859_1)
    head ++ content ++ tail
  }

  test("uncompressed content stream with Tj") {
    val bytes = pdf(
      "BT /F1 12 Tf 72 720 Td (Die Beschwerde wird abgewiesen.) Tj ET", flate = false)
    assert(PdfText.extract(bytes) == "Die Beschwerde wird abgewiesen.")
  }

  test("FlateDecode stream round-trips through the JDK inflater") {
    val bytes = pdf(
      "BT (Das Bundesgericht zieht in Erwaegung) Tj ET\n" +
        "BT (dass die Beschwerde rechtzeitig erfolgte.) Tj ET", flate = true)
    assert(PdfText.extract(bytes) ==
      "Das Bundesgericht zieht in Erwaegung\ndass die Beschwerde rechtzeitig erfolgte.")
  }

  test("TJ kerning arrays and string escapes decode") {
    val bytes = pdf(
      """BT [(Gem\344ss Art\. 5 \(Abs\. 2\)) -250 (gilt dies nicht)] TJ ET""",
      flate = false)
    assert(PdfText.extract(bytes) == "Gemäss Art. 5 (Abs. 2) gilt dies nicht")
  }

  test("octal escapes and nested parens") {
    val bytes = pdf("""BT (\101\102 (nested) ok) Tj ET""", flate = false)
    assert(PdfText.extract(bytes) == "AB (nested) ok")
  }

  test("undecodable input yields null (quarantine channel)") {
    assert(PdfText.extract(null) == null)
    assert(PdfText.extract(Array[Byte](1, 2, 3)) == null)
    assert(PdfText.extract("%PDF-1.4 no streams here".getBytes(ISO_8859_1)) == null)
    // corrupt flate data: stream declared FlateDecode but garbage
    val corrupt = pdf("garbage", flate = false)
      .clone()
    val asStr = new String(corrupt, ISO_8859_1)
      .replace(">>", " /Filter /FlateDecode >>")
    assert(PdfText.extract(asStr.getBytes(ISO_8859_1)) == null)
  }

  test("multiple streams with mixed filters extract in order") {
    // plain stream followed by a Flate stream in one file — the scan
    // must not re-match the 'stream' inside 'endstream' and must
    // attribute each dict to its own stream
    val plain = "BT (Erster Teil des Urteils.) Tj ET".getBytes(ISO_8859_1)
    val flateSrc = "BT (Zweiter Teil des Urteils.) Tj ET".getBytes(ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(flateSrc); d.finish()
    val buf = new Array[Byte](8192)
    val n = d.deflate(buf); d.end()
    val flate = java.util.Arrays.copyOf(buf, n)
    val bytes = "%PDF-1.4\n4 0 obj << /Length 35 >>\nstream\n".getBytes(ISO_8859_1) ++
      plain ++ "\nendstream\nendobj\n".getBytes(ISO_8859_1) ++
      s"5 0 obj << /Length $n /Filter /FlateDecode >>\nstream\n".getBytes(ISO_8859_1) ++
      flate ++ "\nendstream\nendobj\n%%EOF\n".getBytes(ISO_8859_1)
    assert(PdfText.extract(bytes) ==
      "Erster Teil des Urteils.\nZweiter Teil des Urteils.")
  }

  test("hex string operands decode; dict opens are not strings") {
    val bytes = pdf("BT <4772 7565 7A69> Tj (und) Tj <21> Tj ET", flate = false)
    assert(PdfText.extract(bytes) == "Gruezi und !")
  }

  test("ET inside a string operand does not end the text block") {
    // regression found by PdfProps: shown text containing the block
    // terminator token was truncated
    val bytes = pdf("BT (ETH Lausanne ET Bern BT Zurich) Tj ET", flate = false)
    assert(PdfText.extract(bytes) == "ETH Lausanne ET Bern BT Zurich")
  }

  test("NUL bytes are stripped like the reference") {
    val bytes = pdf("BT (vor\\000nach) Tj ET", flate = false)
    assert(PdfText.extract(bytes) == "vornach")
  }
}
