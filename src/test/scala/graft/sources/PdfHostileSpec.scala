package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-PDF quarantine behavior (S3 residue, VERDICT r3 item 5):
  * for each damage class the outcome is pinned — either full recovery
  * or a clean null (quarantine), NEVER corrupted text. The reference
  * shells to Tika and logs+skips failures (`text_to_database.py`);
  * the native tier must degrade the same way.
  *
  * Measured split over the fixture corpus: 1 of 5 classes recovers
  * (wrong-length via the EOL-consistency fallback), 4 of 5 quarantine.
  */
class PdfHostileSpec extends AnyFunSuite {
  import PdfText.{extract, synthesizeHostile}

  private val text = "Die Beschwerde wird abgewiesen."

  test("wrong /Length RECOVERS the full text (EOL-consistency fallback)") {
    assert(extract(synthesizeHostile("wrong-length", text)) == text)
  }

  test("bogus decode filter quarantines (null), never raw bytes") {
    assert(extract(synthesizeHostile("bogus-filter", text)) == null)
  }

  test("file truncated mid-stream quarantines") {
    assert(extract(synthesizeHostile("truncated", text)) == null)
  }

  test("corrupt FlateDecode bytes quarantine") {
    assert(extract(synthesizeHostile("corrupt-flate", text)) == null)
  }

  test("Identity-H WITHOUT ToUnicode quarantines instead of corrupting") {
    val bytes = synthesizeHostile("identity-h-no-tounicode", text)
    // the old behavior decoded the 2-byte CID codes as Latin-1 garbage;
    // that text must never surface
    assert(extract(bytes) == null)
  }

  test("Identity-H WITH an embedded ToUnicode still decodes (control)") {
    assert(extract(PdfText.synthesizeCid(text)) == text)
  }

  test("mixed document: CID hex skipped, simple-font text KEPT") {
    // a Type0/Identity-H font with no ToUnicode must not quarantine
    // the whole document when other streams carry decodable
    // literal-string text (e.g. a watermark font subset next to the
    // real ruling) — only the undecodable hex strings are dropped
    val cidPart = PdfText.synthesizeHostile("identity-h-no-tounicode", "Geheim")
    val simple = ("9 0 obj << /Length 41 >>\nstream\n" +
      "BT (Lesbarer Teil bleibt erhalten.) Tj ET" +
      "\nendstream\nendobj\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val mixed = cidPart.dropRight("%%EOF\n".length) ++ simple ++
      "%%EOF\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(extract(mixed) == "Lesbarer Teil bleibt erhalten.")
  }

  test("truncation mid-file never throws across prefix lengths") {
    val fixtures = Seq(
      PdfText.synthesize(text, Seq("FlateDecode")),
      PdfText.synthesizeEncrypted(text, "rc4-128"),
      PdfText.synthesizeEncrypted(text, "aes-128"),
      PdfText.synthesizeCid(text))
    for (full <- fixtures; n <- 8 until full.length by 7) {
      val cut = java.util.Arrays.copyOf(full, n)
      val out = extract(cut) // null or a string — must not throw
      assert(out == null || out.isInstanceOf[String])
    }
  }
}
