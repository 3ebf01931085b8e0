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

  test("truncation mid-file never throws across prefix lengths") {
    val full = PdfText.synthesize(text, Seq("FlateDecode"))
    for (n <- 8 until full.length by 7) {
      val cut = java.util.Arrays.copyOf(full, n)
      val out = extract(cut) // null or a string — must not throw
      assert(out == null || out.isInstanceOf[String])
    }
  }
}
