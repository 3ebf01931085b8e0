package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Font-program CID recovery tier (S3 exotic-PDF upper tier): a
  * Type0/Identity-H document without /ToUnicode resolves through the
  * embedded TrueType font's own `cmap` (glyph id → Unicode inversion) —
  * the Tika/PDFBox approach. Without a font program the class stays
  * terminal (m5 pins the quarantine).
  */
class TrueTypeCmapSpec extends AnyFunSuite {

  test("format-4 cmap round-trips through synthesizeFont") {
    val chars = "Urteil des Bundesgrichta.äü ".distinct.sorted
    val font = TrueTypeCmap.synthesizeFont(chars)
    assert(TrueTypeCmap.looksLikeSfnt(font))
    val inv = TrueTypeCmap.gidToUnicode(font).get
    chars.zipWithIndex.foreach { case (c, i) =>
      assert(inv(i + 1) == c.toString, s"gid ${i + 1} should map to '$c'")
    }
    assert(!inv.contains(0), "gid 0 (.notdef) must never map")
  }

  test("hand-built format-12 subtable parses (grouped u32 mapping)") {
    // sfnt with one (3,10) format-12 subtable: U+0041..U+0043 -> gid 5..7
    val bb = java.nio.ByteBuffer.allocate(256)
    bb.putInt(0x00010000); bb.putShort(1)          // 1 table
    bb.putShort(16); bb.putShort(0); bb.putShort(0)
    bb.put("cmap".getBytes("US-ASCII")); bb.putInt(0); bb.putInt(28); bb.putInt(44)
    // cmap @28: version 0, 1 subtable, (3,10) at offset 12
    bb.putShort(0); bb.putShort(1)
    bb.putShort(3); bb.putShort(10); bb.putInt(12)
    // format 12 @40: format, reserved, length, language, nGroups=1
    bb.putShort(12); bb.putShort(0); bb.putInt(44); bb.putInt(0); bb.putInt(1)
    bb.putInt(0x41); bb.putInt(0x43); bb.putInt(5)
    val font = java.util.Arrays.copyOf(bb.array(), bb.position())
    val inv = TrueTypeCmap.gidToUnicode(font).get
    assert(inv(5) == "A" && inv(6) == "B" && inv(7) == "C")
  }

  test("damaged or non-font bytes yield None, never a throw") {
    assert(TrueTypeCmap.gidToUnicode(null).isEmpty)
    assert(TrueTypeCmap.gidToUnicode(Array[Byte](1, 2, 3)).isEmpty)
    assert(TrueTypeCmap.gidToUnicode("not a font at all, just text padding"
      .getBytes("US-ASCII")).isEmpty)
    val good = TrueTypeCmap.synthesizeFont(Seq('a', 'b'))
    // truncate at every point: None or a throw-free partial result
    for (cut <- 1 until good.length)
      TrueTypeCmap.gidToUnicode(java.util.Arrays.copyOf(good, cut))
    // directory says cmap is beyond EOF
    val bad = good.clone()
    bad(20) = 0x7f // cmap offset high byte
    assert(TrueTypeCmap.gidToUnicode(bad).isEmpty)
  }

  test("Identity-H + FontFile2 PDF recovers its text end-to-end") {
    val text = "Urteil Nr. 42 der II. Kammer: Beschwerde abgewiesen, äöü."
    val pdf = PdfText.synthesizeCidTrueType(text)
    assert(PdfText.extract(pdf) == text)
  }

  test("non-Identity CIDToGIDMap disables the tier (CID != GID premise)") {
    val text = "Kammer"
    val pdf = new String(PdfText.synthesizeCidTrueType(text),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/CIDToGIDMap /Identity", "/CIDToGIDMap 9 0 R ")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(pdf) == null, "mapping-stream CIDToGIDMap must quarantine")
  }

  test("no font program still quarantines (terminal class unchanged)") {
    assert(PdfText.extract(
      PdfText.synthesizeHostile("identity-h-no-tounicode", "x")) == null)
  }

  test("mixed fonts: /Tf scoping decodes each string under ITS font") {
    // the fixture chooses CID codes that COLLIDE with the simple
    // string's Latin-1 byte pairs — the legacy merged-map heuristic
    // would decode the simple string as CID garbage; per-font scoping
    // must keep both strings intact
    val simple = "Einfache Schrift"
    val cid = "CID Schrift läuft."
    val out = PdfText.extract(PdfText.synthesizeMixedFonts(simple, cid))
    assert(out != null)
    assert(out.contains(simple), s"simple-font string corrupted: $out")
    assert(out.contains(cid), s"CID string corrupted: $out")
  }

  test("ObjStm-packed font dicts resolve for scoping (PDF-1.5 shape)") {
    // move BOTH font dicts into a real pairs-header ObjStm: without
    // §7.5.7 parsing the simple font would be unresolvable and the
    // collision below would corrupt it through the merged map
    val simple = "Einfache Schrift"
    val cid = "CID Schrift läuft."
    var doc = new String(PdfText.synthesizeMixedFonts(simple, cid),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val simpleFont = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    val cidFontRe = """(?s)5 0 obj (<< /Type /Font /Subtype /Type0.*?>>) endobj\n""".r
    val cidFont = cidFontRe.findFirstMatchIn(doc).get.group(1)
    doc = doc.replace(s"9 0 obj $simpleFont endobj\n", "")
    doc = cidFontRe.replaceFirstIn(doc, "")
    assert(!doc.contains("/Type0"))
    val objects = simpleFont + " " + cidFont
    val header = s"9 0 5 ${simpleFont.length + 1} "
    val body = (header + objects).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val objStm = (s"12 0 obj << /Type /ObjStm /N 2 /First ${header.length}" +
      s" /Length ${body.length} >>\nstream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ body ++
      "\nendstream\nendobj\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val bytes = doc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ objStm
    val out = PdfText.extract(bytes)
    assert(out != null)
    assert(out.contains(simple), s"simple-font string corrupted: $out")
    assert(out.contains(cid), s"CID string corrupted: $out")
  }

  test("scoping survives an unresolvable font name (legacy fallback)") {
    // strip the /Resources dict: names resolve to nothing, the legacy
    // merged-map path takes over, and the ToUnicode'd CID text still
    // decodes (the pre-scoping behavior, byte for byte)
    val text = "Beschwerde gutgeheissen"
    val pdf = new String(PdfText.synthesizeCid(text),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace(" /Resources << /Font << /F1 5 0 R >> >>", "")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(pdf) == text)
  }
}
