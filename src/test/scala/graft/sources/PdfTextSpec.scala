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
      "Das Bundesgericht zieht in Erwaegung\n\ndass die Beschwerde rechtzeitig erfolgte.")
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
      "Erster Teil des Urteils.\n\nZweiter Teil des Urteils.")
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

  // ---- round-3 filter tiers: ASCIIHex, LZW, RunLength, chains,
  // nested DecodeParms, xref-stream tolerance

  test("every synthesize filter round-trips through extract") {
    // Latin-1-safe text: the minimal writer encodes operands as raw
    // Latin-1 bytes (no font cmap), like simple real-world PDFs
    val text = "Urteil Nr. 7 (rechtskräftig) - Art. 42 Abs. 1"
    for (filters <- Seq(
      Seq.empty[String],
      Seq("FlateDecode"),
      Seq("ASCIIHexDecode"),
      Seq("LZWDecode"),
      Seq("RunLengthDecode"),
      Seq("ASCIIHexDecode", "FlateDecode"),
      Seq("ASCIIHexDecode", "LZWDecode"),
      Seq("RunLengthDecode", "FlateDecode")))
      assert(PdfText.extract(PdfText.synthesize(text, filters)) == text,
        s"filters=$filters")
  }

  test("LZW round-trips past the 9->10 bit width boundary") {
    // >300 distinct pair-codes force a width change mid-stream; the
    // encoder must bump width on the DECODER's early-change schedule
    val sb = new StringBuilder
    var i = 0
    while (i < 4000) { sb.append((33 + (i * 37) % 90).toChar); i += 1 }
    val data = sb.toString.getBytes(ISO_8859_1)
    val dec = PdfText.lzwDecode(PdfText.lzwEncode(data))
    assert(dec.isDefined && java.util.Arrays.equals(dec.get, data))
  }

  test("runlength decoder handles repeat runs and EOD") {
    // 130 => repeat next byte 127 times; 0 => copy 1 byte; 128 => EOD
    val enc = Array[Byte](130.toByte, 'a'.toByte, 0, 'b'.toByte, 128.toByte, 99)
    val dec = PdfText.runLengthDecode(enc).get
    assert(new String(dec, ISO_8859_1) == "a" * 127 + "b")
  }

  test("asciihex decoder pads odd nibble and stops at '>'") {
    assert(new String(PdfText.asciiHexDecode("48 49>garbage".getBytes(ISO_8859_1)).get,
      ISO_8859_1) == "HI")
    // odd count: '7' pads to 0x70 = 'p'
    assert(new String(PdfText.asciiHexDecode("48 49 7>".getBytes(ISO_8859_1)).get,
      ISO_8859_1) == "HIp")
    assert(PdfText.asciiHexDecode("zz".getBytes(ISO_8859_1)).isEmpty)
  }

  test("nested DecodeParms sub-dict does not hide the filter (ADVICE regression)") {
    // the old lastIndexOf("<<") captured only the inner dict and missed
    // /Filter, silently dropping the stream's text
    val src = "BT (Mit Parms.) Tj ET".getBytes(ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(src); d.finish()
    val buf = new Array[Byte](8192)
    val n = d.deflate(buf); d.end()
    val flate = java.util.Arrays.copyOf(buf, n)
    val bytes = ("%PDF-1.4\n4 0 obj << /Length " + n +
      " /Filter /FlateDecode /DecodeParms << /Predictor 1 /Columns 1 >> >>\nstream\n")
      .getBytes(ISO_8859_1) ++ flate ++
      "\nendstream\nendobj\n%%EOF\n".getBytes(ISO_8859_1)
    assert(PdfText.extract(bytes) == "Mit Parms.")
  }

  test("filter chains parse from single names and arrays") {
    assert(PdfText.filtersOf("<< /Length 10 >>").isEmpty)
    assert(PdfText.filtersOf("<< /Filter /FlateDecode >>") == Seq("FlateDecode"))
    assert(PdfText.filtersOf("<< /Filter [/ASCIIHexDecode /FlateDecode] /Length 3 >>") ==
      Seq("ASCIIHexDecode", "FlateDecode"))
  }

  // ---- round-3 Tika-gap tiers: standard-handler encryption + CID fonts

  test("encrypted PDFs round-trip through every supported mode") {
    val text = "Vertrauliches Urteil Nr. 9 (rechtskräftig)"
    for (mode <- Seq("rc4-40", "rc4-128", "aes-128", "aes-256"))
      assert(PdfText.extract(PdfText.synthesizeEncrypted(text, mode)) == text,
        s"mode=$mode")
  }

  test("hash2B matches the 64-round floor and is deterministic") {
    // no public test vectors ship offline; pin determinism + shape so a
    // derivation regression (round rule, digest switch) changes output
    val a = PdfText.hash2B(Array.empty, Array.fill(8)(1.toByte), Array.empty)
    val b = PdfText.hash2B(Array.empty, Array.fill(8)(1.toByte), Array.empty)
    assert(a.length == 32 && a.sameElements(b))
    val c = PdfText.hash2B(Array.empty, Array.fill(8)(2.toByte), Array.empty)
    assert(!a.sameElements(c))
  }

  test("an R6 dict the empty password cannot open quarantines, never garbage") {
    val bytes = PdfText.synthesizeEncrypted("geheim", "aes-256")
    val s = new String(bytes, ISO_8859_1)
    // corrupt the /U validation hash: wrong-password case → clean null
    val uHex = """/U <([0-9a-f]+)>""".r.findFirstMatchIn(s).get.group(1)
    val flipped = (Integer.parseInt(uHex.take(2), 16) ^ 0xff).toHexString
      .reverse.padTo(2, '0').reverse.mkString
    assert(PdfText.extract(s.replace(s"/U <$uHex>",
      s"/U <$flipped${uHex.drop(2)}>").getBytes(ISO_8859_1)) == null)
    // an R6 dict with NO /UE (undecryptable) → clean null
    val noUe = """/UE <[0-9a-f]+>""".r.replaceAllIn(s, "")
    assert(PdfText.extract(noUe.getBytes(ISO_8859_1)) == null)
  }

  test("rc4 is its own inverse and matches a known vector") {
    val key = "Key".getBytes(ISO_8859_1)
    val enc = PdfText.rc4(key, "Plaintext".getBytes(ISO_8859_1))
    // RFC 6229-adjacent known vector for RC4("Key", "Plaintext")
    assert(enc.map(b => f"${b & 0xff}%02x").mkString == "bbf316e8d940af0ad3")
    assert(new String(PdfText.rc4(key, enc), ISO_8859_1) == "Plaintext")
  }

  test("an unsupported security handler degrades to null, not a crash") {
    val bytes = PdfText.synthesizeEncrypted("geheim", "rc4-40")
    val tampered = new String(bytes, ISO_8859_1)
      .replace("/Filter /Standard", "/Filter /CustomCrypt")
    assert(PdfText.extract(tampered.getBytes(ISO_8859_1)) == null)
  }

  test("CID/Type0 text resolves through the ToUnicode CMap, full unicode") {
    val text = "Učinok – žaloba № 7 ÄÖÜ"
    assert(PdfText.extract(PdfText.synthesizeCid(text)) == text)
  }

  test("a Type0 font declared inside a compressed ObjStm still enables CID decoding") {
    // PDF-1.5 shape: the font dict lives in a Flate-compressed object
    // stream, so the raw bytes contain no /Type0 marker
    val text = "Ümlaut"
    val base = PdfText.synthesizeCid(text)
    var doc = new String(base, ISO_8859_1)
    val fontObj = "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /F1" +
      " /Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n"
    assert(doc.contains(fontObj))
    doc = doc.replace(fontObj, "")
    assert(!doc.contains("/Type0"))
    val inner = fontObj.getBytes(ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(inner); d.finish()
    val buf = new Array[Byte](8192)
    val n = d.deflate(buf); d.end()
    val objStm = (s"7 0 obj << /Type /ObjStm /N 1 /First 0 /Length $n" +
      " /Filter /FlateDecode >>\nstream\n").getBytes(ISO_8859_1) ++
      java.util.Arrays.copyOf(buf, n) ++
      "\nendstream\nendobj\n".getBytes(ISO_8859_1)
    val bytes = doc.getBytes(ISO_8859_1) ++ objStm
    assert(PdfText.extract(bytes) == text)
  }

  test("bfrange entries expand to consecutive codes") {
    val m = PdfText.parseToUnicode(
      """begincmap
        |1 beginbfrange
        |<0010> <0012> <0041>
        |endbfrange
        |1 beginbfchar
        |<0001> <00e4>
        |endbfchar
        |endcmap""".stripMargin)
    assert(m(0x10) == "A" && m(0x11) == "B" && m(0x12) == "C")
    assert(m(1) == "ä")
  }

  test("bfrange ARRAY destinations map one explicit target per code") {
    // §9.10.3 second form: [<d0> <d1> …] — including a multi-char
    // (ligature) destination; a continuous range after it must still
    // parse and the array's first element must not leak into it
    val m = PdfText.parseToUnicode(
      """begincmap
        |2 beginbfrange
        |<0020> <0022> [<0058> <00660066> <005A>]
        |<0030> <0031> <0041>
        |endbfrange
        |endcmap""".stripMargin)
    assert(m(0x20) == "X" && m(0x21) == "ff" && m(0x22) == "Z")
    assert(m(0x30) == "A" && m(0x31) == "B")
    assert(!m.contains(0x23))
  }

  test("hex strings without a resolving cmap stay single-byte latin-1") {
    // the Gruezi fixture has no ToUnicode stream: 2-byte interpretation
    // must NOT kick in
    val bytes = pdf("BT <4772 7565 7A69> Tj ET", flate = false)
    assert(PdfText.extract(bytes) == "Gruezi")
  }

  test("FlateDecode with a PNG Up predictor (12) decodes content text") {
    val content = "BT (Mit Praediktor kodiert.) Tj ET".padTo(48, ' ')
    val raw = content.getBytes(ISO_8859_1)
    val cols = 16
    // PNG-predictor-encode: rows of `cols` bytes, filter byte 2 (Up),
    // each byte stored as delta against the previous row
    val rows = raw.grouped(cols).toArray
    val enc = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](cols)
    for (row <- rows) {
      enc.write(2)
      for (i <- row.indices) enc.write((row(i) - prev(i)) & 0xff)
      prev = row
    }
    val d = new java.util.zip.Deflater()
    d.setInput(enc.toByteArray); d.finish()
    val buf = new Array[Byte](8192)
    val n = d.deflate(buf); d.end()
    val flate = java.util.Arrays.copyOf(buf, n)
    val bytes = (s"%PDF-1.4\n4 0 obj << /Length $n /Filter /FlateDecode" +
      s" /DecodeParms << /Predictor 12 /Columns $cols >> >>\nstream\n")
      .getBytes(ISO_8859_1) ++ flate ++
      "\nendstream\nendobj\n%%EOF\n".getBytes(ISO_8859_1)
    assert(PdfText.extract(bytes) == "Mit Praediktor kodiert.")
  }

  test("pngUnpredict handles Sub, Average and Paeth rows") {
    // round-trip a known byte block through each filter type by
    // encoding with the filter's definition and decoding back
    val colsN = 4
    val data = Array.tabulate(16)(i => ((i * 37 + 11) % 251).toByte)
    def encodeWith(ft: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var prev = new Array[Byte](colsN)
      for (row <- data.grouped(colsN)) {
        out.write(ft)
        for (i <- row.indices) {
          val a = if (i >= 1) row(i - 1) & 0xff else 0
          val b = prev(i) & 0xff
          val c = if (i >= 1) prev(i - 1) & 0xff else 0
          val pred = ft match {
            case 1 => a
            case 3 => (a + b) / 2
            case 4 =>
              val p = a + b - c
              val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          }
          out.write((row(i) - pred) & 0xff)
        }
        prev = row
      }
      out.toByteArray
    }
    for (ft <- Seq(1, 3, 4)) {
      val dec = PdfText.pngUnpredict(encodeWith(ft), 1, 8, colsN)
      assert(dec.isDefined && java.util.Arrays.equals(dec.get, data), s"filter $ft")
    }
  }

  test("a damaged (wrong) /Length does not truncate the stream") {
    // declared length 5 is inconsistent with the data before
    // 'endstream' — the scanner must fall back to EOL-trim and keep
    // the full text (real corpora contain length-corrupted files)
    val content = "BT (Ganzer Satz bleibt erhalten.) Tj ET"
    val bytes = ("%PDF-1.4\n4 0 obj << /Length 5 >>\nstream\n" + content +
      "\nendstream\nendobj\n%%EOF\n").getBytes(ISO_8859_1)
    assert(PdfText.extract(bytes) == "Ganzer Satz bleibt erhalten.")
  }

  test("xref and image streams are skipped, not scanned for stray BT") {
    // an uncompressed '/Type /XRef' stream whose binary happens to
    // contain 'BT (x) Tj' must contribute nothing
    val fake = "junkBT (nicht Text) Tj ET".getBytes(ISO_8859_1)
    val bytes = ("%PDF-1.5\n7 0 obj << /Type /XRef /Length " + fake.length +
      " >>\nstream\n").getBytes(ISO_8859_1) ++ fake ++
      "\nendstream\nendobj\n".getBytes(ISO_8859_1) ++
      pdf("BT (Echter Inhalt.) Tj ET", flate = false)
    assert(PdfText.extract(bytes) == "Echter Inhalt.")
  }
  test("indirect /Length ref is never honored, even with EOL-like tail bytes") {
    // '/Length 70 0 R': the old regex backtracked to capture '7' (the
    // ref-lookahead then passed); with 7 data bytes followed by only
    // newlines before 'endstream', the EOL-consistency guard would
    // accept the bogus length and truncate. The anchored capture
    // ((?![0-9])) must refuse the partial number outright.
    val bytes = ("%PDF-1.4\n5 0 obj << /Length 70 0 R >>\nstream\n" +
      "AAAAAAA\n\n\nendstream\nendobj\n%%EOF\n").getBytes(ISO_8859_1)
    val st = PdfText.streams(bytes)
    assert(st.length == 1)
    // EOL-trim fallback strips ONE trailing newline, not down to 7 bytes
    assert(st.head.data.length == 9, new String(st.head.data, ISO_8859_1))
  }

  test("owning object resolves across more than 64 bytes before the dict") {
    // header separated from '<<' by 100 bytes of whitespace: the old
    // fixed 64-byte window resolved this to (0,0) and derived a wrong
    // per-object decryption key (ADVICE r3)
    val pad = " " * 100
    val bytes = ("%PDF-1.4\n12 3 obj" + pad + "<< /Length 4 >>\nstream\n" +
      "DATA\nendstream\nendobj\n%%EOF\n").getBytes(ISO_8859_1)
    val st = PdfText.streams(bytes)
    assert(st.length == 1)
    assert((st.head.obj, st.head.gen) == (12, 3))
  }

  test("owningObject: intervening endobj detaches the stream") {
    val hay = "1 0 obj << /x 1 >> endobj junk << /Length 4 >>"
    assert(PdfText.owningObject(hay, hay.indexOf("<< /Length")) == (0, 0))
    val hay2 = "7 0 obj\n% comment line\n<< /Length 4 >>"
    assert(PdfText.owningObject(hay2, hay2.indexOf("<<")) == (7, 0))
  }

  test("image XObjects: embedded JPEG round-trips; hostile scans yield Nil") {
    val jpeg = graft.multimodal.MediaPipeline.synthesizeImage(5L) // %4==1 -> jpeg
    val w = (16 + 5 % 48); val h = (12 + 5 % 36)
    val pdf = PdfText.synthesizeWithImage("Scan 5", jpeg, w, h)
    // text layer untouched
    assert(PdfText.extract(pdf) == "Scan 5")
    val imgs = PdfText.imageXObjects(pdf)
    assert(imgs.length == 1)
    val (dw, dh, payload) = imgs.head
    assert(dw == w && dh == h)
    assert(payload.sameElements(jpeg), "the /DCTDecode stream is the raw JPEG bytes")
    // hostile: no image, junk bytes, truncated payload
    assert(PdfText.imageXObjects(PdfText.synthesize("kein Bild", Seq("FlateDecode"))).isEmpty)
    assert(PdfText.imageXObjects(Array.tabulate(64)(i => (i * 37).toByte)).isEmpty)
    val cut = java.util.Arrays.copyOf(pdf, pdf.length - jpeg.length / 2)
    assert(PdfText.imageXObjects(cut).isEmpty, "amputated payload must not surface")
  }
}
