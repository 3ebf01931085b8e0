package graft.sources

/** Minimal native PDF text extraction (S3,
  * `text_to_database.py:256-287` — the reference shells into Tika with
  * a 300 s timeout and NUL stripping).
  *
  * The sandbox carries no Tika artifact, but the common-case PDF —
  * uncompressed or FlateDecode content streams showing text with
  * Tj / TJ / ' / " operators — needs nothing beyond the JDK:
  * `java.util.zip.Inflater` decompresses the streams and a small
  * tokenizer reads the string operands (with PDF escape and octal
  * forms). This unblocks the ingest path end-to-end; Tika remains the
  * drop-in upgrade for encrypted/CID-font documents (same
  * `bytes → text` UDF slot, `Ingest.pdfTextUdf`).
  *
  * Semantics preserved from the reference: extracted text is
  * NUL-stripped; failures yield null (quarantine channel) rather than
  * throwing. Line structure: each BT…ET block contributes its text
  * chunks space-joined, one line per block — the paragraph splitter
  * downstream works on blank-line structure exactly as with Tika
  * output.
  */
object PdfText {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Inflate a FlateDecode stream; None on corrupt data. */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return Some(out.toByteArray) // stalled
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Throwable => None }

  /** (dict, streamBytes) pairs found by a linear scan — no xref walk,
    * so damaged files still yield their readable streams (Tika is
    * similarly lenient).
    */
  private def streams(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val hay = new String(bytes, Latin1)
    val out = Vector.newBuilder[(String, Array[Byte])]
    var from = 0
    while ({
      val at = hay.indexOf("stream", from)
      if (at < 0) false
      // the "stream" inside an "endstream" token is not a stream start
      else if (at >= 3 && hay.regionMatches(at - 3, "end", 0, 3)) {
        from = at + 6
        true
      }
      else {
        // dict = text between the enclosing << ... >> just before
        val dictEnd = at
        val dictStart = hay.lastIndexOf("<<", at)
        val dict =
          if (dictStart >= 0) hay.substring(dictStart, dictEnd) else ""
        // stream data starts after "stream" + EOL
        var s = at + "stream".length
        if (s < hay.length && hay.charAt(s) == '\r') s += 1
        if (s < hay.length && hay.charAt(s) == '\n') s += 1
        val e = hay.indexOf("endstream", s)
        if (e > s) {
          out += ((dict, java.util.Arrays.copyOfRange(bytes, s, e)))
          from = e + 1
        } else from = at + 6
        true
      }
    }) ()
    out.result()
  }

  /** Decode one PDF literal string starting at `i` (positioned on the
    * opening paren); returns (decoded, index after closing paren).
    */
  private def literalString(s: String, i: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var j = i + 1
    while (j < s.length && depth > 0) {
      val c = s.charAt(j)
      if (c == '\\' && j + 1 < s.length) {
        val n = s.charAt(j + 1)
        n match {
          case 'n' => sb.append('\n'); j += 2
          case 'r' => sb.append('\r'); j += 2
          case 't' => sb.append('\t'); j += 2
          case 'b' | 'f' => j += 2
          case '(' => sb.append('('); j += 2
          case ')' => sb.append(')'); j += 2
          case '\\' => sb.append('\\'); j += 2
          case d if d >= '0' && d <= '7' =>
            var k = j + 1; var v = 0; var cnt = 0
            while (k < s.length && cnt < 3 &&
              s.charAt(k) >= '0' && s.charAt(k) <= '7') {
              v = v * 8 + (s.charAt(k) - '0'); k += 1; cnt += 1
            }
            sb.append(v.toChar); j = k
          case '\n' => j += 2 // line continuation
          // unknown escape: the backslash is dropped, the char kept
          // (PDF 32000-1 §7.3.4.2)
          case other => sb.append(other); j += 2
        }
      } else {
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) { j += 1 } }
        if (depth > 0) { sb.append(c); j += 1 }
      }
    }
    (sb.toString, j)
  }

  /** Block terminator scan that honors string literals — "ET" inside a
    * `(…)` operand must not end the block (found by the round-trip
    * property test: any shown text containing "ET" was truncated).
    */
  private def findBlockEnd(content: String, from: Int): Int = {
    var j = from
    while (j < content.length - 1) {
      content.charAt(j) match {
        case '(' => j = literalString(content, j)._2
        case 'E' if content.charAt(j + 1) == 'T' => return j
        case _ => j += 1
      }
    }
    -1
  }

  /** Text chunks of one content stream: BT…ET blocks, string operands
    * of Tj / ' / " and TJ arrays, block per line.
    */
  private def contentText(content: String): Seq[String] = {
    val lines = Vector.newBuilder[String]
    var i = 0
    while ({ val bt = content.indexOf("BT", i); bt >= 0 && {
      val et = findBlockEnd(content, bt + 2)
      val block = if (et > bt) content.substring(bt + 2, et)
                  else content.substring(bt + 2)
      val parts = Vector.newBuilder[String]
      var j = 0
      while (j < block.length) {
        block.charAt(j) match {
          case '(' =>
            val (str, nj) = literalString(block, j)
            parts += str
            j = nj
          // hex string <48656C6C6F>; << starts a dict, not a string
          case '<' if j + 1 < block.length && block.charAt(j + 1) != '<' =>
            val e = block.indexOf('>', j)
            if (e < 0) j = block.length
            else {
              val hexs = block.substring(j + 1, e).replaceAll("\\s+", "")
              val padded = if (hexs.length % 2 == 1) hexs + "0" else hexs
              try {
                val sb = new StringBuilder
                var h = 0
                while (h < padded.length) {
                  sb.append(Integer.parseInt(padded.substring(h, h + 2), 16).toChar)
                  h += 2
                }
                parts += sb.toString
              } catch { case _: NumberFormatException => () }
              j = e + 1
            }
          case '<' => j += 2 // dict open
          case '%' => // comment to EOL
            val nl = block.indexOf('\n', j)
            j = if (nl < 0) block.length else nl + 1
          case _ => j += 1
        }
      }
      val text = parts.result().mkString(" ").replaceAll("\\s+", " ").trim
      if (text.nonEmpty) lines += text
      i = if (et > bt) et + 2 else block.length + bt + 2
      true
    } }) ()
    lines.result()
  }

  /** Minimal single-page PDF writer — the extractor's inverse, used by
    * the gated round-trip query and as a fixture builder. `flate`
    * compresses the content stream (Deflater), exercising the
    * FlateDecode read path.
    */
  def synthesize(text: String, flate: Boolean): Array[Byte] = {
    val escaped = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val contents = s"BT /F1 12 Tf 72 720 Td ($escaped) Tj ET"
    val content: Array[Byte] =
      if (!flate) contents.getBytes(Latin1)
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(contents.getBytes(Latin1)); d.finish()
        val buf = new Array[Byte](contents.length * 2 + 64)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      }
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val head = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length}$filter >>\nstream\n").getBytes(Latin1)
    val tail = "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n".getBytes(Latin1)
    head ++ content ++ tail
  }

  /** bytes → extracted text (NUL-stripped), or null when nothing
    * decodable was found (the reference's skip-and-log path).
    */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 8) return null
    try {
      val texts = streams(bytes).flatMap { case (dict, data) =>
        val raw =
          if (dict.contains("FlateDecode")) inflate(data).getOrElse(Array.empty)
          else data
        if (raw.isEmpty) Nil
        else {
          val s = new String(raw, Latin1)
          if (s.contains("BT")) contentText(s) else Nil
        }
      }
      if (texts.isEmpty) null
      else texts.mkString("\n").replace("\u0000", "")
    } catch { case _: Throwable => null }
  }
}
