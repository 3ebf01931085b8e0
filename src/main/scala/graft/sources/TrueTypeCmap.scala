package graft.sources

/** TrueType/OpenType `cmap` table access for CID text recovery.
  *
  * A Type0/Identity-H font with no /ToUnicode CMap shows text as raw
  * glyph ids (CID = GID under Identity-H with the default
  * /CIDToGIDMap). The document itself carries no code→Unicode mapping
  * — but when the font PROGRAM is embedded (/FontFile2, the common
  * case for real court PDFs), the font's own `cmap` table maps Unicode
  * → glyph id, and INVERTING it recovers glyph id → Unicode. This is
  * the same tier Tika/PDFBox use for such documents
  * (`text_to_database.py:256-287` routes them through Tika); without
  * an embedded font program the class stays terminal and quarantines
  * (COVERAGE.md S3 note).
  *
  * Parsing is deliberately LENIENT (no checksum verification, every
  * read bounds-guarded, None on any structural damage — hostile
  * corpora reach this code through `PdfText.extract`, which must never
  * throw): sfnt directory → `cmap` → best Unicode subtable, formats 4
  * (segment delta) and 12 (grouped u32) — the formats real text fonts
  * carry. Inversion keeps the LOWEST codepoint per glyph (a glyph
  * reachable from several codepoints renders one of them; lowest is
  * deterministic).
  */
object TrueTypeCmap {

  /** sfnt magics: 1.0 (TrueType), 'true' (Apple), 'OTTO' (CFF outlines
    * — still carries cmap), 'ttcf' rejected (collections need an outer
    * directory walk; out of scope).
    */
  def looksLikeSfnt(b: Array[Byte]): Boolean =
    b != null && b.length > 12 && {
      val v = u32(b, 0)
      v == 0x00010000L || v == 0x74727565L || v == 0x4F54544FL
    }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def s16(b: Array[Byte], i: Int): Int = u16(b, i).toShort.toInt
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i).toLong << 16) | u16(b, i + 2)

  /** glyph id → Unicode string, or None when the font has no parsable
    * Unicode cmap. Never throws.
    */
  def gidToUnicode(font: Array[Byte]): Option[Map[Int, String]] =
    try {
      if (!looksLikeSfnt(font)) return None
      val numTables = u16(font, 4)
      var cmapOff = -1L
      var cmapLen = -1L
      var t = 0
      while (t < numTables && cmapOff < 0) {
        val rec = 12 + 16 * t
        if (rec + 16 > font.length) return None
        if (new String(font, rec, 4, java.nio.charset.StandardCharsets.US_ASCII) == "cmap") {
          cmapOff = u32(font, rec + 8); cmapLen = u32(font, rec + 12)
        }
        t += 1
      }
      if (cmapOff < 0 || cmapOff + 4 > font.length) return None
      val cm = cmapOff.toInt
      val nSub = u16(font, cm + 2)
      // preference: (3,10) UCS-4 > (3,1) BMP > (0,*) Unicode > anything
      var best = -1L
      var bestScore = -1
      var s = 0
      while (s < nSub) {
        val rec = cm + 4 + 8 * s
        if (rec + 8 > font.length) return None
        val plat = u16(font, rec); val enc = u16(font, rec + 2)
        val off = u32(font, rec + 4)
        val score = (plat, enc) match {
          case (3, 10) => 4
          case (3, 1)  => 3
          case (0, _)  => 2
          case _       => 1
        }
        if (score > bestScore) { bestScore = score; best = cmapOff + off }
        s += 1
      }
      if (best < 0 || best + 2 > font.length) return None
      val sub = best.toInt
      u16(font, sub) match {
        case 4  => parseFormat4(font, sub)
        case 12 => parseFormat12(font, sub)
        case _  => None
      }
    } catch { case _: Throwable => None }

  /** format 4: segmented delta mapping (BMP). */
  private def parseFormat4(b: Array[Byte], off: Int): Option[Map[Int, String]] = {
    val segX2 = u16(b, off + 6)
    val segs = segX2 / 2
    if (segs == 0) return None
    val endAt = off + 14
    val startAt = endAt + segX2 + 2 // + reservedPad
    val deltaAt = startAt + segX2
    val rangeAt = deltaAt + segX2
    if (rangeAt + segX2 > b.length) return None
    val inv = scala.collection.mutable.Map.empty[Int, Int] // gid -> lowest char
    var i = 0
    while (i < segs) {
      val end = u16(b, endAt + 2 * i)
      val start = u16(b, startAt + 2 * i)
      val delta = s16(b, deltaAt + 2 * i)
      val ro = u16(b, rangeAt + 2 * i)
      if (start != 0xFFFF && start <= end && end - start < 0x10000) {
        var c = start
        while (c <= end) {
          val gid =
            if (ro == 0) (c + delta) & 0xFFFF
            else {
              // glyphIdArray lookup relative to THIS idRangeOffset slot
              val at = rangeAt + 2 * i + ro + 2 * (c - start)
              if (at + 2 > b.length) 0
              else {
                val g = u16(b, at)
                if (g == 0) 0 else (g + delta) & 0xFFFF
              }
            }
          if (gid != 0 && !inv.contains(gid)) inv(gid) = c
          c += 1
        }
      }
      i += 1
    }
    if (inv.isEmpty) None
    else Some(inv.iterator
      .map { case (g, c) => g -> new String(Character.toChars(c)) }.toMap)
  }

  /** format 12: sequential u32 groups (full Unicode range). */
  private def parseFormat12(b: Array[Byte], off: Int): Option[Map[Int, String]] = {
    if (off + 16 > b.length) return None
    val nGroups = u32(b, off + 12)
    if (nGroups <= 0 || nGroups > 100000) return None
    val inv = scala.collection.mutable.Map.empty[Int, Int]
    var g = 0
    while (g < nGroups) {
      val rec = off + 16 + 12 * g
      if (rec + 12 > b.length) return None
      val startC = u32(b, rec)
      val endC = u32(b, rec + 4)
      val startG = u32(b, rec + 8)
      if (startC <= endC && endC - startC < 0x10000 && endC <= 0x10FFFF) {
        var c = startC
        while (c <= endC) {
          val gid = (startG + (c - startC)).toInt
          if (gid != 0 && !inv.contains(gid)) inv(gid) = c.toInt
          c += 1
        }
      }
      g += 1
    }
    if (inv.isEmpty) None
    else Some(inv.iterator
      .map { case (gg, c) => gg -> new String(Character.toChars(c)) }.toMap)
  }

  // ---------------------------------------------------------------- synthesis

  /** Minimal TrueType font binary whose format-4 `cmap` maps each of
    * `chars` (sorted, BMP only) to glyph id 1+index — the extractor's
    * inverse for fixture/gate construction, mirroring
    * `PdfText.synthesize`. One segment per char plus the mandatory
    * 0xFFFF terminator; `head` table included for shape realism.
    */
  def synthesizeFont(chars: Seq[Char]): Array[Byte] = {
    val cs = chars.distinct.sorted
    require(cs.nonEmpty && cs.last != 0xFFFF.toChar, "BMP chars required")
    val segs = cs.length + 1
    val bb = java.nio.ByteBuffer.allocate(64 * 1024)
    def pad4(n: Int): Int = (n + 3) & ~3

    // cmap table body
    val cmap = java.nio.ByteBuffer.allocate(16 * 1024)
    cmap.putShort(0); cmap.putShort(1)            // version, one subtable
    cmap.putShort(3); cmap.putShort(1); cmap.putInt(12) // (3,1) at offset 12
    val segX2 = segs * 2
    val length = 16 + 8 * segs
    cmap.putShort(4); cmap.putShort(length.toShort); cmap.putShort(0)
    cmap.putShort(segX2.toShort)
    val sr = Integer.highestOneBit(segs) * 2
    cmap.putShort(sr.toShort)
    cmap.putShort((31 - Integer.numberOfLeadingZeros(sr / 2)).toShort)
    cmap.putShort((segX2 - sr).toShort)
    cs.foreach(c => cmap.putShort(c.toShort)); cmap.putShort(-1) // endCodes + 0xFFFF
    cmap.putShort(0)                                             // reservedPad
    cs.foreach(c => cmap.putShort(c.toShort)); cmap.putShort(-1) // startCodes
    cs.zipWithIndex.foreach { case (c, i) =>                     // idDelta: char→gid i+1
      cmap.putShort(((i + 1 - c.toInt) & 0xFFFF).toShort)
    }
    cmap.putShort(1)                                             // 0xFFFF seg delta
    (0 until segs).foreach(_ => cmap.putShort(0))                // idRangeOffsets
    val cmapBytes = java.util.Arrays.copyOf(cmap.array(), cmap.position())

    // head table (54 bytes; magic 0x5F0F3CF5 at offset 12)
    val head = java.nio.ByteBuffer.allocate(54)
    head.putInt(0x00010000); head.putInt(0)
    head.putInt(0) /* checksumAdjustment */ ; head.putInt(0x5F0F3CF5)
    while (head.position() < 54) head.put(0.toByte)
    val headBytes = head.array()

    // sfnt directory: 2 tables, alphabetical (cmap, head)
    val n = 2
    bb.putInt(0x00010000)
    bb.putShort(n.toShort)
    val sr2 = Integer.highestOneBit(n) * 16
    bb.putShort(sr2.toShort)
    bb.putShort((31 - Integer.numberOfLeadingZeros(sr2 / 16)).toShort)
    bb.putShort((n * 16 - sr2).toShort)
    val cmapOff = 12 + 16 * n
    val headOff = cmapOff + pad4(cmapBytes.length)
    bb.put("cmap".getBytes("US-ASCII")); bb.putInt(0)
    bb.putInt(cmapOff); bb.putInt(cmapBytes.length)
    bb.put("head".getBytes("US-ASCII")); bb.putInt(0)
    bb.putInt(headOff); bb.putInt(headBytes.length)
    bb.put(cmapBytes); while (bb.position() < headOff) bb.put(0.toByte)
    bb.put(headBytes)
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }
}
