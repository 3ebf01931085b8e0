package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Seed-pinned mutation fuzz over the PDF extractor (VERDICT r4 item
  * 7, the x21 hostile-fuzz discipline applied to S3): random byte
  * mutations over the m3/m4/m5 fixture corpus must uphold the
  * invariant the hostile gate pins — EVERY input yields text-or-null
  * (the §2.9 quarantine channel), never a throw, and never silent
  * corruption of a VALID sibling decoded in the same pass.
  *
  * The sweep is deterministic (fixed seed, fixed mutation schedule) so
  * a failure reproduces exactly; 3 mutation flavors × clean/filter/
  * hostile bases × many offsets ≈ thousands of adversarial inputs.
  */
class PdfFuzzSpec extends AnyFunSuite {

  private val Seed = 0x5CA1AB1EL

  private def bases: Seq[(String, Array[Byte])] = Seq(
    "plain" -> PdfText.synthesize("Urteil bleibt lesbar. Vgl. BGE 120 II 31.", Seq.empty),
    "flate" -> PdfText.synthesize("Die Beschwerde wird abgewiesen.", Seq("FlateDecode")),
    "chain" -> PdfText.synthesize("Chained filters here.",
      Seq("ASCIIHexDecode", "FlateDecode")),
    "lzw" -> PdfText.synthesize("LZW encoded ruling.", Seq("LZWDecode")),
    "cid-ttf" -> PdfText.synthesizeCidTrueType("Eingebettete Schrift."),
    "mixed-fonts" -> PdfText.synthesizeMixedFonts("Einfach AB", "CID läuft"),
    "hostile-len" -> PdfText.synthesizeHostile("wrong-length", "x"),
    "hostile-filter" -> PdfText.synthesizeHostile("bogus-filter", "x"),
    "hostile-trunc" -> PdfText.synthesizeHostile("truncated", "x"),
    "hostile-flate" -> PdfText.synthesizeHostile("corrupt-flate", "x"),
    "hostile-cid" -> PdfText.synthesizeHostile("identity-h-no-tounicode", "x"))

  /** extract() must return text or null — any throw is a finding */
  private def mustNotThrow(label: String, bytes: Array[Byte]): Unit =
    try { PdfText.extract(bytes); () }
    catch { case e: Throwable =>
      fail(s"$label: extract threw ${e.getClass.getName}: ${e.getMessage}")
    }

  test("byte-flip sweep: every mutated fixture yields text-or-null") {
    val rnd = new scala.util.Random(Seed)
    for ((label, base) <- bases) {
      // 80 single-byte flips at random offsets
      for (i <- 0 until 80) {
        val m = base.clone()
        val off = rnd.nextInt(m.length)
        m(off) = (m(off) ^ (1 << rnd.nextInt(8))).toByte
        mustNotThrow(s"$label/flip$i@$off", m)
      }
      // 40 random overwrites of a 1-16 byte window
      for (i <- 0 until 40) {
        val m = base.clone()
        val off = rnd.nextInt(m.length)
        val len = math.min(1 + rnd.nextInt(16), m.length - off)
        for (j <- 0 until len) m(off + j) = rnd.nextInt(256).toByte
        mustNotThrow(s"$label/overwrite$i@$off+$len", m)
      }
      // 20 truncations at random points (incl. mid-dictionary)
      for (i <- 0 until 20) {
        val cut = 1 + rnd.nextInt(base.length - 1)
        mustNotThrow(s"$label/trunc$i@$cut", java.util.Arrays.copyOf(base, cut))
      }
    }
  }

  test("structure-aware mutations: keywords stomped, offsets scrambled") {
    val rnd = new scala.util.Random(Seed * 31)
    val keywords = Seq("/Length", "/Filter", "/Contents", "/Type", "/Pages",
      "stream", "endstream", "obj", "endobj", "xref", "trailer", "/Root")
    for ((label, base) <- bases; kw <- keywords) {
      val s = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
      val at = s.indexOf(kw)
      if (at >= 0) {
        val m = base.clone()
        for (j <- 0 until kw.length) m(at + j) = rnd.nextInt(256).toByte
        mustNotThrow(s"$label/stomp:$kw", m)
      }
    }
    // digit scrambling corrupts object numbers / offsets / lengths
    for ((label, base) <- bases) {
      val m = base.clone()
      for (j <- m.indices if m(j) >= '0' && m(j) <= '9' && rnd.nextBoolean())
        m(j) = ('0' + rnd.nextInt(10)).toByte
      mustNotThrow(s"$label/digits", m)
    }
  }

  test("a hostile neighbor never corrupts a valid sibling's extraction") {
    // the quarantine must be PER-DOCUMENT: decode a valid pdf, then a
    // mutated one, then the valid one again — same text both times
    // (guards against corrupted shared/static decoder state)
    val rnd = new scala.util.Random(Seed * 97)
    val good = PdfText.synthesize("Das Bundesgericht bleibt lesbar.", Seq("FlateDecode"))
    val expected = PdfText.extract(good)
    assert(expected != null && expected.contains("bleibt lesbar"))
    for (i <- 0 until 50) {
      val m = good.clone()
      val off = rnd.nextInt(m.length)
      m(off) = (m(off) ^ 0xFF).toByte
      mustNotThrow(s"sibling/mut$i@$off", m)
      assert(PdfText.extract(good) == expected,
        s"valid sibling corrupted after hostile input $i@$off")
    }
  }
}
