package graft.functions

import java.util.UUID
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  import TextFunctions._

  test("cleanText collapses whitespace and strips controls") {
    assert(cleanText("  a  b\t\tc  ") == "a b c")
    assert(cleanText("foo-\nbar") == "foobar")         // de-hyphenate
    assert(cleanText("ab") == "ab")              // control char
    assert(cleanText("x___y") == "x_y")
    assert(cleanText(null) == null)
  }

  test("cleanText applies NFKC normalization") {
    assert(cleanText("ﬁsh") == "fish")            // ﬁ ligature
    assert(cleanText("①") == "1")                 // circled one
  }

  test("roman numerals known values") {
    assert(intToRoman(1) == "I")
    assert(intToRoman(4) == "IV")
    assert(intToRoman(1994) == "MCMXCIV")
    assert(intToRoman(3999) == "MMMCMXCIX")
    assert(romanToInt("MCMXCIV") == 1994)
    assert(romanToInt("iv") == 4)
  }

  test("roman round-trips over the full domain") {
    (1 to 3999).foreach(n => assert(romanToInt(intToRoman(n)) == n))
  }

  test("uuid5 matches the RFC 4122 reference vector") {
    val dns = UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8")
    assert(uuid5(dns, "python.org").toString ==
      "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  test("decisionId is deterministic and well-formed") {
    val a = decisionId("ZH_VG_001_file.html")
    assert(a == decisionId("ZH_VG_001_file.html"))
    assert(a != decisionId("ZH_VG_001_other.html"))
    val u = UUID.fromString(a)
    assert(u.version == 5)
  }

  test("simhash64: identical token streams collide, similar ones are near") {
    val doc = Seq.tabulate(100)(i => s"tok${i % 20}")
    assert(simhash64(doc) == simhash64(doc))
    val tweaked = doc.updated(3, "changed")
    val dist = hammingDistance(simhash64(doc), simhash64(tweaked))
    assert(dist <= 12, s"near-identical docs should be close, got $dist")
    val other = Seq.tabulate(100)(i => s"zzz${i % 23}")
    val far = hammingDistance(simhash64(doc), simhash64(other))
    assert(far > dist, "unrelated doc should be farther than a tweaked one")
  }

  test("md5Long is stable across calls and inputs") {
    assert(md5Long("abc") == md5Long("abc"))
    assert(md5Long("abc") != md5Long("abd"))
    // first 8 bytes of md5('abc') = 900150983cd24fb0
    assert(md5Long("abc") == java.lang.Long.parseUnsignedLong("900150983cd24fb0", 16))
  }
}
