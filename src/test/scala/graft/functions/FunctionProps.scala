package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the pure function layer. */
object FunctionProps extends Properties("TextFunctions") {

  private val text = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)), Gen.oneOf(" ", "\t", "\n", "_", "-")))
    .map(_.mkString)

  property("cleanText is idempotent") = forAll(text) { s =>
    val once = TextFunctions.cleanText(s)
    TextFunctions.cleanText(once) == once
  }

  property("cleanText output has no doubled whitespace") = forAll(text) { s =>
    val c = TextFunctions.cleanText(s)
    !c.contains("  ") && !c.contains("\t")
  }

  property("simhash is token-order invariant") =
    forAll(Gen.listOf(Gen.identifier.map(_.take(6)))) { tokens =>
      TextFunctions.simhash64(tokens) ==
        TextFunctions.simhash64(scala.util.Random.javaRandomToRandom(
          new java.util.Random(42)).shuffle(tokens))
    }

  property("roman round-trips") = forAll(Gen.choose(1, 3999)) { n =>
    TextFunctions.romanToInt(TextFunctions.intToRoman(n)) == n
  }

  property("uuid3 is RFC-shaped for any name") = forAll(text) { s =>
    val u = Uuid3.compute(s)
    u.length == 36 && u.charAt(14) == '3' && "89ab".contains(u.charAt(19))
  }

  property("hammingDistance is a metric on simhashes") =
    forAll(Gen.listOf(Gen.identifier), Gen.listOf(Gen.identifier)) { (a, b) =>
      val (ha, hb) = (TextFunctions.simhash64(a), TextFunctions.simhash64(b))
      val d = TextFunctions.hammingDistance(ha, hb)
      d >= 0 && d <= 64 && (d == 0) == (ha == hb) &&
        TextFunctions.hammingDistance(hb, ha) == d
    }

  property("truncateParagraphs never exceeds input and is prefix-stable") =
    forAll(Gen.listOf(Gen.identifier.map(_.take(5))), Gen.choose(0, 50)) { (words, budget) =>
      val textIn = words.grouped(3).map(_.mkString(" ")).mkString("\n")
      val out = TextFunctions.truncateParagraphs(textIn, budget)
      textIn.startsWith(out)
    }
}
