package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The merge-table BPE tier (F34): the GPT-2 bpe() loop against
  * hand-derived expectations, the trainer's determinism, and the
  * train→encode roundtrip.
  */
class BpeSpec extends AnyFunSuite {

  val m = Bpe.bundled

  test("bundled merges parse with ranks in file order") {
    assert(m.nonEmpty)
    assert(m(("c", "h")) == 0)       // first data line
    assert(m(("ge", "richt")) == 5)
  }

  test("merge loop: fully-merging and stalling words (hand-derived)") {
    assert(Bpe.encode("gericht", m) == Seq("gericht"))
    assert(Bpe.encode("urteil", m) == Seq("urteil"))
    assert(Bpe.encode("bericht", m) == Seq("b", "e", "richt"))
    assert(Bpe.encode("recht", m) == Seq("r", "e", "cht"))
    assert(Bpe.encode("oder", m) == Seq("o", "d", "er"))
    assert(Bpe.encode("weder", m) == Seq("we", "d", "er"))
    assert(Bpe.encode("noch", m) == Seq("n", "o", "ch"))
  }

  test("malformed merge lines fail loudly; duplicate pairs keep the first rank") {
    // an annotation column must not silently become a dead entry
    intercept[IllegalArgumentException] {
      Bpe.parseMerges(Iterator("a b 42"))
    }
    val dup = Bpe.parseMerges(Iterator("a b", "c d", "a b"))
    assert(dup(("a", "b")) == 0)
  }

  test("lowest rank wins over textual order") {
    // in 'weder' the pair (w,e) appears first but (e,r) has lower rank
    // and must merge first — then (w,e) becomes mergeable
    assert(Bpe.encode("weder", m).head == "we")
  }

  test("tokenize pretokenizes, strips space markers, never merges across words") {
    assert(Bpe.tokenize("das gericht", m) == Seq("d", "a", "s", "gericht"))
    assert(Bpe.tokenize("weder gericht noch urteil", m) ==
      Seq("we", "d", "er", "gericht", "n", "o", "ch", "urteil"))
    assert(Bpe.tokenize("", m).isEmpty)
    assert(Bpe.tokenize(null, m).isEmpty)
  }

  test("edge: single char, unknown alphabet, numbers/punct pretokens") {
    assert(Bpe.encode("x", m) == Seq("x"))
    assert(Bpe.encode("", m).isEmpty)
    assert(Bpe.tokenize("v2.0!", m) == Seq("v", "2", ".", "0", "!"))
  }

  test("trainer is deterministic and learns the corpus' frequent pairs first") {
    val corpus = Seq.fill(10)("gericht") ++ Seq.fill(5)("bericht") ++ Seq.fill(2)("recht")
    val a = Bpe.train(corpus, 6)
    val b = Bpe.train(corpus, 6)
    assert(a == b)
    // every word ends in c-h-t → (c,h) count 17 dominates round 1,
    // then (ch,t) 17 dominates round 2
    assert(a.head == ("c", "h"))
    assert(a(1) == ("ch", "t"))
  }

  test("train→encode roundtrip: enough merges collapse a trained word to one token") {
    val corpus = Seq.fill(20)("beschwerde")
    val learned = Bpe.train(corpus, "beschwerde".length - 1)
    val table = learned.zipWithIndex.toMap
    assert(Bpe.encode("beschwerde", table) == Seq("beschwerde"))
  }

  test("TokenCounter tiers expose the pluggable interface") {
    assert(TokenCounter.Whitespace.count("a b c") == 3)
    assert(TokenCounter.Pretoken.tokens("it's 42!").contains("'s"))
    assert(TokenCounter.BundledBpe.count("das gericht") == 4)
  }
}
