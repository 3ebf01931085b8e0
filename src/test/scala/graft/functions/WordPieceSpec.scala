package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** WordPiece tier (F34): greedy longest-match semantics against the
  * bundled vocab, plus the BasicTokenizer stage — pinned to the
  * BERT-tokenizer behavior the reference counts with
  * (`abstract_preprocessor.py:286-288`).
  */
class WordPieceSpec extends AnyFunSuite {
  import WordPiece._

  test("basic tokenization splits punctuation off as its own tokens") {
    assert(basicTokens("ab. (cd)!") == Seq("ab", ".", "(", "cd", ")", "!"))
    assert(basicTokens("  a\t b\nc ") == Seq("a", "b", "c"))
    assert(basicTokens(null).isEmpty)
  }

  test("greedy longest match wins over shorter prefixes") {
    // the full compound beats its own prefixes ('Bundes', 'B', ...)
    assert(encodeWord("Bundesgericht", bundled) == Seq("Bundesgericht"))
    // an inflected form not in the vocab takes the LONGEST stem + ##s,
    // never 'Zivil'+'##gericht'+'##s' or a char walk
    assert(encodeWord("Zivilgerichts", bundled) == Seq("Zivilgericht", "##s"))
    assert(encodeWord("Kantons", bundled) == Seq("Kanton", "##s"))
  }

  test("char-level fallback uses ## continuations") {
    assert(encodeWord("qqq", bundled) == Seq("q", "##q", "##q"))
    // a known prefix word + char continuations for the unknown tail
    assert(encodeWord("unbekannt", bundled) ==
      Seq("un", "##b", "##e", "##k", "##a", "##n", "##n", "##t"))
  }

  test("no match at any position makes the WHOLE word [UNK]") {
    // 'Œ' is not in the vocab — partial pieces must not leak
    assert(encodeWord("Œuvre", bundled) == Seq(Unk))
    // a word over the 100-char cap is [UNK] outright
    assert(encodeWord("a" * 101, bundled) == Seq(Unk))
  }

  test("countWithSpecials adds the [CLS]/[SEP] pair like len(input_ids)") {
    val text = "Das Bundesgericht weist die Beschwerde ab."
    assert(tokenize(text, bundled) ==
      Seq("Das", "Bundesgericht", "weist", "die", "Beschwerde", "ab", "."))
    assert(countWithSpecials(text, bundled) == 9)
  }

  test("TokenCounter tier plugs into the same slot as BPE") {
    assert(TokenCounter.BundledWordPiece.count("Urteile des Kantons Zürich") == 5)
    assert(TokenCounter.BundledWordPiece.tokens("") == Seq.empty)
  }

  test("bundled vocab is realistic-scale (the reference's BERT family)") {
    // abstract_preprocessor.py:304-310 loads ~30k-entry cased vocabs;
    // the bundled slot carries that scale so t16/r8/r9 and the
    // throughput probe measure real greedy-matching work
    assert(bundled.size > 30000)
    assert(Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]").forall(bundled))
  }
}
