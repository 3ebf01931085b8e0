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
    // 'Bundes' + '##gericht', never 'B'+'##u'+... — longest-first
    assert(encodeWord("Bundesgericht", bundled) == Seq("Bundes", "##gericht"))
    assert(encodeWord("Urteile", bundled) == Seq("Urteil", "##e"))
    assert(encodeWord("Kantons", bundled) == Seq("Kanton", "##s"))
  }

  test("char-level fallback uses ## continuations") {
    assert(encodeWord("unbekannt", bundled) ==
      Seq("u", "##n", "##b", "##e", "##k", "##a", "##n", "##n", "##t"))
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
      Seq("Das", "Bundes", "##gericht", "weist", "die", "Beschwerde", "ab", "."))
    assert(countWithSpecials(text, bundled) == 10)
  }

  test("TokenCounter tier plugs into the same slot as BPE") {
    assert(TokenCounter.BundledWordPiece.count("Urteile des Kantons Zürich") == 6)
    assert(TokenCounter.BundledWordPiece.tokens("") == Seq.empty)
  }
}
