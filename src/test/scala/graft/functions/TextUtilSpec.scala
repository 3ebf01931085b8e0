package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextUtilSpec extends AnyFunSuite {
  import TextFunctions._

  test("htmlToText strips tags, scripts and entities") {
    val html = """<html><head><style>p { color: red }</style>
      <script>var x = "<p>";</script></head>
      <body><h1>Titel</h1><p>Ein &amp; zwei&nbsp;drei</p><!-- note --></body></html>"""
    assert(htmlToText(html) == "Titel Ein & zwei drei")
    assert(htmlToText(null) == null)
    assert(htmlToText("plain") == "plain")
  }

  test("truncateParagraphs keeps leading paragraphs until the budget") {
    val text = "one two three\nfour five\nsix seven eight\nnine"
    assert(truncateParagraphs(text, 4) == "one two three\nfour five")
    assert(truncateParagraphs(text, 100) == text)
    assert(truncateParagraphs(text, 0) == "")
    assert(truncateParagraphs(null, 10) == null)
  }

  test("bioLabels tags citation spans with B-/I- and O elsewhere") {
    val text = "siehe BGE 123 II 456 hier"
    //          0123456789...
    val spans = Seq((6, 20, "CITATION"))
    val labels = bioLabels(text, spans)
    assert(labels == Seq(
      "siehe" -> "O",
      "BGE" -> "B-CITATION",
      "123" -> "I-CITATION",
      "II" -> "I-CITATION",
      "456" -> "I-CITATION",
      "hier" -> "O"))
  }

  test("bioLabels handles punctuation tokens and empty spans") {
    assert(bioLabels("a, b", Seq.empty) ==
      Seq("a" -> "O", "," -> "O", "b" -> "O"))
    assert(bioLabels(null, Seq.empty) == Seq.empty)
  }
}
