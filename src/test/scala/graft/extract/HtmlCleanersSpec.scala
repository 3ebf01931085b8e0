package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HtmlDom

/** Before/after fixtures for the per-spider cleaning (F3): DOM surgery
  * ported from cleaning_functions.py, regex fold from
  * cleaning_regexes.json.
  */
class HtmlCleanersSpec extends AnyFunSuite {

  test("CH_BGer keeps only the first div.content subtree") {
    val html =
      """<html><body><div class="nav">Menü Suche</div>
        |<div class="content">Urteil vom 1. Januar <b>2020</b></div>
        |<div class="footer">Impressum</div></body></html>""".stripMargin
    assert(HtmlCleaners.cleanHtml("CH_BGer", html) == "Urteil vom 1. Januar 2020")
  }

  test("AG_Gerichte decomposes every div.header") {
    val html =
      """<div class="header">Obergericht Aargau</div><p>Die Beschwerde wird abgewiesen.</p>
        |<div class="header wide">Seite 2</div><p>Kosten: Fr. 500.</p>""".stripMargin
    assert(HtmlCleaners.cleanHtml("AG_Gerichte", html) ==
      "Die Beschwerde wird abgewiesen. Kosten: Fr. 500.")
  }

  test("VD_FindInfo drops tables, CH_BGE drops pagebreak divs") {
    val vd = """<table><tr><td><img src="logo.png">Tribunal cantonal</td></tr></table><p>Arrêt du juge</p>"""
    assert(HtmlCleaners.cleanHtml("VD_FindInfo", vd) == "Arrêt du juge")
    val bge =
      """<p>Regeste</p><div class="center pagebreak">- 2 -</div><p>Erwägungen</p>"""
    assert(HtmlCleaners.cleanHtml("CH_BGE", bge) == "Regeste Erwägungen")
  }

  test("ZH_Verwaltungsgericht keeps the LAST top-level table") {
    val html =
      """<table><tr><td>Kopfzeile</td></tr></table>
        |<table><tr><td>Das Verwaltungsgericht erkennt</td></tr></table>""".stripMargin
    assert(HtmlCleaners.cleanHtml("ZH_Verwaltungsgericht", html) ==
      "Das Verwaltungsgericht erkennt")
  }

  test("ZH_Sozialversicherungsgericht selects the exact-class div (bs4 multi-token semantics)") {
    val html =
      """<div class="cell">wrong</div><div class="cell small-12">Entscheid Inhalt</div>"""
    assert(HtmlCleaners.cleanHtml("ZH_Sozialversicherungsgericht", html) ==
      "Entscheid Inhalt")
  }

  test("unknown spider: generic text extraction only") {
    assert(HtmlCleaners.cleanHtml("XX_SPIDER", "<p>A &amp; B</p>") == "A & B")
  }

  test("regex fold applies ALL rules in order (reference data intent)") {
    // ZH_Obergericht: page numbers "- 3 -" removed
    assert(HtmlCleaners.cleanPdf("ZH_Obergericht", "Urteil - 3 - Erwägungen")
      == "Urteil Erwägungen")
    // VS_Gerichte has TWO rules; both must apply (the reference's
    // cleaner bug applied only the last)
    val vs = "Microsoft Word Dok1.docx\nUrteil - 2 - Ende"
    assert(HtmlCleaners.cleanPdf("VS_Gerichte", vs) == "Urteil Ende")
  }

  test("template vars resolve in patterns ({file_number}, {date.year})") {
    val out = HtmlCleaners.cleanPdf("CH_BVGer",
      "A-123/2019 Urteil Seite 4 Ende",
      Map("file_number" -> "A-123/2019"))
    assert(out == "Urteil Ende")
    val sh = HtmlCleaners.cleanPdf("SH_OG", "Kopf\n2019\nUrteil",
      Map("date.year" -> "2019"))
    assert(!sh.contains("2019"))
  }

  test("CH_BGer letter-spacing regex collapses 'U r t e i l'") {
    assert(HtmlCleaners.cleanPdf("CH_BGer", "U r t e i l vom 1. Januar")
      == "Urteil vom 1. Januar")
  }

  test("CH_BGer structured citation extraction (span.artref / a.bgeref_id)") {
    val html =
      """<div>Gestützt auf <span class="artref">Art. 95 BGG</span> und
        |<a class="bgeref_id" href="/bge/133">BGE 133 II 249</a> sowie
        |<span class="artref"><b>kein</b> solo-string</span>
        |<span class="artref"></span>
        |<a class="other" href="/x">kein Zitat</a></div>""".stripMargin
    val (laws, rulings) = Extractors.chBGerHtmlCitations(html)
    assert(laws == Seq("Art. 95 BGG")) // nested + empty spans skipped
    assert(rulings == Seq(("/bge/133", "BGE 133 II 249")))
  }

  test("unified paragraph extraction: every text node, pdf double-break split") {
    import graft.functions.TextFunctions.{htmlToParagraphsUnified, pdfToParagraphs}
    // inline markup splits the sentence into separate strings, like
    // bs4 .strings
    assert(htmlToParagraphsUnified("<p>Der <b>Antrag</b> ist</p>") ==
      Seq("Der", "Antrag", "ist"))
    // single line breaks stay INSIDE a paragraph; '\n  \n' counts as a
    // double break after the space strip; doubled spaces collapse
    assert(pdfToParagraphs("Zeile eins\nZeile zwei\n  \nAbsatz  zwei\n\n\n") ==
      Seq("Zeile eins Zeile zwei", "Absatz zwei"))
  }

  test("parser survives void elements, comments, raw script and stray close tags") {
    val html = """<!DOCTYPE html><!-- c --><div><br><script>if (a<b) x();</script>ok</div></span>"""
    val dom = HtmlDom.parse(html)
    assert(HtmlDom.findAll(dom, "script").nonEmpty)
    assert(HtmlCleaners.cleanHtml("nobody", html) == "ok")
  }
}
