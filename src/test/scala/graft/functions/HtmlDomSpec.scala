package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import HtmlDom._

/** Malformed-HTML recovery (S4): the hostile shapes real scraped court
  * HTML contains, against the tree the cleaners need.
  */
class HtmlDomSpec extends AnyFunSuite {

  private def text(html: String): String =
    textNodes(parse(html)).mkString

  test("implied close: sibling <p> tags become siblings, not a chain") {
    val root = parse("<div><p>eins<p>zwei<p>drei</div>")
    val div = findAll(root, "div").head
    assert(directChildren(div, "p").map(e => textNodes(e).mkString) ==
      Vector("eins", "zwei", "drei"))
  }

  test("implied close: quote-dropping table rows and cells") {
    val root = parse("<table><tr><td>a<td>b<tr><td>c<td>d</table>")
    val table = findAll(root, "table").head
    val rows = directChildren(table, "tr")
    assert(rows.length == 2, s"expected 2 rows, got ${rows.map(render)}")
    assert(rows.map(r => directChildren(r, "td").map(c => textNodes(c).mkString)) ==
      Vector(Vector("a", "b"), Vector("c", "d")))
  }

  test("implied close: list items and options") {
    val ul = findAll(parse("<ul><li>x<li>y<li>z</ul>"), "ul").head
    assert(directChildren(ul, "li").length == 3)
    val sel = findAll(parse("<select><option>a<option>b</select>"), "select").head
    assert(directChildren(sel, "option").length == 2)
  }

  test("implied close reaches a cell below an intervening open <p>") {
    // browsers close BOTH the p and the cell when a new td starts
    val root = parse("<table><tr><td><p>a<td>b</table>")
    val tr = findAll(root, "tr").head
    val cells = directChildren(tr, "td")
    assert(cells.length == 2, s"expected 2 cells, got ${cells.map(render)}")
    assert(textNodes(cells(1)).mkString == "b")
  }

  test("implied close does not cross a block boundary") {
    // the inner <p> opens inside <div>: the outer <p> must NOT close
    val root = parse("<p>aussen<div><p>innen</div>")
    val ps = findAll(root, "p")
    assert(ps.length == 2)
    assert(textNodes(ps.head).mkString.contains("innen") ||
      findAll(ps.head, "p").nonEmpty == false) // outer keeps the div subtree
  }

  test("unterminated attribute quote drops the tag, not the text") {
    // the broken tag's raw bytes must never leak into extracted text
    val t = text("""vor <span class="x>mitte</span> nach""")
    assert(t == "vor mitte nach", s"got '$t'")
    assert(!t.contains("class"))
  }

  test("CDATA body is text and an inner '>' does not truncate it") {
    assert(text("a<![CDATA[roh > text]]>b") == "aroh > textb")
    // unterminated CDATA runs to end of input
    assert(text("a<![CDATA[offen") == "aoffen")
  }

  test("stray '<' stays literal text") {
    assert(text("3 < 4 und 5 > 2") == "3 < 4 und 5 > 2")
  }

  test("well-formed documents are unaffected by the recovery paths") {
    val html = "<div class=\"content\"><p>Urteil</p><table><tr><td>a</td></tr></table></div>"
    assert(render(parse(html)) == html)
  }
  test("unparseable tag with NO '>' anywhere after keeps the tail as text") {
    // a truncated scrape tail: '<a href="x' with the quote and the
    // bracket both missing — the recovery path must not discard the
    // remainder of the document (ADVICE r3: fall through to the
    // literal-text case when indexOf('>') fails)
    assert(text("""<div>Text bleibt <a href="x""") == """Text bleibt <a href="x""")
    // with a '>' present the unparseable tag itself is still dropped
    assert(text("""<div>Text <span class="x>Ende</div>""") == "Text Ende")
  }
}
