package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal lenient HTML tree — just enough DOM for the per-spider
  * cleaning surgery (F3). The reference's `cleaning_functions.py:9-37`
  * uses exactly three bs4 operations: find_all(tag, class_) [+ take
  * first], findChildren(tag, recursive=False) [+ take last], and
  * node.decompose(); this module provides those over a dependency-free
  * parser (jsoup is the drop-in for hostile real-world HTML — the
  * sandbox has no jar, so the parser covers the well-formed case).
  *
  * Parser behavior: void elements self-close, script/style bodies are
  * raw text, comments and doctypes are skipped, stray close tags are
  * ignored, unclosed elements close at end of input (lenient, like
  * html.parser).
  *
  * Malformed-input recovery (the scraped-court-HTML reality the
  * reference leans on BeautifulSoup for, `text_to_database.py:238-254`):
  *  - implied sibling closes: an opening `p`/`li`/`tr`/`td`/`th`/
  *    `dt`/`dd`/`option` first closes a still-open sibling of the same
  *    family (browsers' and jsoup's tree construction) — without this,
  *    `findChildren(recursive=false)` over a quote-dropping table sees
  *    one nested chain instead of N rows and the per-spider cleaners
  *    pick the wrong child;
  *  - a tag the tokenizer cannot parse (unterminated attribute quote
  *    and similar) is DROPPED to the next `>` instead of leaking its
  *    raw bytes into the extracted text;
  *  - `<![CDATA[...]]>` bodies become text nodes (bs4 keeps CData as a
  *    string child), and a `>` inside the CDATA cannot truncate it.
  */
object HtmlDom {

  sealed trait Node
  final case class Text(value: String) extends Node
  final case class Elem(tag: String, attrs: Map[String, String],
                        children: Vector[Node]) extends Node {
    def classList: Set[String] =
      attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty).toSet
  }

  /** synthetic document root (renders as its children only) */
  val RootTag = "#root"

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  /** opening tag → sibling tags it implicitly closes (HTML5 tree
    * construction's "close a p / cell / item in scope" moves, the
    * subset that matters for scraped court tables and lists)
    */
  private val impliedClose: Map[String, Set[String]] = Map(
    "p" -> Set("p"),
    "li" -> Set("li"),
    "tr" -> Set("tr", "td", "th"),
    "td" -> Set("td", "th"),
    "th" -> Set("td", "th"),
    "dt" -> Set("dt", "dd"),
    "dd" -> Set("dt", "dd"),
    "option" -> Set("option"))

  /** Containers an implied close never crosses: a <p> inside a <div>
    * must not close a <p> outside it (HTML5 "in scope" boundary).
    */
  private val scopeBarriers = Set("table", "td", "th", "ul", "ol", "dl",
    "select", "div", "section", "article", "blockquote", "body", RootTag)

  private val tagToken =
    """(?s)<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:"[^"]*"|'[^']*'|[^>"'])*)(/?)>""".r
  private val attrToken =
    """([a-zA-Z][a-zA-Z0-9:_-]*)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+)))?""".r

  private def parseAttrs(s: String): Map[String, String] =
    attrToken.findAllMatchIn(s).map { m =>
      val v = Option(m.group(2)).orElse(Option(m.group(3)))
        .orElse(Option(m.group(4))).getOrElse("")
      m.group(1).toLowerCase -> v
    }.toMap

  /** Parse an HTML document or fragment into a synthetic root. */
  def parse(html: String): Elem = {
    // (tag, attrs, children-in-progress)
    val stack = ArrayBuffer((RootTag, Map.empty[String, String], ArrayBuffer.empty[Node]))
    var pos = 0
    def emitText(upTo: Int): Unit =
      if (upTo > pos) stack.last._3 += Text(html.substring(pos, upTo))
    def closeTop(): Unit = {
      val (t, a, c) = stack.remove(stack.length - 1)
      stack.last._3 += Elem(t, a, c.toVector)
    }
    while (pos < html.length) {
      val lt = html.indexOf('<', pos)
      if (lt < 0) { emitText(html.length); pos = html.length }
      else {
        emitText(lt)
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          pos = if (end < 0) html.length else end + 3
        } else if (html.startsWith("<![CDATA[", lt)) {
          // CData body is a text node (bs4 keeps it as a string child);
          // '>' inside the body must not truncate it
          val end = html.indexOf("]]>", lt + 9)
          val body = if (end < 0) html.substring(lt + 9)
                     else html.substring(lt + 9, end)
          if (body.nonEmpty) stack.last._3 += Text(body)
          pos = if (end < 0) html.length else end + 3
        } else if (html.startsWith("<!", lt) || html.startsWith("<?", lt)) {
          val end = html.indexOf('>', lt)
          pos = if (end < 0) html.length else end + 1
        } else tagToken.findPrefixMatchOf(html.substring(lt)) match {
          case None if lt + 1 < html.length &&
              (html.charAt(lt + 1).isLetter || html.charAt(lt + 1) == '/') &&
              html.indexOf('>', lt) >= 0 =>
            // tag-shaped but unparseable (unterminated quote etc.):
            // DROP to the next '>' rather than leaking raw tag bytes
            // into the text extraction; with NO '>' anywhere after (a
            // truncated scrape tail) fall through to the literal-text
            // case instead of discarding the rest of the document
            pos = html.indexOf('>', lt) + 1
          case None => // stray '<' — literal text
            stack.last._3 += Text("<"); pos = lt + 1
          case Some(m) =>
            val closing = m.group(1) == "/"
            val tag = m.group(2).toLowerCase
            val selfClosed = m.group(4) == "/" || voidTags(tag)
            pos = lt + m.matched.length
            if (closing) {
              // pop to the matching open tag; ignore if none is open
              if (stack.exists(_._1 == tag))
                while (stack.length > 1 && {
                  val t = stack.last._1; closeTop(); t != tag
                }) ()
            } else if (impliedClose.contains(tag) && stack.length > 1 && {
              // implied sibling close: <p>a<p>b, <tr>..<tr>, <td>..<td>.
              // The sibling may sit BELOW intervening open elements
              // (<td><p>a<td> must close both the p and the cell, as
              // browsers do) but never below a scope barrier — except
              // the barriers an S-member itself establishes (a td is a
              // barrier for p, yet a new td still closes it).
              val s = impliedClose(tag)
              val idx = stack.lastIndexWhere(f => s.contains(f._1))
              idx > 0 && !stack.drop(idx + 1)
                .exists(f => scopeBarriers(f._1) && !s.contains(f._1))
            }) {
              val s = impliedClose(tag)
              while (stack.length > 1 && !s.contains(stack.last._1)) closeTop()
              while (stack.length > 1 && s.contains(stack.last._1)) closeTop()
              if (selfClosed)
                stack.last._3 += Elem(tag, parseAttrs(m.group(3)), Vector.empty)
              else
                stack += ((tag, parseAttrs(m.group(3)), ArrayBuffer.empty[Node]))
            } else if (selfClosed) {
              stack.last._3 += Elem(tag, parseAttrs(m.group(3)), Vector.empty)
            } else if (tag == "script" || tag == "style") {
              // raw-text elements: body runs to the matching close tag
              val close = s"(?i)</$tag\\s*>".r.findFirstMatchIn(html.substring(pos))
              val (body, next) = close match {
                case Some(c) => (html.substring(pos, pos + c.start), pos + c.end)
                case None => (html.substring(pos), html.length)
              }
              stack.last._3 += Elem(tag, parseAttrs(m.group(3)), Vector(Text(body)))
              pos = next
            } else {
              stack += ((tag, parseAttrs(m.group(3)), ArrayBuffer.empty[Node]))
            }
        }
      }
    }
    while (stack.length > 1) closeTop()
    val (t, a, c) = stack.head
    Elem(t, a, c.toVector)
  }

  /** bs4 `class_` semantics: a single token matches via class-list
    * containment; a multi-token string matches the class attribute
    * verbatim (how bs4 treats `class_="cell small-12"`).
    */
  private def classMatches(e: Elem, cls: String): Boolean =
    cls == null || (if (cls.contains(" ")) e.attrs.getOrElse("class", "") == cls
    else e.classList(cls))

  /** All matching elements, document order (bs4 find_all). */
  def findAll(root: Node, tag: String, cls: String = null): Vector[Elem] = root match {
    case e: Elem =>
      val self =
        if (e.tag != RootTag && (tag == null || e.tag == tag) && classMatches(e, cls))
          Vector(e)
        else Vector.empty
      self ++ e.children.flatMap(findAll(_, tag, cls))
    case _ => Vector.empty
  }

  /** Direct children only (bs4 findChildren(recursive=False)). */
  def directChildren(root: Elem, tag: String): Vector[Elem] =
    root.children.collect { case e: Elem if tag == null || e.tag == tag => e }

  /** Drop every matching element with its subtree (bs4 decompose). */
  def removeAll(root: Elem, tag: String, cls: String = null): Elem = {
    def walk(e: Elem): Elem =
      e.copy(children = e.children.flatMap {
        case c: Elem =>
          if ((tag == null || c.tag == tag) && classMatches(c, cls)) Vector.empty
          else Vector(walk(c))
        case t => Vector(t)
      })
    walk(root)
  }

  /** All text-node values in document order (bs4 `.strings` — every
    * string node separately, including script/style bodies, exactly
    * like BeautifulSoup's generator).
    */
  def textNodes(root: Node): Vector[String] = root match {
    case Text(v) => Vector(v)
    case e: Elem => e.children.flatMap(textNodes)
  }

  /** bs4 `element.string`: the node's text ONLY when it has exactly
    * one string descendant, else None.
    */
  def soloString(e: Elem): Option[String] = textNodes(e) match {
    case Vector(one) => Some(one)
    case _ => None
  }

  /** Re-wrap an element as a document root (bs4 "return the subtree
    * as the new soup").
    */
  def asRoot(e: Elem): Elem =
    if (e.tag == RootTag) e else Elem(RootTag, Map.empty, Vector(e))

  /** Reserialize (attribute order is alphabetical for determinism). */
  def render(n: Node): String = n match {
    case Text(v) => v
    case e: Elem =>
      val inner = e.children.map(render).mkString
      if (e.tag == RootTag) inner
      else {
        val attrs = e.attrs.toSeq.sortBy(_._1)
          .map { case (k, v) => s""" $k="$v"""" }.mkString
        if (e.children.isEmpty && voidTags(e.tag)) s"<${e.tag}$attrs>"
        else s"<${e.tag}$attrs>$inner</${e.tag}>"
      }
  }
}
