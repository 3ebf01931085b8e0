package graft.extract

import graft.functions.{HtmlDom, TextFunctions}
import graft.functions.HtmlDom.{Elem, asRoot, directChildren, findAll, removeAll}

/** Per-spider cleaning (F3): the HTML path is DOM surgery ported from
  * `cleaning_functions.py:9-37` (select a subtree / decompose nodes,
  * then get_text + clean_text, `cleaner.py:151-169`); the PDF path is
  * the ordered regex fold from `cleaning_regexes.json` applied with
  * namespace-template substitution (`cleaner.py:171-191`).
  *
  * Two deliberate divergences from the reference code (NOT its data):
  * `clean_with_regexes` discards `pattern.format(**namespace)` and
  * re-subs against the ORIGINAL text each iteration, so only the last
  * rule ever applies and templates never resolve — both contradict the
  * rule files' own descriptions. We fold the rules in order over the
  * accumulating text and substitute `{key}` from the caller's vars,
  * i.e. the documented intent.
  */
object HtmlCleaners {

  /** spider → DOM operation (cleaning_functions.py; lenient where the
    * reference would throw on missing nodes — absence routes to the
    * §2.9 quarantine channel instead).
    */
  val domRegistry: Map[String, Elem => Elem] = Map(
    // keep the first div.content subtree
    "CH_BGer" -> (root => findAll(root, "div", "content").headOption
      .map(asRoot).getOrElse(root)),
    // last top-level table carries the decision
    "ZH_Verwaltungsgericht" -> (root => directChildren(root, "table")
      .lastOption.map(asRoot).getOrElse(root)),
    // all content lives in this exact-class div
    "ZH_Sozialversicherungsgericht" -> (root =>
      findAll(root, "div", "cell small-12").headOption
        .map(asRoot).getOrElse(root)),
    // strip page-number separators
    "CH_BGE" -> (root => removeAll(root, "div", "center pagebreak")),
    // leading table is logo + court name
    "VD_FindInfo" -> (root => removeAll(root, "table")),
    // headers are boilerplate
    "AG_Gerichte" -> (root => removeAll(root, "div", "header")))

  /** spider → ordered (pattern, replacement) rules, ported by
    * tools/port_cleaning_regexes.py.
    */
  lazy val cleaningRegexes: Map[String, Seq[(String, String)]] = {
    val in = getClass.getResourceAsStream("/graft/cleaning_regexes.json")
    require(in != null, "bundled cleaning regexes missing from classpath")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    val root = MarkerConfigLoader.parseNested(text)
    root.map { case (spider, rules) =>
      spider -> rules.asInstanceOf[Map[String, Any]].toSeq
        .sortBy(_._1.toInt)
        .map { case (_, rule) =>
          val r = rule.asInstanceOf[Map[String, Any]]
          (r("pattern").asInstanceOf[String], r("replacement").asInstanceOf[String])
        }
    }
  }

  /** HTML path: spider DOM surgery (identity for spiders without one),
    * then text extraction + general cleaning — `clean_html`.
    */
  def cleanHtml(spider: String, html: String): String = {
    if (html == null) return null
    val dom = HtmlDom.parse(html)
    val cleaned = domRegistry.get(spider).map(_(dom)).getOrElse(dom)
    TextFunctions.cleanText(TextFunctions.htmlToText(HtmlDom.render(cleaned)))
  }

  /** PDF path: the spider's regex rules folded in order (templates
    * like `{file_number}` / `{date.year}` resolved from `vars`), then
    * general cleaning — `clean_pdf`.
    */
  def cleanPdf(spider: String, text: String,
               vars: Map[String, String] = Map.empty): String = {
    if (text == null) return null
    val rules = cleaningRegexes.getOrElse(spider, Seq.empty)
    val folded = rules.foldLeft(text) { case (acc, (pat, repl)) =>
      val resolved = vars.foldLeft(pat) { case (p, (k, v)) =>
        p.replace(s"{$k}", v)
      }
      resolved.r.replaceAllIn(acc, java.util.regex.Matcher.quoteReplacement(repl))
    }
    TextFunctions.cleanText(folded)
  }
}
