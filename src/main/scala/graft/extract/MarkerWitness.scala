package graft.extract

import scala.util.Try
import scala.util.matching.Regex

/** Witness synthesis for the ported marker corpus (F9): given one of the
  * reference's section-marker regexes (section_splitting_functions.py:53-1523,
  * OR-joined alternation of mostly-literal phrases with anchors and small
  * quantifiers), produce a LITERAL string the regex matches.
  *
  * This powers the full-corpus oracle gate (`x19_spider_sweep`): a document is
  * synthesized per (spider, language) from each section's own witness phrase,
  * so the expected section assignment is known BY CONSTRUCTION — the oracle
  * states it literally, without ever running the engine's fold.
  *
  * The synthesizer handles the subset the corpus uses (alternation, groups,
  * classes with ranges/negation, escapes, `. ^ $ ? * + {m,n}`); every
  * candidate is verified against the compiled pattern by the caller, so an
  * unsupported construct degrades to "try the next alternative", never to a
  * wrong witness.
  */
object MarkerWitness {

  /** One candidate witness per top-level alternative, in pattern order.
    * Alternatives the synthesizer can't handle are skipped.
    */
  def candidates(pattern: String): Seq[String] = {
    var p = pattern
    while (p.startsWith("(?i)") || p.startsWith("(?s)") || p.startsWith("(?m)"))
      p = p.substring(4)
    splitTop(p).flatMap(b => Try(synthBranch(b)).toOption)
  }

  /** First candidate that the compiled regex actually matches. */
  def witness(r: Regex): Option[String] =
    candidates(r.regex).find(c => r.findFirstIn(c).isDefined)

  /** Split on top-level `|` (escape-, class-, and group-aware). */
  private def splitTop(p: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inClass = false
    var i = 0
    while (i < p.length) {
      val c = p(i)
      if (c == '\\' && i + 1 < p.length) { cur.append(c).append(p(i + 1)); i += 2 }
      else {
        if (inClass) { cur.append(c); if (c == ']') inClass = false }
        else c match {
          case '[' => inClass = true; cur.append(c)
          case '(' => depth += 1; cur.append(c)
          case ')' => depth -= 1; cur.append(c)
          case '|' if depth == 0 => out += cur.toString; cur.clear()
          case _ => cur.append(c)
        }
        i += 1
      }
    }
    out += cur.toString
    out.result()
  }

  /** Generate a matching string for one alternation-free branch. Throws on
    * constructs outside the supported subset (lookaround, dangling
    * quantifiers); the caller treats that as "skip this alternative".
    */
  private def synthBranch(b: String): String = {
    val out = new StringBuilder

    // returns (generated text for the atom at i, index after the atom)
    def atomAt(i: Int): (String, Int) = b(i) match {
      case '\\' =>
        val n = b(i + 1)
        val s = n match {
          case 'd' => "1"; case 's' => " "; case 'w' => "a"
          case 'b' => "" // boundary: holds or fails in final verification
          case 'n' => "\n"; case 't' => "\t"
          case 'D' => "Z"; case 'S' => "x"; case 'W' => "-"
          case c => c.toString
        }
        (s, i + 2)
      case '[' =>
        var j = i + 1
        val neg = b(j) == '^'
        if (neg) j += 1
        val items = Seq.newBuilder[Char]
        var first = true
        while (b(j) != ']' || first) {
          first = false
          if (b(j) == '\\') {
            items += (b(j + 1) match {
              case 'd' => '1'; case 's' => ' '; case 'w' => 'a'
              case 'n' => '\n'; case 't' => '\t'; case c => c
            })
            j += 2
          } else if (j + 2 < b.length && b(j + 1) == '-' && b(j + 2) != ']') {
            items += b(j) // range: low end
            j += 3
          } else { items += b(j); j += 1 }
        }
        j += 1 // past ']'
        val set = items.result().toSet
        if (neg) ("aZ1 .xy".find(!set.contains(_)).getOrElse(throw new IllegalArgumentException("negated class")).toString, j)
        else (items.result().head.toString, j)
      case '(' =>
        var depth = 1
        var j = i + 1
        while (depth > 0) {
          b(j) match {
            case '\\' => j += 1
            case '[' =>
              j += 1
              if (b(j) == '^') j += 1
              var first = true
              while (b(j) != ']' || first) { first = false; if (b(j) == '\\') j += 2 else j += 1 }
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          j += 1
        }
        var inner = b.substring(i + 1, j - 1)
        if (inner.startsWith("?:")) inner = inner.substring(2)
        else if (inner.startsWith("?")) throw new IllegalArgumentException("lookaround/flag group")
        // recurse through the group's own alternation; first viable branch
        val sub = splitTop(inner).flatMap(br => Try(synthBranch(br)).toOption)
          .headOption.getOrElse(throw new IllegalArgumentException("no viable branch"))
        (sub, j)
      case '.' => ("a", i + 1)
      case '^' | '$' => ("", i + 1)
      case c if "*+?{".contains(c) => throw new IllegalArgumentException("dangling quantifier")
      case c => (c.toString, i + 1)
    }

    var i = 0
    while (i < b.length) {
      val (s, j) = atomAt(i)
      if (j < b.length && (b(j) == '*' || b(j) == '?')) {
        // zero occurrences; skip a lazy marker
        i = if (j + 1 < b.length && b(j + 1) == '?') j + 2 else j + 1
      } else if (j < b.length && b(j) == '+') {
        out.append(s)
        i = if (j + 1 < b.length && b(j + 1) == '?') j + 2 else j + 1
      } else if (j < b.length && b(j) == '{') {
        val k = b.indexOf('}', j)
        val min = b.substring(j + 1, k).split(",", -1).head match {
          case "" => 0
          case m => m.toInt
        }
        out.append(s * min)
        i = k + 1
      } else { out.append(s); i = j }
    }
    out.toString
  }
}

/** Full-corpus sweep construction for `x19_spider_sweep`: one synthetic
  * document per ported (spider, language) pair, paragraphs drawn from that
  * pair's own marker witnesses, expected assignment derived purely from the
  * construction (NOT from running the fold).
  */
object MarkerSweep {

  /** paras = what the engine splits; expected = section → full text
    * ("" where the spider has no such section), stated by construction.
    */
  final case class SweepRow(spider: String, lang: String, paras: Seq[String],
                            expected: Map[String, String])

  private val order = Extractors.sectionOrder // header..footer

  lazy val rows: Seq[SweepRow] = {
    val cfg = MarkerConfigLoader.bundled
    val ported = cfg.keysIterator.filter(_.contains("/")).toSeq.sorted
    ported.map { key =>
      val Array(spider, lang) = key.split("/", 2)
      val table = cfg(key)
      // header markers are inert: associateSections only ever advances to
      // LATER sections, and header is sectionOrder(0)
      val present = order.drop(1).filter(table.contains)
      val headerLine = s"Dokument $spider $lang"

      val witnesses: Map[String, String] = present.zipWithIndex.map { case (sec, k) =>
        val pat = table(sec)
        // The fold is position-safe by construction: the witness arrives when
        // the current section is its immediate predecessor-in-table, and no
        // table section lies strictly between consecutive table sections. A
        // witness may therefore freely match EARLIER or LATER sections'
        // patterns — `find` over ascending later-section indices picks the
        // intended one first. Only a match on a skipped-but-present section
        // in between could misroute, and none exists.
        val prevIdx = if (k == 0) 0 else order.indexOf(present(k - 1))
        val between = order.slice(prevIdx + 1, order.indexOf(sec)).filter(table.contains)
        require(between.isEmpty, s"unexpected in-between section for $key.$sec")
        val w = MarkerWitness.candidates(pat.regex)
          .find(c => pat.findFirstIn(c).isDefined)
          .getOrElse(throw new IllegalStateException(s"no witness for $key.$sec: ${pat.regex}"))
        sec -> w
      }.toMap

      // content and header lines must not match any later section's marker,
      // or the fold would advance early; the corpus satisfies this (checked
      // here so a corpus edit fails loudly at construction, not in the gate)
      def contentFor(sec: String): String = s"Inhalt Absatz ${order.indexOf(sec)}"
      for (line <- headerLine +: present.map(contentFor); sec <- present)
        require(table(sec).findFirstIn(line).isEmpty,
          s"synthetic line '$line' collides with $key.$sec marker")

      val paras = headerLine +: present.flatMap(sec => Seq(witnesses(sec), contentFor(sec)))
      val expected = order.map {
        case "header" => "header" -> headerLine
        case sec if present.contains(sec) => sec -> (witnesses(sec) + "\n" + contentFor(sec))
        case sec => sec -> ""
      }.toMap
      SweepRow(spider, lang, paras, expected)
    }
  }

  /** Fully-literal DuckDB oracle: the expected table as a VALUES list. */
  lazy val oracleSql: String = {
    def lit(s: String): String =
      "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
    val tuples = rows.map { r =>
      val cols = Seq(lit(r.spider), lit(r.lang)) ++
        order.map(sec => lit(r.expected(sec)))
      cols.mkString("(", ", ", ")")
    }
    s"""SELECT * FROM (VALUES ${tuples.mkString(",\n")})
        AS t(spider, lang, ${order.mkString(", ")})"""
  }
}
