package graft.extract

import scala.util.matching.Regex

/** Marker-table config loader — SURVEY §7.5 hard part 2: the
  * reference's ~60 per-spider marker tables (`section_splitting_
  * functions.py:53-1523`) must be DATA so new spiders ship without
  * code. Config is JSON:
  *
  * {{{
  * { "CH_BGer": { "facts": "(?i)^sachverhalt",
  *                "considerations": "(?i)^erwägungen", ... },
  *   "ZH_VG":   { ... } }
  * }}}
  *
  * Parsed with a minimal recursive-descent JSON reader (no external
  * dependency; the values are flat string→string→string). In
  * production the parsed map is `spark.sparkContext.broadcast` once and
  * closed over by the section-splitting UDF.
  */
object MarkerConfigLoader {

  /** Parse the JSON config into a MarkerConfig. Two shapes are
    * accepted and may mix per spider:
    *  - flat: spider → section → pattern (key stays `spider`)
    *  - language-keyed: spider → lang → section → pattern (the ported
    *    reference corpus; flattened to `spider/lang` keys resolved by
    *    `Extractors.splitSections(spider, lang, ...)`)
    * Throws IllegalArgumentException on malformed input with the
    * offending position.
    */
  def parse(json: String): Extractors.MarkerConfig = {
    val p = new MiniJson(json)
    val root = p.parseObject()
    root.flatMap { case (spider, v) =>
      v match {
        case m: Map[_, _] =>
          val obj = m.asInstanceOf[Map[String, Any]]
          if (obj.values.forall(_.isInstanceOf[String]))
            Seq(spider -> obj.map { case (sec, pat) => sec -> pat.asInstanceOf[String].r })
          else obj.toSeq.map {
            case (lang, secs: Map[_, _]) =>
              s"$spider/$lang" -> secs.asInstanceOf[Map[String, Any]].map {
                case (sec, pat: String) => sec -> pat.r
                case (sec, other) =>
                  throw new IllegalArgumentException(s"marker $spider.$lang.$sec: expected string, got $other")
              }
            case (lang, other) =>
              throw new IllegalArgumentException(s"spider $spider.$lang: expected object or string, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"spider $spider: expected object, got $other")
      }
    }
  }

  /** The ported reference marker corpus (~45 spiders × up to 3
    * languages; data extracted 1:1 from section_splitting_functions
    * .py:53-1523 by tools/port_markers.py, OR-joined + NFC-normalized
    * exactly like prepare_section_markers). Bundled on the classpath;
    * production broadcasts this once.
    */
  lazy val bundled: Extractors.MarkerConfig = {
    val in = getClass.getResourceAsStream("/graft/markers.json")
    require(in != null, "bundled marker corpus /graft/markers.json missing from classpath")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    withDefaults(parse(text))
  }

  /** Merge a loaded config over the built-in defaults (loaded spiders
    * win; `default` stays available as the dispatch fallback).
    */
  def withDefaults(loaded: Extractors.MarkerConfig): Extractors.MarkerConfig =
    Extractors.defaultMarkers ++ loaded

  /** Parse arbitrarily nested object-of-objects JSON (strings at the
    * leaves) into nested Maps — for bundled config resources whose
    * shape isn't the marker table (cleaning rules, citation bank).
    */
  def parseNested(json: String): Map[String, Any] =
    new MiniJson(json).parseObject()

  /** Minimal JSON object-of-objects-of-strings parser. */
  private final class MiniJson(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at pos $i")
      i += 1
    }
    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) {
          i += 1
          sb.append(s(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case 'u' =>
              val h = s.substring(i + 1, i + 5); i += 4
              Integer.parseInt(h, 16).toChar
            case c => c
          })
        } else sb.append(s(i))
        i += 1
      }
      expect('"')
      sb.toString
    }
    // SeqMap: config files are resolved first-match in declaration
    // order by some consumers (CourtChambers canton/court name lookup,
    // mirroring the reference's dict-insertion-order iteration), so the
    // parse must preserve it.
    def parseObject(): Map[String, Any] = {
      expect('{')
      ws()
      if (i < s.length && s(i) == '}') { i += 1; return scala.collection.immutable.SeqMap.empty }
      val out = scala.collection.immutable.SeqMap.newBuilder[String, Any]
      var done = false
      while (!done) {
        val k = parseString()
        expect(':')
        ws()
        val v: Any =
          if (i < s.length && s(i) == '{') parseObject()
          else parseString()
        out += k -> v
        ws()
        if (i < s.length && s(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      out.result()
    }
  }
}
