package graft.functions

/** Deterministic rule-based lemma/POS tagging — the A3 counter feeder
  * (the reference aggregates spaCy lemma/POS `Counter`s per chamber,
  * `scrc/preprocessors/nlp_pipeline_runner.py` +
  * `abstract_preprocessor.py:343-410`). spaCy itself is model-bound
  * and not JVM-reproducible; this tier is the deterministic stand-in:
  * a closed-class lexicon (data), ordered suffix rules for German
  * noun/verb lemmas, and word-shape POS heuristics, all restatable in
  * an oracle. The pluggable seam mirrors `TokenCounter` — a
  * model-backed tagger drops into the same `counter` signature.
  *
  * POS tags follow the UPOS inventory the reference's spaCy models
  * emit (DET, NOUN, VERB, AUX, ADP, ADV, PRON, PART, CCONJ, NUM,
  * PUNCT, ADJ, X).
  */
object Lemmatizer {

  final case class Tagged(token: String, lemma: String, pos: String)

  private def family(lemma: String, pos: String, forms: String*) =
    forms.map(_ -> (lemma, pos))

  /** closed-class forms + irregular auxiliaries per language:
    * form → (lemma, pos)
    */
  private val lexicons: Map[String, Map[String, (String, String)]] = Map(
    "de" -> (family("der", "DET", "der", "die", "das", "den", "dem", "des") ++
      family("ein", "DET", "ein", "eine", "einen", "einem", "einer", "eines") ++
      family("und", "CCONJ", "und") ++ family("oder", "CCONJ", "oder") ++
      Seq("von", "in", "auf", "mit", "nach", "bei", "zu", "aus", "für",
        "gegen", "über").map(p => p -> (p, "ADP")) ++
      Seq("er", "sie", "es", "wir", "ich").map(p => p -> (p, "PRON")) ++
      Seq("heute", "gestern", "hier", "dort").map(a => a -> (a, "ADV")) ++
      family("nicht", "PART", "nicht") ++
      family("sein", "AUX", "ist", "sind", "war", "waren", "sei") ++
      family("werden", "AUX", "wird", "werden", "wurde", "wurden") ++
      family("haben", "AUX", "hat", "haben", "hatte", "hatten")).toMap,
    "fr" -> (family("le", "DET", "le", "la", "les") ++
      family("un", "DET", "un", "une") ++
      family("et", "CCONJ", "et") ++ family("ou", "CCONJ", "ou") ++
      Seq("de", "du", "des", "à", "au", "aux", "par", "pour", "sur",
        "dans", "contre").map(p => p -> (p, "ADP")) ++
      Seq("il", "elle", "ils", "elles", "nous").map(p => p -> (p, "PRON")) ++
      family("ne", "PART", "ne", "pas") ++
      family("être", "AUX", "est", "sont", "était", "étaient") ++
      family("avoir", "AUX", "a", "ont", "avait", "avaient")).toMap,
    "it" -> (family("il", "DET", "il", "lo", "la", "i", "gli", "le") ++
      family("un", "DET", "un", "uno", "una") ++
      family("e", "CCONJ", "e", "ed") ++ family("o", "CCONJ", "o") ++
      Seq("di", "del", "della", "a", "al", "alla", "in", "nel", "per",
        "con", "su").map(p => p -> (p, "ADP")) ++
      Seq("egli", "essa", "essi", "noi").map(p => p -> (p, "PRON")) ++
      family("non", "PART", "non") ++
      family("essere", "AUX", "è", "sono", "era", "erano") ++
      family("avere", "AUX", "ha", "hanno", "aveva", "avevano")).toMap)

  /** noun suffix rules per language, FIRST match applies (specific
    * before general)
    */
  private val nounRulesByLang: Map[String, Seq[(String, String)]] = Map(
    "de" -> Seq(
      "ungen" -> "ung", "heiten" -> "heit", "keiten" -> "keit",
      "nisse" -> "nis", "eien" -> "ei", "en" -> "e", "e" -> "", "s" -> ""),
    "fr" -> Seq("aux" -> "al", "s" -> ""),
    "it" -> Seq("ioni" -> "ione", "i" -> "o", "e" -> "a"))

  private val MinStem = 4

  private def stripFirst(token: String, rules: Seq[(String, String)]): String =
    rules.collectFirst {
      case (suf, rep) if token.endsWith(suf) &&
        token.length - suf.length + rep.length >= MinStem =>
        token.dropRight(suf.length) + rep
    }.getOrElse(token)

  /** Tag one token (trilingual like the reference corpus; unknown
    * langs fall back to German rules). Deterministic; unknown shapes
    * degrade to ADJ/NOUN/X, never throw.
    */
  def tag(token: String, lang: String = "de"): Tagged = {
    if (token == null || token.isEmpty) return Tagged(token, token, "X")
    val lower = token.toLowerCase
    val lex = lexicons.getOrElse(lang, lexicons("de"))
    val nounRules = nounRulesByLang.getOrElse(lang, nounRulesByLang("de"))
    lex.get(lower) match {
      case Some((lemma, pos)) => Tagged(token, lemma, pos)
      case None =>
        if (token.forall(_.isDigit)) Tagged(token, token, "NUM")
        else if (!token.exists(_.isLetter)) Tagged(token, token, "PUNCT")
        else if (lang == "fr" || lang == "it") {
          val inf = if (lang == "fr") Seq("er", "ir", "re") else Seq("are", "ere", "ire")
          if (token.head.isUpper) Tagged(token, token, "PROPN")
          else if (inf.exists(lower.endsWith) && lower.length >= MinStem)
            Tagged(token, lower, "VERB")
          else Tagged(token, stripFirst(lower, nounRules), "NOUN")
        }
        else if (token.head.isUpper) {
          // German nouns capitalize; strip the first matching suffix
          Tagged(token, stripFirst(token, nounRules), "NOUN")
        } else if (lower.endsWith("en")) Tagged(token, lower, "VERB") // infinitive
        else if (lower.endsWith("t") && lower.length >= MinStem) {
          // finite 3sg → infinitive: prüft → prüfen, entscheidet → entscheiden
          val stem = lower.dropRight(1)
          val lemma = if (stem.endsWith("e")) stem + "n" else stem + "en"
          Tagged(token, lemma, "VERB")
        } else Tagged(token, lower, "ADJ")
    }
  }

  private val wordPattern = "[\\p{L}\\p{N}]+|[^\\s\\p{L}\\p{N}]".r

  def tagText(text: String, lang: String = "de"): Seq[Tagged] =
    if (text == null) Seq.empty
    else wordPattern.findAllIn(text).map(tag(_, lang)).toSeq

  /** Per-document lemma/POS counter map (key = lemma TAB pos) — the A3
    * input shape: these maps merge map-side through `counter_merge` /
    * `CounterAggregator` exactly like the reference's per-chunk
    * Counter dicts.
    */
  def counter(text: String, lang: String = "de"): Map[String, Long] =
    tagText(text, lang).groupBy(t => t.lemma + "\t" + t.pos)
      .map { case (k, v) => k -> v.size.toLong }
}
