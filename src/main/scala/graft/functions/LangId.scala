package graft.functions

/** Character-trigram language identification (F35,
  * `language_identifier.py:41-56` — the reference wraps fastText; this
  * is the JVM-native analog: a bag-of-character-n-grams linear scorer,
  * the same model family fastText compresses).
  *
  * Profiles are built at init from embedded per-language function-word
  * and domain seed lists: each language's trigram weight is its
  * relative frequency across the seeds. A text scores
  * `Σ count(t) · w_lang(t) / n_trigrams` per language; argmax wins,
  * with an absolute floor and a margin requirement so gibberish and
  * mixed text fall back to "unk" (the reference's `--` sentinel,
  * `language_identifier.py:24`).
  *
  * Pure function of the text — deterministic, no model file, no I/O;
  * scales as one compiled pass per row with zero shuffle.
  */
object LangId {

  /** de/fr/it/en seeds: high-frequency function words plus the court
    * vocabulary the corpus is made of. Data, not code — extend per
    * language without touching the scorer.
    */
  private val seedWords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit",
      "wird", "dass", "eine", "auch", "sich", "auf", "für", "dem", "den",
      "des", "ein", "im", "zu", "bei", "nach", "werden", "durch", "gegen",
      "oder", "wie", "über", "zur", "zum", "haben", "hat", "sind", "sein",
      "beschwerde", "urteil", "recht", "gericht", "entscheid", "gemäss",
      "artikel", "absatz", "gutgeheissen", "abgewiesen", "verfahren",
      "vorinstanz", "erwägung", "sachverhalt", "kanton", "bundesgericht"),
    "fr" -> Seq("le", "la", "les", "des", "une", "est", "et", "que", "qui",
      "dans", "pour", "par", "sur", "pas", "avec", "être", "aux", "cette",
      "ont", "son", "ses", "au", "du", "de", "en", "il", "elle", "ne",
      "recours", "droit", "tribunal", "arrêt", "selon", "ainsi", "lorsque",
      "rejeté", "admis", "considérant", "procédure", "instance", "fédéral",
      "canton", "jugement", "décision", "partie", "contre"),
    "it" -> Seq("il", "la", "che", "di", "del", "della", "per", "non",
      "una", "sono", "con", "nel", "alla", "questo", "anche", "come",
      "dal", "dei", "delle", "gli", "essere", "stato", "sua", "suo",
      "ricorso", "diritto", "tribunale", "sentenza", "secondo",
      "respinto", "accolto", "considerando", "procedura", "federale",
      "cantone", "giudizio", "decisione", "parte", "contro"),
    "en" -> Seq("the", "and", "that", "for", "with", "this", "from",
      "are", "was", "not", "have", "has", "been", "which", "their",
      "they", "will", "would", "shall", "there", "what", "when", "were",
      "appeal", "court", "judgment", "law", "according", "dismissed",
      "granted", "proceedings", "federal", "decision", "against", "party"))

  /** trigrams of a word with boundary spaces ("der" → " de","der","er ") */
  private def trigrams(word: String): Seq[String] = {
    val w = " " + word + " "
    (0 to w.length - 3).map(i => w.substring(i, i + 3))
  }

  /** language → trigram → relative frequency over that language's seeds */
  private val profiles: Map[String, Map[String, Double]] =
    seedWords.map { case (lang, words) =>
      val counts = new scala.collection.mutable.HashMap[String, Int]
      for (w <- words; t <- trigrams(w.toLowerCase))
        counts(t) = counts.getOrElse(t, 0) + 1
      val total = counts.values.sum.toDouble
      lang -> counts.map { case (t, c) => t -> c / total }.toMap
    }

  private val langs = Seq("de", "fr", "it", "en") // fixed order = deterministic ties

  /** Per-language mean trigram weight of `text` (clipped to the first
    * `maxChars` chars — the reference identifies on a prefix too).
    */
  def scores(text: String, maxChars: Int = 2000): Map[String, Double] = {
    if (text == null) return langs.map(_ -> 0.0).toMap
    val t = text.toLowerCase.replaceAll("[^\\p{L}]+", " ").trim
    val clipped = if (t.length > maxChars) t.substring(0, maxChars) else t
    if (clipped.length < 3) return langs.map(_ -> 0.0).toMap
    val body = " " + clipped + " "
    val sums = scala.collection.mutable.Map(langs.map(_ -> 0.0): _*)
    var i = 0
    val n = body.length - 2
    while (i < n) {
      val tri = body.substring(i, i + 3)
      for (l <- langs) {
        val w = profiles(l).getOrElse(tri, 0.0)
        if (w > 0.0) sums(l) += w
      }
      i += 1
    }
    langs.map(l => l -> sums(l) / n).toMap
  }

  /** Best language, or "unk" when the evidence is weak (near-zero best
    * score) or ambiguous (runner-up within 10%).
    */
  def detect(text: String): String = {
    val s = scores(text)
    val ranked = langs.map(l => l -> s(l)).sortBy { case (l, v) => (-v, langs.indexOf(l)) }
    val (best, bestV) = ranked.head
    val secondV = ranked(1)._2
    if (bestV < 1e-4) "unk"
    else if (secondV > 0 && bestV / secondV < 1.1) "unk"
    else best
  }
}
