package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Quantifies tokenizer-family divergence on a trilingual fixture so
  * the P7/r9 cutoff-calibration story is evidence-backed: the reference
  * counts tokens with HF BertTokenizer / spaCy
  * (abstract_preprocessor.py:256-298); this repo's pluggable counters
  * (whitespace, GPT-2 pretokenizer, merge-table BPE, WordPiece) are the
  * SURVEY-sanctioned substitute. The spec measures, per language:
  *
  *  - FERTILITY (subword tokens per whitespace word) per tier — the
  *    constant a deployment recalibrates cutoffs with when switching
  *    counting currency;
  *  - CUTOFF DECISION AGREEMENT: each tier thresholds at its own corpus
  *    median (the quantile-mapped equivalent of the same cutoff) — the
  *    fraction of documents whose keep/drop decision is unchanged
  *    across tiers bounds the impact of the tokenizer swap on P5/P7.
  *
  * Printed numbers feed COVERAGE.md's tokenizer-divergence paragraph.
  */
class TokenizerDivergenceSpec extends AnyFunSuite {

  private val de = Seq(
    "Das Bundesgericht weist die Beschwerde ab, soweit darauf einzutreten ist.",
    "Die Vorinstanz hat den Sachverhalt offensichtlich unrichtig festgestellt.",
    "Gegen diesen Entscheid kann innert dreissig Tagen Beschwerde erhoben werden.",
    "Die Gerichtskosten von dreitausend Franken werden der Beschwerdeführerin auferlegt.",
    "Der Anspruch auf rechtliches Gehör ist formeller Natur und führt zur Aufhebung.")
  private val fr = Seq(
    "Le Tribunal fédéral rejette le recours dans la mesure où il est recevable.",
    "L'autorité précédente a établi les faits de manière manifestement inexacte.",
    "Un recours peut être formé contre cette décision dans les trente jours.",
    "Les frais judiciaires de trois mille francs sont mis à la charge de la recourante.",
    "Le droit d'être entendu est de nature formelle et entraîne l'annulation.")
  private val it = Seq(
    "Il Tribunale federale respinge il ricorso in quanto ammissibile.",
    "L'autorità inferiore ha accertato i fatti in modo manifestamente inesatto.",
    "Contro questa decisione può essere interposto ricorso entro trenta giorni.",
    "Le spese giudiziarie di tremila franchi sono poste a carico della ricorrente.",
    "Il diritto di essere sentiti è di natura formale e comporta l'annullamento.")

  // documents of varying length: concatenations of 1..5 sentences
  private def docs(sents: Seq[String]): Seq[String] =
    (1 to sents.length).map(n => sents.take(n).mkString(" "))

  /** in-domain trained tiers — the shape a deployment calibrates with
    * (vocab trained on its own corpus); trained once on the trilingual
    * fixture's words
    */
  private lazy val fixtureWords: Seq[String] =
    (de ++ fr ++ it).flatMap(WordPiece.basicTokens)

  private lazy val trainedBpe: TokenCounter = {
    val merges = Bpe.parseMerges(
      Bpe.train(fixtureWords, 300).map { case (a, b) => s"$a $b" }.iterator)
    new TokenCounter { def tokens(t: String): Seq[String] = Bpe.tokenize(t, merges) }
  }

  private lazy val trainedWp: TokenCounter = {
    val vocab = WordPiece.train(fixtureWords, 800).toSet
    new TokenCounter { def tokens(t: String): Seq[String] = WordPiece.tokenize(t, vocab) }
  }

  private lazy val tiers: Seq[(String, TokenCounter)] = Seq(
    "whitespace" -> TokenCounter.Whitespace,
    "pretoken" -> TokenCounter.Pretoken,
    "bpe-trained" -> trainedBpe,
    "wordpiece-30k" -> TokenCounter.BundledWordPiece,
    "wordpiece-trained" -> trainedWp)

  private def fertility(tier: TokenCounter, ds: Seq[String]): Double = {
    val (sub, words) = ds.map(d =>
      (tier.count(d), TokenCounter.Whitespace.count(d))).unzip
    sub.sum.toDouble / words.sum
  }

  test("fertility per tier and language stays in the calibration band") {
    for ((lang, ds) <- Seq("de" -> docs(de), "fr" -> docs(fr), "it" -> docs(it))) {
      for ((name, tier) <- tiers) {
        val f = fertility(tier, ds)
        println(f"DIVERGENCE fertility lang=$lang tier=$name: $f%.3f")
        assert(f >= 1.0, s"$lang/$name: subword tokenization cannot shrink below words")
        assert(f <= 3.5, s"$lang/$name: fertility $f out of the plausible BERT-family band")
      }
      // subword tiers must be finer than whitespace on legal prose
      assert(fertility(TokenCounter.BundledWordPiece, ds) > 1.05)
    }
    // the OUT-OF-DOMAIN hazard, quantified (not banded): the tiny
    // synthetic-corpus BPE table shatters unseen legal prose — the
    // reason cutoffs must be recalibrated whenever the counting vocab
    // changes domain
    val ood = fertility(TokenCounter.BundledBpe, docs(de) ++ docs(fr) ++ docs(it))
    println(f"DIVERGENCE fertility out-of-domain bundled-bpe: $ood%.3f")
    assert(ood > 3.5, "an out-of-domain vocab SHOULD shatter (this is the hazard)")
  }

  test("quantile-mapped cutoff decisions agree across counting currencies") {
    val all = docs(de) ++ docs(fr) ++ docs(it)
    def median(xs: Seq[Int]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val decisions: Seq[(String, Seq[Boolean])] = tiers.map { case (name, tier) =>
      val counts = all.map(tier.count)
      val m = median(counts)
      name -> counts.map(_ >= m)
    }
    for (Seq((a, da), (b, db)) <- decisions.combinations(2)) {
      val agree = da.zip(db).count { case (x, y) => x == y }.toDouble / da.size
      println(f"DIVERGENCE cutoff-agreement $a vs $b: $agree%.3f")
      assert(agree >= 0.8,
        s"$a vs $b: a quantile-mapped cutoff should classify >=80% of docs identically")
    }
  }

  test("wordpiece never drops content: detokenized length is preserved") {
    for (d <- docs(de) ++ docs(fr) ++ docs(it)) {
      val toks = TokenCounter.BundledWordPiece.tokens(d)
      assert(!toks.contains("[UNK]"),
        "trilingual legal prose must be coverable by the bundled 30k vocab")
      val rebuilt = toks.map(_.stripPrefix("##")).mkString
      val bare = WordPiece.basicTokens(d).mkString
      assert(rebuilt == bare, "wordpiece is a partition of the basic tokens")
    }
  }
}
