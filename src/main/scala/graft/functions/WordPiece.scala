package graft.functions

/** WordPiece tokenization (F34's BERT-family tier) — greedy
  * longest-match-first subword segmentation over a vocab with `##`
  * continuation prefixes, the algorithm behind the BERT tokenizers the
  * reference counts tokens with (`abstract_preprocessor.py:286-288`
  * computes `num_tokens_bert = len(input_ids)`; `get_tokenizers`
  * loads cased German/French/Italian BERT models at `:304-310`). The
  * P7 length cutoffs (`dataset_creator.py:1160-1196`) are calibrated
  * in exactly these tokens.
  *
  * The vocab is DATA in the standard HuggingFace `vocab.txt` format
  * (one token per line, line order = id), bundled at
  * /graft/wordpiece_vocab.txt: 30 522 cased de/fr/it legal-domain
  * entries — the bert-base-cased family SIZE the reference loads —
  * generated deterministically by tools/gen_wordpiece_vocab.py
  * (curated legal/function head + morphology-driven tail; same
  * precedent as the bundled BPE merges). A production deployment
  * swaps the actual model's publicly distributed vocab.txt into the
  * same resource slot; the tokenizer is vocab-agnostic.
  *
  * Tokenization follows the reference pipeline's two stages:
  *   1. basic tokenization — whitespace split with every punctuation
  *      character split off as its own token (BERT BasicTokenizer;
  *      cased, matching the cased models the reference loads; control
  *      characters stripped; no CJK spacing — the corpus is de/fr/it);
  *   2. WordPiece — per word, repeatedly take the LONGEST prefix
  *      present in the vocab (continuations looked up with `##`);
  *      a word with no match at any position, or longer than
  *      `MaxInputCharsPerWord`, becomes `[UNK]`.
  *
  * `countWithSpecials` adds the [CLS]/[SEP] pair so counts compare
  * 1:1 with the reference's `len(input_ids)`.
  */
object WordPiece {

  val Unk = "[UNK]"
  val MaxInputCharsPerWord = 100

  def parseVocab(lines: Iterator[String]): Set[String] =
    lines.map(_.trim).filter(_.nonEmpty).toSet

  /** Bundled vocab, resolved from the classpath once per JVM (UDFs
    * reference it by name, nothing ships with the closure).
    */
  lazy val bundled: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/wordpiece_vocab.txt")
    require(in != null, "bundled vocab /graft/wordpiece_vocab.txt missing")
    try parseVocab(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** BERT punctuation: the four ASCII symbol ranges plus every Unicode
    * P-category character (BasicTokenizer._is_punctuation).
    */
  private def isPunct(c: Char): Boolean =
    (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
      (c >= 91 && c <= 96) || (c >= 123 && c <= 126) || {
        val t = Character.getType(c)
        t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
        t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
        t == Character.INITIAL_QUOTE_PUNCTUATION ||
        t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
      }

  private def isControl(c: Char): Boolean =
    c != '\t' && c != '\n' && c != '\r' &&
      (Character.isISOControl(c) || Character.getType(c) == Character.FORMAT)

  /** Stage 1: whitespace split with punctuation split off. */
  def basicTokens(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val cleaned = text.filterNot(isControl)
    val out = Seq.newBuilder[String]
    val buf = new StringBuilder
    def flush(): Unit = if (buf.nonEmpty) { out += buf.toString; buf.clear() }
    for (c <- cleaned) {
      if (Character.isWhitespace(c)) flush()
      else if (isPunct(c)) { flush(); out += c.toString }
      else buf += c
    }
    flush()
    out.result()
  }

  /** Stage 2: one word through greedy longest-match-first. */
  def encodeWord(word: String, vocab: Set[String]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    if (word.length > MaxInputCharsPerWord) return Seq(Unk)
    val out = Seq.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > start) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(sub)) found = sub else end -= 1
      }
      if (found == null) return Seq(Unk) // is_bad: whole word → [UNK]
      out += found
      start = end
    }
    out.result()
  }

  /** Full text → WordPiece tokens (no specials). */
  def tokenize(text: String, vocab: Set[String]): Seq[String] =
    basicTokens(text).flatMap(encodeWord(_, vocab))

  /** The reference's `num_tokens_bert` semantics: `len(input_ids)`
    * includes the [CLS] and [SEP] the tokenizer wraps every text with.
    */
  def countWithSpecials(text: String, vocab: Set[String]): Int =
    tokenize(text, vocab).size + 2

  val Specials: Seq[String] = Seq("[PAD]", Unk, "[CLS]", "[SEP]", "[MASK]")

  /** Learn a WordPiece vocab from a corpus (the builder tooling side
    * of the F34 tier, mirroring `Bpe.train`): HuggingFace's WordPiece
    * trainer is BPE with LIKELIHOOD scoring — start every word as
    * first-char + `##`-continuations, repeatedly merge the adjacent
    * pair with the highest `freq(ab) / (freq(a) * freq(b))` (ties
    * break lexicographically, so training is deterministic), each
    * merge contributing its joined token to the vocab, until
    * `vocabSize` entries or saturation (every word fully merged — a
    * corpus can only fill a vocab as far as its own diversity allows).
    * Output order: specials, then single units, then merges in
    * learned order — the standard `vocab.txt` shape.
    */
  def train(words: Seq[String], vocabSize: Int): Seq[String] = {
    def join(a: String, b: String): String = a + b.stripPrefix("##")
    val vocab = scala.collection.mutable.Map.empty[Vector[String], Long]
    for (w <- words; if w.nonEmpty) {
      val units = w.head.toString +: w.tail.map(c => "##" + c).toVector
      vocab.updateWith(units)(c => Some(c.getOrElse(0L) + 1))
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    Specials.foreach(out += _)
    vocab.keys.flatten.foreach(out += _)
    var done = out.size >= vocabSize
    while (!done) {
      val unitFreq = scala.collection.mutable.Map.empty[String, Long]
      val pairFreq = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, c) <- vocab) {
        for (t <- toks) unitFreq.updateWith(t)(v => Some(v.getOrElse(0L) + c))
        for (i <- 0 until toks.length - 1)
          pairFreq.updateWith((toks(i), toks(i + 1)))(v => Some(v.getOrElse(0L) + c))
      }
      if (pairFreq.isEmpty) done = true
      else {
        val best = pairFreq.keys.minBy { case (a, b) =>
          (-pairFreq((a, b)).toDouble / (unitFreq(a).toDouble * unitFreq(b)), a, b)
        }
        out += join(best._1, best._2)
        val updated = vocab.toSeq.map { case (toks, c) =>
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < toks.length) {
            if (j < toks.length - 1 && toks(j) == best._1 && toks(j + 1) == best._2) {
              nb += join(toks(j), toks(j + 1)); j += 2
            } else { nb += toks(j); j += 1 }
          }
          nb.result() -> c
        }
        vocab.clear()
        for ((t, c) <- updated) vocab.updateWith(t)(v => Some(v.getOrElse(0L) + c))
        if (out.size >= vocabSize) done = true
      }
    }
    out.toSeq.take(vocabSize)
  }
}
