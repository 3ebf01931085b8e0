package graft.functions

/** Byte-pair-encoding tokenization (F34's merge-table tier) — the real
  * BPE loop, not just the pretokenizer split: pretokenize with the
  * GPT-2 pattern, then repeatedly merge the lowest-ranked adjacent pair
  * until no pair is in the merge table (the GPT-2 `bpe()` algorithm;
  * reference counts BERT-tokenizer tokens per section,
  * abstract_preprocessor.py:256-298 — same merge-table family).
  *
  * The merge table is DATA in the standard GPT-2 `merges.txt` format
  * (`#version` header, one space-separated pair per line, rank = line
  * order), bundled at /graft/bpe_merges.txt and swappable for any
  * publicly distributed table of the same format — the counter is
  * pluggable per SURVEY §7.4. Pairs merge over word-internal character
  * sequences; whitespace never crosses a pretoken boundary.
  */
object Bpe {

  /** (left, right) → rank; lower rank merges first. */
  type Merges = Map[(String, String), Int]

  def parseMerges(lines: Iterator[String]): Merges = {
    val entries = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex
      .map { case (l, rank) =>
        // strict two-field split: a swapped-in table with annotation
        // columns must fail LOUDLY, not silently become dead entries
        // that inflate every downstream token count
        val sp = l.split("\\s+")
        require(sp.length == 2, s"malformed merge line: '$l'")
        (sp(0), sp(1)) -> rank
      }.toSeq
    // duplicate pairs keep their FIRST (best) rank
    entries.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
  }

  /** Bundled table, resolved from the classpath once per JVM (UDFs
    * reference it by name, nothing ships with the closure).
    */
  lazy val bundled: Merges = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "bundled merge table /graft/bpe_merges.txt missing")
    try parseMerges(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** The GPT-2 pretokenizer (without the trailing `\s+` branch — pure
    * whitespace runs carry no BPE tokens here; RE2-compatible, no
    * lookahead, so oracles can restate it).
    */
  private val pretoken =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+".r

  /** One word through the merge loop: start from characters, repeatedly
    * merge ALL occurrences of the lowest-ranked adjacent pair.
    */
  def encode(word: String, merges: Merges): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var toks: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && toks.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < toks.length - 1) {
        val p = (toks(i), toks(i + 1))
        val r = merges.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = p }
        i += 1
      }
      if (bestPair == null) done = true
      else {
        val nb = Vector.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == bestPair._1 && toks(j + 1) == bestPair._2) {
            nb += toks(j) + toks(j + 1)
            j += 2
          } else { nb += toks(j); j += 1 }
        }
        toks = nb.result()
      }
    }
    toks
  }

  /** Full text → BPE tokens: pretokenize, strip the GPT-2 leading-space
    * marker, merge per pretoken (merges never cross word boundaries).
    */
  def tokenize(text: String, merges: Merges): Seq[String] =
    if (text == null) Seq.empty
    else pretoken.findAllIn(text).flatMap(pt => encode(pt.stripPrefix(" "), merges)).toSeq

  /** Learn a merge table from a corpus: classic BPE training — count
    * adjacent pairs over the (word, frequency) vocabulary, greedily
    * take the most frequent pair (lexicographic tiebreak, so training
    * is deterministic), apply, repeat `numMerges` times. The output is
    * written/consumed in the same merges.txt rank order.
    */
  def train(words: Seq[String], numMerges: Int): Seq[(String, String)] = {
    val vocab = scala.collection.mutable.Map.empty[Vector[String], Long]
    for (w <- words; if w.nonEmpty)
      vocab.updateWith(w.map(_.toString).toVector)(c => Some(c.getOrElse(0L) + 1))
    val out = Seq.newBuilder[(String, String)]
    var n = 0
    var exhausted = false
    while (n < numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, c) <- vocab; i <- 0 until toks.length - 1)
        counts.updateWith((toks(i), toks(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        val updated = vocab.toSeq.map { case (toks, c) =>
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < toks.length) {
            if (j < toks.length - 1 && toks(j) == best._1 && toks(j + 1) == best._2) {
              nb += toks(j) + toks(j + 1)
              j += 2
            } else { nb += toks(j); j += 1 }
          }
          nb.result() -> c
        }
        vocab.clear()
        for ((t, c) <- updated) vocab.updateWith(t)(v => Some(v.getOrElse(0L) + c))
        n += 1
      }
    }
    out.result()
  }
}

/** Pluggable token counting (SURVEY §7.4): one interface, three tiers —
  * whitespace, GPT-2 pretokenizer, merge-table BPE. All pure Scala and
  * serializable, so any tier drops into a UDF or a driver-side config
  * (the P7 per-court cutoffs count tokens through whichever tier the
  * deployment calibrated against).
  */
trait TokenCounter extends Serializable {
  def tokens(text: String): Seq[String]
  def count(text: String): Int = tokens(text).size
}

object TokenCounter {
  /** plain whitespace split (t1's tier) */
  object Whitespace extends TokenCounter {
    def tokens(text: String): Seq[String] =
      if (text == null || text.isEmpty) Seq.empty
      else text.split(" ").toSeq
  }

  /** GPT-2 pretokenizer split, no merges (t9's tier) */
  object Pretoken extends TokenCounter {
    private val pat =
      "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+".r
    def tokens(text: String): Seq[String] =
      if (text == null) Seq.empty else pat.findAllIn(text).toSeq
  }

  /** merge-table BPE (t13's tier); merges by-name so executors resolve
    * the bundled table from their own classpath
    */
  object BundledBpe extends TokenCounter {
    def tokens(text: String): Seq[String] = Bpe.tokenize(text, Bpe.bundled)
  }

  /** WordPiece over the bundled BERT-format vocab (t16's tier) — the
    * family the reference's P7 cutoffs are calibrated in
    */
  object BundledWordPiece extends TokenCounter {
    def tokens(text: String): Seq[String] =
      WordPiece.tokenize(text, WordPiece.bundled)
  }
}
