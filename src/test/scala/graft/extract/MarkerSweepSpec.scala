package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The full-corpus sweep behind `x19_spider_sweep`: witness synthesis must
  * cover every ported (spider, language, section), and the engine's fold must
  * reproduce the construction-derived expectation for every pair.
  */
class MarkerSweepSpec extends AnyFunSuite {

  val cfg = MarkerConfigLoader.bundled

  test("sweep covers every ported spider/language pair") {
    val portedPairs = cfg.keySet.filter(_.contains("/"))
    assert(MarkerSweep.rows.size == portedPairs.size)
    assert(MarkerSweep.rows.map(r => s"${r.spider}/${r.lang}").toSet == portedPairs)
    assert(MarkerSweep.rows.map(_.spider).distinct.size >= 45)
  }

  test("every witness matches its own section marker") {
    for (r <- MarkerSweep.rows) {
      val table = cfg(s"${r.spider}/${r.lang}")
      for ((sec, pat) <- table if sec != "header") {
        val expected = r.expected(sec)
        assert(expected.nonEmpty, s"${r.spider}/${r.lang}.$sec has no witness")
        val witness = expected.split("\n").head
        assert(pat.findFirstIn(witness).isDefined,
          s"witness '$witness' fails ${r.spider}/${r.lang}.$sec: ${pat.regex}")
      }
    }
  }

  test("fold over every synthesized document reproduces the constructed expectation") {
    for (r <- MarkerSweep.rows) {
      val secs = Extractors.splitSections(r.spider, r.lang, r.paras, cfg)
      for (sec <- Extractors.sectionOrder) {
        val got = secs.getOrElse(sec, Seq.empty).mkString("\n")
        assert(got == r.expected(sec),
          s"${r.spider}/${r.lang}.$sec: got '$got' expected '${r.expected(sec)}'")
      }
    }
  }

  test("oracle VALUES sql is literal and covers all rows") {
    val sql = MarkerSweep.oracleSql
    assert(MarkerSweep.rows.forall(r => sql.contains(s"'${r.spider}'")))
    // no engine references — pure literals
    assert(!sql.toLowerCase.contains("from documents"))
  }

  test("witness synthesizer handles the corpus' regex subset") {
    // representative constructs from the ported corpus
    assert(MarkerWitness.witness("(?i)^sachverhalt\\b".r).contains("sachverhalt"))
    assert(MarkerWitness.witness("erkennt:?$".r).contains("erkennt"))
    assert(MarkerWitness.witness("[A,a]ufgrund".r).contains("Aufgrund"))
    assert(MarkerWitness.witness("a|b".r).contains("a"))
    assert(MarkerWitness.witness("x\\d+y".r).contains("x1y"))
    assert(MarkerWitness.witness("(foo|bar) baz".r).contains("foo baz"))
    assert(MarkerWitness.witness("a{2,3}b".r).contains("aab"))
    assert(MarkerWitness.witness("[^x]z".r).isDefined)
  }
}
