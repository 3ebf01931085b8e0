package graft.analyses

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FundamentalImportanceSpec extends SparkSpec {

  test("sentences carry a search term; negation flags are consistent") {
    val sent = FundamentalImportance.sentences(spark, sfDir).cache()
    assert(sent.count() > 0)
    val noTerm = sent.where(
      FundamentalImportance.searchTerms.map(t => !col("sentence").contains(t))
        .reduce(_ && _))
    assert(noTerm.count() == 0)
    val wrongFlag = sent.where(col("negated") =!=
      FundamentalImportance.negationWords.map(w => col("sentence").contains(w))
        .reduce(_ || _))
    assert(wrongFlag.count() == 0)
  }

  test("summary adds an All grand total equal to the sum of languages") {
    val sent = FundamentalImportance.sentences(spark, sfDir)
    val sum = FundamentalImportance.summary(sent).collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    val langs = sum.keys.map(_._1).filter(_ != "All")
    for (neg <- Seq(true, false)) {
      val perLang = langs.toSeq.map(l => sum.getOrElse((l, neg), 0L)).sum
      assert(sum.getOrElse(("All", neg), 0L) == perLang, s"neg=$neg")
    }
  }

  test("stratified sample is deterministic and bounded per stratum") {
    val sent = FundamentalImportance.sentences(spark, sfDir)
    val s1 = FundamentalImportance.sample(sent).collect().toSet
    val s2 = FundamentalImportance.sample(sent).collect().toSet
    assert(s1 == s2)
    val counts = FundamentalImportance.sample(sent)
      .groupBy("lang", "negated").count().collect().map(_.getLong(2))
    assert(counts.forall(_ <= 3))
  }
}
