package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WordNgramsSpec extends SparkSpec {

  private def grams(words: Seq[String], n: Int): Seq[String] = {
    graft.GraftExtensions.registerNative(spark)
    import spark.implicits._
    Seq(Tuple1(words)).toDF("w")
      .select(expr(s"word_ngrams(w, $n)").as("g"))
      .collect()(0).getSeq[String](0)
  }

  test("matches the lambda formulation on the normal path") {
    graft.GraftExtensions.registerNative(spark)
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", "b", "c", "d"))).toDF("w")
    val native = df.select(expr("word_ngrams(w, 3)")).collect()(0).getSeq[String](0)
    val lambda = df.select(expr(
      "transform(sequence(0, size(w) - 3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"))
      .collect()(0).getSeq[String](0)
    assert(native == lambda && native == Seq("a b c", "b c d"))
  }

  test("fewer than n words yields an empty array (not null-concat grams)") {
    assert(grams(Seq("a", "b"), 3).isEmpty)
    assert(grams(Seq.empty, 3).isEmpty)
  }

  test("n <= 0 from SQL yields an empty array, never an exception") {
    // SQL-registered function: any query can pass a non-positive n
    // (previously NegativeArraySizeException from the 2n-1 parts array)
    assert(grams(Seq("a", "b", "c"), 0).isEmpty)
    assert(grams(Seq("a", "b", "c"), -1).isEmpty)
  }

  test("n = 1 returns the words themselves") {
    assert(grams(Seq("x", "y"), 1) == Seq("x", "y"))
  }

  private def charGrams(text: String, n: Int): Seq[String] = {
    graft.GraftExtensions.registerNative(spark)
    import spark.implicits._
    Seq(Tuple1(text)).toDF("t")
      .select(expr(s"char_ngrams(t, $n)").as("g"))
      .collect()(0).getSeq[String](0)
  }

  test("char_ngrams matches the lambda substring formulation, incl. multibyte") {
    graft.GraftExtensions.registerNative(spark)
    import spark.implicits._
    for (t <- Seq("abcdef", "Gericht säumt ihre Begründung", "ÄÖÜ€ßé", "ab")) {
      val df = Seq(Tuple1(t)).toDF("t")
      val native = df.select(expr("char_ngrams(t, 3)")).collect()(0).getSeq[String](0)
      val lambda = df.select(expr(
        "CASE WHEN length(t) < 3 THEN array() ELSE transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)) END"))
        .collect()(0).getSeq[String](0)
      assert(native == lambda, s"text=$t")
    }
    assert(charGrams("abc", 3) == Seq("abc"))
    assert(charGrams("ab", 3).isEmpty)
    assert(charGrams("abc", 0).isEmpty && charGrams("abc", -2).isEmpty)
    assert(charGrams("é€ß", 1) == Seq("é", "€", "ß"), "code-point, not byte, semantics")
  }
}
