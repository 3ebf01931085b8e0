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
}
