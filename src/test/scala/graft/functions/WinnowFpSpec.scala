package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** winnow_fp must be bit-identical to the interpreted SQL formulation
  * it replaced in d7 — checked over random strings including multibyte
  * unicode (SQL substring counts CHARACTERS, so the native path must
  * too), strings shorter than the k-gram, and the <4-hash edge.
  */
class WinnowFpSpec extends SparkSpec {

  private val sqlFormulation =
    """IF(size(h) < 4, array_distinct(h),
       array_distinct(transform(sequence(0, size(h) - 4),
         i -> array_min(slice(h, i + 1, 4)))))"""
  private val hFormulation =
    """IF(length(text) < 5, array(),
       transform(sequence(0, length(text) - 5),
         i -> cast(conv(substring(md5(substring(text, i + 1, 5)), 25, 8),
                        16, 10) as bigint)))"""

  test("native equals the SQL lambda formulation on random inputs") {
    import spark.implicits._
    graft.GraftExtensions.registerNative(spark)
    val rnd = new scala.util.Random(0xF1B)
    val alphabet = "abc déü.êßλ中 XY"
    val docs = (1 to 120).map { i =>
      (i.toLong, (0 until rnd.nextInt(200)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    } ++ Seq((200L, ""), (201L, "abcd"), (202L, "abcde"), (203L, "abcdefg"))
    val df = docs.toDF("id", "text")
      .withColumn("h", expr(hFormulation))
      .select(col("id"), expr("winnow_fp(text)").as("native"),
        expr(sqlFormulation).as("lambda"))
    val bad = df.where(not(col("native") <=> col("lambda"))).collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }
}
