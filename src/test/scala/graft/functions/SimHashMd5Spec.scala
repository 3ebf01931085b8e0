package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native simhash_md5 must be bit-identical to the interpreted
  * higher-order-lambda SQL formulation it replaced in d4 — checked over
  * random token arrays including empties, repeats, unicode, and
  * single-token docs.
  */
class SimHashMd5Spec extends SparkSpec {

  private val sqlFormulation =
    """aggregate(sequence(0, 31), cast(0 as bigint), (acc, b) -> acc +
       IF(aggregate(transform(w, x -> cast(conv(substring(md5(x), 25, 8), 16, 10) as bigint)),
            cast(0 as bigint), (a, h) -> a + (((h >> b) & 1) * 2 - 1)) > 0,
          shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"""

  test("native expression equals the SQL lambda formulation on random inputs") {
    import spark.implicits._
    graft.GraftExtensions.registerNative(spark)
    val rnd = new scala.util.Random(0x51AA)
    val vocab = Vector("Urteil", "Beschwerde", "gericht", "zürich", "Art.", "123",
      "œuvre", "für", "a", "b", "", "der", "die", "das")
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    } :+ ((0L, Seq.empty[String]))
    val df = docs.toDF("id", "w")
      .select(col("id"), expr("simhash_md5(w)").as("native"),
        expr(sqlFormulation).as("lambda"))
    val bad = df.where(col("native") =!= col("lambda")).collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("empty and null arrays vote no bits") {
    import spark.implicits._
    graft.GraftExtensions.registerNative(spark)
    val df = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("id", "w")
      .select(col("id"), expr("simhash_md5(w)").as("h"))
    val rows = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(rows(1L) == 0L)
    assert(rows(2L) == null) // null-safe eval propagates null input
  }
}
