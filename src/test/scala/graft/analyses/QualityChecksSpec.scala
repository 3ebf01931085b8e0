package graft.analyses

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** QualityChecks properties: the fused report really is ONE pass over
  * the table, violation counts are exact on a fixture with known
  * defects, and edge inputs (empty table, quote in a check name)
  * don't break the stack expression.
  */
class QualityChecksSpec extends SparkSpec {

  import spark.implicits._

  test("all constraints fuse into a single scan of the table") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val rep = QualityChecks.report(li, Seq(
      QualityChecks.notNull("l_orderkey"),
      QualityChecks.inRange("l_quantity", 1.0, 50.0),
      QualityChecks.unique(Seq("l_orderkey", "l_linenumber"))))
    val scans = rep.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"fused report must scan once, saw $scans")
  }

  test("violation counts are exact on known defects") {
    val df = Seq(
      (Some(1L), 5.0), (Some(2L), -1.0), (None, 3.0), (Some(2L), 99.0)
    ).toDF("id", "x")
    val got = QualityChecks.report(df, Seq(
        QualityChecks.notNull("id"),
        QualityChecks.inRange("x", 0.0, 10.0),
        QualityChecks.unique(Seq("id"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("id not_null") == (1L, false))
    assert(got("x in_range[0.0,10.0]") == (2L, false))
    // 4 rows, countDistinct ignores nulls -> 2 distinct, so the null
    // row AND the duplicate both count as violations (a null key is
    // not a unique identifier)
    assert(got("id unique") == (2L, false))
  }

  test("empty table yields zero violations, all ok") {
    val df = Seq.empty[(Long, Double)].toDF("id", "x")
    val got = QualityChecks.report(df, Seq(
        QualityChecks.notNull("id"), QualityChecks.inRange("x", 0.0, 1.0)))
      .collect()
    assert(got.length == 2 && got.forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("refCheck counts orphans and broadcast-probes the dimension") {
    val fact = Seq((1L, "a"), (2L, "b"), (5L, "c")).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("dk", "dv")
    val row = QualityChecks.refCheck("fact.k ref dim", fact, "k", dim, "dk")
      .collect()(0)
    assert(row.getLong(1) == 1L && !row.getBoolean(2))
  }
}
