package graft.relational

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.MiniCorpus

class DecisionJoinsSpec extends SparkSpec {

  lazy val in = DecisionJoins.miniCorpus(spark)
  lazy val wide = DecisionJoins.wide(in).cache()

  test("wide keeps exactly one row per decision (the len== invariant)") {
    assert(wide.count() == MiniCorpus.nDecisions)
    assert(wide.select("decision_id").distinct().count() == MiniCorpus.nDecisions)
  }

  test("dimension chain resolves language, court and canton") {
    val row = wide.where(col("decision_id") === MiniCorpus.decisionId(0))
      .select("iso_code", "court_string", "short_code").collect().head
    assert(row.getString(0) == "de")
    assert(row.getString(1) == "CH_BGer")
    assert(row.getString(2) == "CH")
  }

  test("aggregate-joins attach children as arrays; absent children are null") {
    val c = wide.select(col("decision_id"), size(col("sections")).as("ns"),
      col("citations"), col("file_numbers")).collect()
    assert(c.forall(_.getInt(1) == 3)) // every decision has 3 sections
    // i % 4 == 0 decisions have zero citations → null array
    val noCite = wide.where(col("decision_id") === MiniCorpus.decisionId(4))
      .select(col("citations")).collect().head
    assert(noCite.isNullAt(0))
    // i % 6 == 0 → two file numbers
    val twoFn = wide.where(col("decision_id") === MiniCorpus.decisionId(6))
      .select(size(col("file_numbers"))).collect().head
    assert(twoFn.getInt(0) == 2)
  }

  test("multi-judgment decisions carry both outcomes") {
    val j = wide.where(col("decision_id") === MiniCorpus.decisionId(11))
      .select(expr("transform(judgments, x -> x.judgment)")).collect().head
    assert(j.getSeq[String](0).toSet ==
      Set("partial_approval", "partial_dismissal"))
  }

  test("date splits are all non-empty and NULL dates survive") {
    val bySplit = wide.withColumn("split",
        when(col("year") <= 2015, "train")
          .when(col("year") <= 2017, "validation")
          .when(col("year") <= 2022, "test")
          .when(col("year").isNotNull, "secret_test")
          .otherwise("undated"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("train", "validation", "test", "secret_test", "undated")
      .forall(bySplit.getOrElse(_, 0L) > 0))
  }

  test("sectionPivot gives facts/rulings per decision without a self-join") {
    val p = DecisionJoins.sectionPivot(in.sections)
    assert(p.count() == MiniCorpus.nDecisions)
    val r = p.where(col("decision_id") === MiniCorpus.decisionId(3))
      .select("facts", "rulings").collect().head
    assert(r.getString(0).startsWith("Sachverhalt"))
    assert(r.getString(1) == "Die Beschwerde wird abgewiesen.")
  }
  test("party and judicial-person map-joins attach one array per decision") {
    // one row per decision regardless of child cardinality (the
    // reference's len(file_df) == len(df) invariant)
    assert(wide.count() == in.decisions.count())
    import org.apache.spark.sql.functions._
    // decisions with i % 8 == 0 have NO party rows → null array
    assert(wide.where(col("parties").isNull).count() ==
      in.decisions.count() - in.parties.select("decision_id").distinct().count())
    // everyone else carries both parties, sorted by type id
    val two = wide.where(col("parties").isNotNull)
    assert(two.where(size(col("parties")) =!= 2).count() == 0)
    assert(two.selectExpr("parties[0].party_type_id").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(1))
    // judicial people: every decision has exactly one president
    assert(wide.where(expr(
      "size(filter(judicial_people, p -> p.is_president)) != 1")).count() == 0)
    assert(wide.selectExpr("judicial_people[0].name").first().getString(0)
      .startsWith("Richter"))
  }
}
