package graft.extract

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** F36 offline gender enrichment: preprocess_names parity + the
  * broadcast enrichment join in CorpusPipeline.people.
  */
class GenderLookupSpec extends SparkSpec {

  test("firstNameOf follows the reference's preprocess_names") {
    import PeopleExtractors.firstNameOf
    assert(firstNameOf("Hans Meier") == Some("Hans"))
    assert(firstNameOf("Meier") == Some("Meier"))
    assert(firstNameOf("J. Schneider") == Some("Schneider")) // initial skipped
    assert(firstNameOf("Dr. Anna Keller") == Some("Anna")) // title skipped
    assert(firstNameOf("dott. Luca Bernasconi") == Some("Luca"))
    assert(firstNameOf("  ") == None)
    assert(firstNameOf(null) == None)
  }

  test("lookup table resolves common de/fr/it names, unknowns stay None") {
    import PeopleExtractors.genderForName
    assert(genderForName("Hans Meier") == Some("m"))
    assert(genderForName("Marie Dubois") == Some("f"))
    assert(genderForName("PIERRE Favre") == Some("m")) // case-insensitive
    assert(genderForName("Zzyzx Unknown") == None)
  }

  test("pipeline people stage: role-context gender wins, table fills the rest") {
    import spark.implicits._
    // 'juge' is gender-neutral -> parser leaves None -> the broadcast
    // table fills it; the clerk's suffix ('Greffière') is authoritative
    val sectioned = Seq(
      ("d1", "Composition: juge Pierre Favre, juge Marie Dubois, Greffière Anna Keller"))
      .toDF("decision_id", "header")
    val out = CorpusPipelineTestAccess.people(spark, sectioned)
      .select("role", "name", "gender").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out.contains(("judge", "Pierre Favre", "m")))
    assert(out.contains(("judge", "Marie Dubois", "f")))
    assert(out.exists { case (role, name, g) =>
      role == "clerk" && name.contains("Anna") && g == "f" })
  }
}

/** people() needs a sectioned frame with a header column; expose the
  * pipeline stage for the spec.
  */
object CorpusPipelineTestAccess {
  def people(spark: org.apache.spark.sql.SparkSession,
             sectioned: org.apache.spark.sql.DataFrame) =
    graft.pipeline.CorpusPipeline.people(spark, sectioned)
}
