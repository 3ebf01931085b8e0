package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md currency gate (VERDICT r11 directive 2 — the regen ran
  * early in rounds 10 AND 11, leaving new gates without plan
  * evidence): the committed PLANS.md must carry a `## <gate>` section
  * for EVERY entry in PlanDump.headline, and every gate on the
  * enforced sf1 surface must have a plan-evidence decision (headline
  * or an exclusion reason). Adding a gate to the headline list (or the
  * enforced surface) without regenerating PLANS.md now fails `sbt
  * test` instead of surfacing in the next verdict. No Spark session —
  * this is a pure file/listing check.
  */
class PlansCurrencySpec extends AnyFunSuite {

  test("every headline gate has a PLANS.md section") {
    val plans = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")), java.nio.charset.StandardCharsets.UTF_8)
    val missing = PlanDump.headline.filterNot(g => plans.contains(s"## $g\n"))
    assert(missing.isEmpty,
      s"PLANS.md is stale — regenerate with `runMain graft.tools.PlanDump` " +
        s"(missing sections: ${missing.mkString(", ")})")
  }

  test("PLANS.md was dumped from the CURRENT source (content fingerprint)") {
    // the round-13 staleness class: PLANS.md regenerated, then a later
    // source commit changed a dumped plan's typing — section presence
    // passed while the dumped content was stale. The dump embeds a
    // SHA-256 over all main-source file contents; any source edit after
    // the dump fails here until `runMain graft.tools.PlanDump` reruns.
    val plans = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")), java.nio.charset.StandardCharsets.UTF_8)
    val want = s"Source fingerprint: ${PlanDump.sourceFingerprint()}"
    assert(plans.contains(want),
      "PLANS.md predates the current main source — regenerate with " +
        "`runMain graft.tools.PlanDump` after the last source change " +
        s"(expected '$want')")
  }

  test("every enforced gate has a plan-evidence decision") {
    val undecided = Sf1Probe.gates
      .filterNot(g => PlanDump.headline.contains(g) || PlanDump.excluded.contains(g))
    assert(undecided.isEmpty,
      s"enforced gates with no plan-evidence decision: ${undecided.mkString(", ")}")
  }

  test("headline and exclusions reference real gates, with no overlap") {
    val known = graft.SparkEntry.queries.keySet
    val ghostH = PlanDump.headline.filterNot(known)
    val ghostE = PlanDump.excluded.keys.filterNot(known)
    assert(ghostH.isEmpty && ghostE.isEmpty,
      s"plan lists name unregistered gates: ${(ghostH ++ ghostE).mkString(", ")}")
    val overlap = PlanDump.headline.toSet intersect PlanDump.excluded.keySet
    assert(overlap.isEmpty, s"gates both dumped and excluded: ${overlap.mkString(", ")}")
  }
}
