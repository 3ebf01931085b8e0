package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MinHashLSH.incrementalDedup — the persisted-index batch dedup (gate
  * d13). Driven with explicit band frames so the collision topology is
  * exact: corpus owns buckets A and B; the batch brings one corpus dup,
  * one within-batch dup pair, and one clean doc.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private def corpusBands = Seq(
    (1L, 0, "A"),
    (2L, 0, "B"),
  ).toDF("doc_id", "band", "h")

  // 10 collides with corpus bucket A; 11/12 share the fresh bucket C
  // (keep-first: 11 admitted, 12 within-batch dup); 13 is clean
  private def batchBands = Seq(
    (10L, 0, "A"),
    (11L, 0, "C"),
    (12L, 0, "C"),
    (13L, 0, "D"),
  ).toDF("doc_id", "band", "h")

  private def freshIndex(): String = {
    val dir = graft.queries.Scratch.dir("inc_dedup_").resolve("idx").toString
    corpusBands.write.parquet(dir)
    dir
  }

  private def verdicts(df: org.apache.spark.sql.DataFrame): Map[Long, (Boolean, Boolean, Boolean)] =
    df.collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap

  test("batch verdicts: corpus dup, keep-first within batch, clean admit") {
    val idx = freshIndex()
    val v = verdicts(MinHashLSH.incrementalDedup(batchBands, "doc_id", idx))
    assert(v(10L) === ((true, false, false)))
    assert(v(11L) === ((false, false, true)))
    assert(v(12L) === ((false, true, false)))
    assert(v(13L) === ((false, false, true)))
  }

  test("append maintains the index: admitted bands land, nothing else") {
    val idx = freshIndex()
    MinHashLSH.incrementalDedup(batchBands, "doc_id", idx).collect()
    val after = spark.read.parquet(idx).select("doc_id").distinct()
      .as[Long].collect().toSet
    // corpus docs + the two admitted batch docs; dups 10/12 NOT indexed
    assert(after === Set(1L, 2L, 11L, 13L))
  }

  test("replaying the same batch after the append admits nothing") {
    val idx = freshIndex()
    MinHashLSH.incrementalDedup(batchBands, "doc_id", idx).collect()
    val v = verdicts(MinHashLSH.incrementalDedup(batchBands, "doc_id", idx))
    // THE replay invariant: at-least-once redelivery cannot
    // double-ingest — nothing is admitted on the second pass
    assert(v.values.forall(_._3 === false))
    // on THIS topology every doc also reads dup_of_corpus (11/13 hit
    // their own appended bands, 12 hits 11's bucket C, 10 still hits
    // A) — fixture-specific, NOT the general invariant (see below)
    assert(v.values.forall(_._1 === true))
  }

  test("replay counterexample: a doc whose only partner was rejected replays as dup_in_batch") {
    // corpus owns A; batch doc 10 = {A, C} (corpus dup), doc 11 = {C}
    // (within-batch dup of the REJECTED 10). Nothing is admitted, so
    // nothing appends — on replay 11 is still dup_in_batch, NOT
    // dup_of_corpus. `admitted`, not `dup_of_corpus`, is the replay
    // signal a consumer must key on.
    val idx = graft.queries.Scratch.dir("inc_dedup_cx_").resolve("idx").toString
    Seq((1L, 0, "A")).toDF("doc_id", "band", "h").write.parquet(idx)
    val batch = Seq((10L, 0, "A"), (10L, 0, "C"), (11L, 0, "C"))
      .toDF("doc_id", "band", "h")
    val first = verdicts(MinHashLSH.incrementalDedup(batch, "doc_id", idx))
    assert(first(10L) === ((true, false, false)))
    assert(first(11L) === ((false, true, false)))
    val replay = verdicts(MinHashLSH.incrementalDedup(batch, "doc_id", idx))
    assert(replay === first)
    assert(replay.values.forall(_._3 === false))
  }

  test("appendAdmitted=false probes without mutating the index") {
    val idx = freshIndex()
    MinHashLSH.incrementalDedup(batchBands, "doc_id", idx,
      appendAdmitted = false).collect()
    assert(spark.read.parquet(idx).select("doc_id").distinct()
      .as[Long].collect().toSet === Set(1L, 2L))
  }

  test("maintenance cost tracks the batch: corpus is never re-read for verdicts") {
    // the index probe must keep the batch side broadcast — the plan
    // may not shuffle the index scan (exchange on the big side would
    // be the 100 TB killer)
    val idx = freshIndex()
    // the gate result is a LogicalRDD wrapper (cache-decoupling, see
    // incrementalDedup), so assert on the LAZY verdict plan behind it
    val res = MinHashLSH.incrementalVerdictPlan(
      batchBands, "doc_id", spark.read.parquet(idx))
    val p = res.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast probe of the persisted index, got:\n$p")
  }
}
