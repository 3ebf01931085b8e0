package graft.queries

import graft.SparkSpec

/** Round-16 internals: the scratch-dir registry/sweep (the measurement-
  * hygiene fix — gate stores used to leak forever and drift the FS-heavy
  * gates) and Sinks.awaitAllWrites' all-settled failure contract (ADVICE
  * r15 — the old fail-fast await unpersisted shared caches while sibling
  * writes still read them).
  */
class ScratchSweepSpec extends SparkSpec {

  test("sweep reclaims registered dirs and files; pinned dirs survive until sweepAll") {
    val d = Scratch.dir("graft_spec_sweep_")
    val f = Scratch.file("graft_spec_sweep_", ".txt")
    java.nio.file.Files.writeString(d.resolve("x.txt"), "x")
    val p = Scratch.pinnedDir("graft_spec_pin_")
    java.nio.file.Files.writeString(p.resolve("y.txt"), "y")
    Scratch.sweep()
    assert(!java.nio.file.Files.exists(d), "per-gate dir must be swept")
    assert(!java.nio.file.Files.exists(f), "per-gate file must be swept")
    assert(java.nio.file.Files.exists(p.resolve("y.txt")),
      "pinned dir must survive the per-gate sweep (memoized fixtures)")
    Scratch.sweepAll()
    assert(!java.nio.file.Files.exists(p), "sweepAll reclaims pinned dirs")
  }

  test("awaitAllWrites returns results in order on success") {
    val out = graft.sources.Sinks.awaitAllWrites(spark,
      Seq(() => 1, () => 2, () => 3))
    assert(out == Seq(1, 2, 3))
  }

  test("awaitAllWrites rethrows the root failure only after every thunk settled") {
    val bDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val boom = new RuntimeException("root failure")
    val thrown = intercept[RuntimeException] {
      graft.sources.Sinks.awaitAllWrites[Unit](spark, Seq(
        () => throw boom,
        () => { Thread.sleep(400); bDone.set(true) }))
    }
    assert(thrown.getMessage == "root failure",
      "the ROOT failure is rethrown, not a secondary cancellation")
    assert(bDone.get,
      "the call must not return (and a caller's finally must not run) " +
        "while a sibling thunk is still executing")
  }
}
