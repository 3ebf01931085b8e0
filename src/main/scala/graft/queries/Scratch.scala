package graft.queries

/** Scratch dirs for gate/stream FIXTURES (staged landing files,
  * checkpoints, foreachBatch output dirs) — one place to point them at
  * fast storage via `SPARK_GRAFT_SCRATCH` (a deployment knob; RAM-backed
  * scratch was MEASURED to move nothing on this box — PERF.md — so the
  * default stays the JVM temp dir). Staged-events hardlinking requires
  * base and landing dirs on one filesystem, which routing everything
  * through this single base guarantees.
  */
object Scratch {
  private lazy val base: java.nio.file.Path =
    sys.env.get("SPARK_GRAFT_SCRATCH").map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))

  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(base, prefix)
}
