package graft.queries

/** Scratch dirs for gate/stream FIXTURES (staged landing files,
  * checkpoints, foreachBatch output dirs) — one place to point them at
  * fast storage via `SPARK_GRAFT_SCRATCH` (a deployment knob; RAM-backed
  * scratch was MEASURED to move nothing on this box — PERF.md — so the
  * default stays the JVM temp dir). Staged-events hardlinking requires
  * base and landing dirs on one filesystem, which routing everything
  * through this single base guarantees.
  *
  * EVERY dir is REGISTERED and reclaimed by [[sweep]] (round-16): the
  * gate stores were never deleted, so repeated bench/verify runs grew
  * the temp base without bound — measured 6.5k leaked dirs / 4.4 GB
  * after one round's measurement session, with the FS-heavy lifecycle
  * gates drifting 1.2–1.5× slower as the parent dir bloated (the
  * "ambient fs noise" the r15 notes kept hitting). The drivers call
  * sweep() OFF the timed clock — Bench after each gate's timing,
  * Verify/GateProfile per gate — so measurements run against a clean
  * temp base instead of the litter of every run before them.
  */
object Scratch {
  private lazy val base: java.nio.file.Path =
    sys.env.get("SPARK_GRAFT_SCRATCH").map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))

  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  def dir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(base, prefix)
    created.add(p)
    p
  }

  /** a registered scratch FILE (x24's reference-list fixture) — swept
    * with the dirs */
  def file(prefix: String, suffix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile(base, prefix, suffix)
    created.add(p)
    p
  }

  private val pinned =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  /** A scratch dir EXEMPT from the per-gate [[sweep]] — for fixtures
    * memoized across gates (stageEvents' staged-base bytes, keyed per
    * session): sweeping one of those under its memo broke every later
    * gate hardlinking from it. Reclaimed only by [[sweepAll]] at driver
    * end; a run leaks at most a handful of these.
    */
  def pinnedDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(base, prefix)
    pinned.add(p)
    p
  }

  /** End-of-driver reclamation: the per-gate registry plus the pinned
    * fixtures (whose memos die with the JVM anyway).
    */
  def sweepAll(): Unit = {
    sweep()
    var p = pinned.poll()
    while (p != null) {
      try deleteRecursively(p)
      catch { case scala.util.control.NonFatal(_) => () }
      p = pinned.poll()
    }
  }

  /** Delete every scratch dir this JVM has created (and registered)
    * since the last sweep. Callers invoke it only AFTER the frames
    * reading those stores are fully consumed (gates are independent and
    * each invocation creates fresh dirs, so a per-gate sweep can never
    * pull a store out from under a later gate). Failures are swallowed
    * per-path — reclamation must never fail a run.
    */
  def sweep(): Unit = {
    var p = created.poll()
    while (p != null) {
      try deleteRecursively(p)
      catch { case scala.util.control.NonFatal(_) => () }
      p = created.poll()
    }
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
  }
}
