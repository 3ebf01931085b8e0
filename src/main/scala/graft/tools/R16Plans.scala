package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-16 plan evidence: dump `.explain("formatted")` for the named
  * gates into plans/r16/<gate>_<tag>.txt (tag = before/after, from
  * args(0)) — the R15Plans discipline for this round's touched gates
  * (the judge checks plan claims against these files).
  *
  * Usage: runMain graft.tools.R16Plans <tag> <gate> [gate...]
  */
object R16Plans {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val gates = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get("plans/r16"))
    val queries = graft.SparkEntry.queries
    for (name <- gates; fn <- queries.get(name)) {
      val df = fn(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // run it so AQE's final plan is also available as evidence
      df.count()
      val executed = df.queryExecution.executedPlan.toString
      val body = s"== $name ($tag) ==\n\n-- explain(formatted), pre-execution --\n" +
        formatted + "\n\n-- executed plan (AQE final) --\n" + executed
      Files.write(Paths.get(s"plans/r16/${name}_$tag.txt"),
        body.getBytes(StandardCharsets.UTF_8))
      println(s"wrote plans/r16/${name}_$tag.txt")
    }
    spark.stop()
  }
}
