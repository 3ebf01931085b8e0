package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The SCD2 pre-horizon read contract (gated k17): after retention,
  * reads below the horizon fail loudly; reads at or above it are
  * byte-identical to pre-retention; the marker is monotone and survives
  * the dir swaps of retention and compaction.
  */
class Scd2HorizonSpec extends SparkSpec {

  private def build(): String = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("scd2h")
      .resolve("t").toString
    Sinks.scd2Upsert((0L to 5L).map(i => (i, s"a$i")).toDF("id", "v"),
      path, "id", 1L, numBuckets = 4)
    Sinks.scd2Upsert(Seq((0L, "b0"), (1L, "b1")).toDF("id", "v"),
      path, "id", 2L, numBuckets = 4)
    Sinks.scd2Upsert(Seq((0L, "c0")).toDF("id", "v"),
      path, "id", 3L, numBuckets = 4)
    path
  }

  private def stateAt(path: String, v: Long): Map[Long, String] =
    Sinks.scd2AsOf(spark, path, v).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap

  test("pre-horizon asOf throws; at/above-horizon asOf is unchanged by retention") {
    val path = build()
    val at2 = stateAt(path, 2L)
    val at3 = stateAt(path, 3L)
    assert(stateAt(path, 1L) == (0L to 5L).map(i => i -> s"a$i").toMap)

    Sinks.scd2Retention(spark, path, horizon = 2L)
    assert(Sinks.retentionHorizon(spark, path).contains(2L))
    assert(stateAt(path, 2L) == at2, "asOf(horizon) must survive retention exactly")
    assert(stateAt(path, 3L) == at3)
    val e = intercept[IllegalStateException](Sinks.scd2AsOf(spark, path, 1L))
    assert(e.getMessage.contains("retention horizon"))
  }

  test("horizon is monotone: a lower retention never relaxes the guard") {
    val path = build()
    Sinks.scd2Retention(spark, path, horizon = 2L)
    Sinks.scd2Retention(spark, path, horizon = 1L) // vacuum no-op, guard stays at 2
    assert(Sinks.retentionHorizon(spark, path).contains(2L))
    intercept[IllegalStateException](Sinks.scd2AsOf(spark, path, 1L))
  }

  test("marker survives compaction's dir swap; a crashed marker write still guards") {
    val path = build()
    Sinks.scd2Retention(spark, path, horizon = 2L)
    Sinks.compactUpserted(spark, path)
    assert(Sinks.retentionHorizon(spark, path).contains(2L))
    intercept[IllegalStateException](Sinks.scd2AsOf(spark, path, 1L))

    // crash window: tmp written, final rename never happened — the
    // reader must still see the strictest horizon
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__retention.tmp")
    val out = fs.create(tmp, true)
    out.write("3".getBytes("UTF-8")); out.close()
    assert(Sinks.retentionHorizon(spark, path).contains(3L))
    intercept[IllegalStateException](Sinks.scd2AsOf(spark, path, 2L))
  }

  test("a table never retained has no horizon and serves every version") {
    val path = build()
    assert(Sinks.retentionHorizon(spark, path).isEmpty)
    assert(stateAt(path, 1L).nonEmpty)
  }
}
