package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Model-based fuzz for the SCD2 sink: random batch sequences applied
  * both to the real sink and to a driver-side reference model; after
  * every batch the full history must equal the model and satisfy the
  * SCD2 invariants (≤1 live row per key, intervals sane, change-only
  * versioning).
  */
class Scd2PropSpec extends SparkSpec {

  case class HistRow(id: Long, v: String, from: Long, to: Option[Long])

  test("random batch sequences: history equals the reference model") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5CD2)
    val path = java.nio.file.Files.createTempDirectory("scd2prop")
      .resolve("t").toString
    // driver-side model: key -> list of versions
    val model = collection.mutable.Map.empty[Long, List[HistRow]]
    for (version <- 1L to 12L) {
      val keys = rnd.shuffle((0L until 8L).toList).take(1 + rnd.nextInt(5))
      val batch = keys.map(k => (k, s"v${rnd.nextInt(3)}")) // small value space → real no-ops
      // model update (change-only semantics)
      for ((k, v) <- batch) {
        val hist = model.getOrElse(k, Nil)
        hist.find(_.to.isEmpty) match {
          case Some(live) if live.v == v => () // unchanged: no write
          case Some(live) =>
            model(k) = HistRow(k, v, version, None) ::
              hist.map(h => if (h.to.isEmpty) h.copy(to = Some(version)) else h)
          case None =>
            model(k) = HistRow(k, v, version, None) :: hist
        }
      }
      Sinks.scd2Upsert(batch.toDF("id", "v"), path, "id", version, numBuckets = 4)
      if (version % 3 == 0) // replay some batches: must be a no-op
        Sinks.scd2Upsert(batch.toDF("id", "v"), path, "id", version, numBuckets = 4)

      val got = Sinks.readUpserted(spark, path)
        .select("id", "v", "valid_from", "valid_to").collect()
        .map(r => HistRow(r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val expect = model.values.flatten.toSet
      assert(got == expect, s"after batch $version")
      // invariants straight off the table
      val byKey = got.groupBy(_.id)
      for ((k, rows) <- byKey) {
        assert(rows.count(_.to.isEmpty) <= 1, s"key $k has multiple live rows")
        for (r <- rows; t <- r.to) assert(t > r.from, s"key $k empty/negative interval")
        // closed intervals don't overlap: sort by from, each to <= next from
        val sorted = rows.toSeq.sortBy(_.from)
        for (Seq(a, b) <- sorted.sliding(2) if sorted.size > 1)
          assert(a.to.forall(_ <= b.from), s"key $k overlapping versions")
      }
    }
  }

  test("retention at increasing horizons: table equals the filtered model, as-of above the horizon unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5CD3)
    val path = java.nio.file.Files.createTempDirectory("scd2ret")
      .resolve("t").toString
    val model = collection.mutable.Map.empty[Long, List[HistRow]]
    for (version <- 1L to 10L) {
      val keys = rnd.shuffle((0L until 6L).toList).take(1 + rnd.nextInt(4))
      val batch = keys.map(k => (k, s"v${rnd.nextInt(3)}"))
      for ((k, v) <- batch) {
        val hist = model.getOrElse(k, Nil)
        hist.find(_.to.isEmpty) match {
          case Some(live) if live.v == v => ()
          case Some(_) =>
            model(k) = HistRow(k, v, version, None) ::
              hist.map(h => if (h.to.isEmpty) h.copy(to = Some(version)) else h)
          case None => model(k) = HistRow(k, v, version, None) :: hist
        }
      }
      Sinks.scd2Upsert(batch.toDF("id", "v"), path, "id", version, numBuckets = 4)
    }
    def asOfModel(rows: Set[HistRow], v: Long): Set[(Long, String)] =
      rows.filter(r => r.from <= v && r.to.forall(_ > v)).map(r => (r.id, r.v))
    val full = model.values.flatten.toSet
    for (horizon <- Seq(2L, 5L, 5L, 8L)) { // repeated horizon = idempotence
      Sinks.scd2Retention(spark, path, horizon)
      val kept = full.filter(r => r.to.forall(_ > horizon))
      val got = Sinks.readUpserted(spark, path)
        .select("id", "v", "valid_from", "valid_to").collect()
        .map(r => HistRow(r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      assert(got == kept, s"horizon $horizon: retained set diverges from model")
      // every as-of at or above the horizon must be unchanged
      for (v <- horizon to 10L) {
        val gotAsOf = Sinks.scd2AsOf(spark, path, v)
          .select("id", "v").as[(Long, String)].collect().toSet
        assert(gotAsOf == asOfModel(full, v), s"as-of $v after retention at $horizon")
      }
    }
  }
}
