package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the Morton interleave bit-exactly, the layout's two-dimensional
  * pruning claim on a synthetic uniform grid, and write round-trip
  * exactness.
  */
class ZOrderSpec extends SparkSpec {

  test("morton interleaves bits: a at even positions, b at odd") {
    import spark.implicits._
    val rows = Seq((3L, 0L), (0L, 3L), (3L, 3L), (0b101L, 0b011L))
      .toDF("a", "b")
      .select(ZOrder.morton(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // spread(3)=0b101, spread(5)=0b10001, spread(3)<<1=0b1010
    assert(rows.toSeq == Seq(5L, 10L, 15L, 0b011011L))
  }

  test("layout prunes on BOTH dimensions of a uniform grid") {
    import spark.implicits._
    // 64×64 grid in scrambled input order — the layout must recover
    // spatial locality that the input order does not have
    val grid = spark.range(4096)
      .select((col("id") * 2654435761L % 4096).as("k"))
      .select((col("k") % 64).as("x"), expr("k div 64").as("y"))
    val dir = graft.queries.Scratch.dir("zorder_grid_").toString + "/g"
    ZOrder.writeLayout(grid, dir, "x", "y", 16)
    val boxes = ZOrder.fileBoxes(spark.read.parquet(dir), "x", "y").collect()
    assert(boxes.length >= 8)
    def hits(lo1: Long, hi1: Long, lo2: Long, hi2: Long): Int =
      boxes.count(r => !(r.getLong(2) < lo1 || r.getLong(1) > hi1 ||
        r.getLong(4) < lo2 || r.getLong(3) > hi2))
    // a 16-file Morton layout of a 64×64 grid is ~a 4×4 macro-grid:
    // one-eighth slabs on EITHER axis touch at most half the files —
    // the single-key-sorted counterfactual reads 100% on its non-sort
    // axis
    assert(hits(0, 7, 0, 63) * 2 <= boxes.length)
    assert(hits(0, 63, 0, 7) * 2 <= boxes.length)
    // and a small 2-D box touches very few
    assert(hits(0, 7, 0, 7) * 4 <= boxes.length)
  }

  test("writeLayout is an exact rewrite (no loss, no duplication)") {
    import spark.implicits._
    val df = spark.range(1000)
      .select(col("id").as("a"), (col("id") * 7 % 97).as("b"))
    val dir = graft.queries.Scratch.dir("zorder_rt_").toString + "/t"
    ZOrder.writeLayout(df, dir, "a", "b", 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.select("a", "b").except(df).isEmpty &&
      df.except(back.select("a", "b")).isEmpty)
  }
}
