package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HammingLSHSpec extends SparkSpec {

  private def brute(rows: Seq[(Long, Long)], radius: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= radius
    } yield (ia, ib, d)).toSet

  private def banded(rows: Seq[(Long, Long)], bits: Int, bands: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    HammingLSH.nearDupPairs(rows.toDF("doc_id", "h"), "doc_id", "h", bits, bands)
      .as[(Long, Long, Int)].collect().toSet
  }

  test("banded join equals brute force at radius bands-1 (pigeonhole)") {
    // handcrafted boundary cases around radius 3 on a 48-bit hash:
    //  - 1↔2 identical (h=0);  1↔3 h=3 spread over 3 bands (worst case
    //    that still keeps one band intact);  1↔4 h=4 each band touched
    //    (must be EXCLUDED and is also invisible to the band join);
    //  - 5 shares band 0 with 1 but is far overall (candidate that the
    //    popcount filter must reject).
    val base = 0x0000F0F0F0F0L
    val rows = Seq(
      1L -> base,
      2L -> base,
      3L -> (base ^ 0x000000000001L ^ 0x000000001000L ^ 0x000001000000L),
      4L -> (base ^ 0x000000000001L ^ 0x000000001000L ^ 0x000001000000L ^ 0x001000000000L),
      5L -> (base ^ 0xFFFFFF000000L),
      6L -> (base ^ 0x000000000003L), // h=2 from 1, single band
    )
    val got = banded(rows, 48, 4)
    assert(got == brute(rows, 3))
    assert(got.contains((1L, 2L, 0)))
    assert(got.contains((1L, 3L, 3)))
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 4L) })
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 5L) })
    assert(got.contains((1L, 6L, 2)))
  }

  test("randomized: banded == brute on 64-bit hashes, 8 bands (radius 7)") {
    val rnd = new scala.util.Random(42)
    // cluster structure: 30 seeds, each with 0-3 mutated copies
    val rows = (0 until 30).flatMap { i =>
      val seed = rnd.nextLong() & 0x7fffffffffffffffL
      (0 to rnd.nextInt(4)).map { j =>
        var h = seed
        (0 until rnd.nextInt(10)).foreach(_ => h ^= (1L << rnd.nextInt(63)))
        (i * 10L + j, h & 0x7fffffffffffffffL)
      }
    }
    assert(banded(rows, 64, 8) == brute(rows, 7))
  }

  test("stray bits above `bits` are masked off (contract enforced, not just documented)") {
    import spark.implicits._
    // ids 1/2 agree on the low 48 bits; id 2 carries garbage above bit
    // 47. Without the defensive mask the banding would pair them while
    // the popcount counted the high-bit difference — a silently missed
    // pair. With the mask both see only the low 48 bits: exact match.
    val rows = Seq(1L -> 0x0000ABCD1234L, 2L -> (0x0000ABCD1234L | (0xFFL << 48)))
    val out = HammingLSH.nearDupPairs(rows.toDF("doc_id", "h"), "doc_id", "h",
      bits = 48, bands = 4).as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 0)))
  }

  test("multi-band matches collapse to one pair row") {
    import spark.implicits._
    val rows = Seq(1L -> 7L, 2L -> 7L) // identical → all 4 bands match
    val out = HammingLSH.nearDupPairs(rows.toDF("doc_id", "h"), "doc_id", "h")
      .collect()
    assert(out.length == 1)
  }
}
