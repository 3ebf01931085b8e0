package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded LSH for HAMMING space over integer fingerprints (aHash /
  * SimHash family) — the image/near-dup sibling of MinHashLSH's
  * jaccard banding.
  *
  * Split a `bits`-wide hash into `bands` contiguous slices and
  * equi-join on (band index, slice value). By pigeonhole, any pair at
  * hamming distance ≤ bands-1 differs in at most bands-1 slices, so at
  * least one slice matches exactly — the banded candidate set followed
  * by an exact `bit_count(a ^ b) <= bands-1` filter is EXACTLY the
  * all-pairs result at that radius, while the join only ever compares
  * bucket-mates (candidate count tracks bucket occupancy, never n²).
  *
  * Scale: one narrow (id, hash) pass → 4-way explode → shuffle on the
  * slice value. Hot slices (constant image regions) are the same skew
  * class MinHashLSH.bucketCap handles; at the radii used here the
  * slice width (bits/bands ≥ 12 bits) keeps buckets small by
  * construction on real perceptual hashes.
  */
object HammingLSH {

  /** Exact near-dup pairs at hamming radius `bands - 1`.
    *
    * @param hashes (idCol: long, hashCol: long) — hash non-negative,
    *               meaningful in the low `bits` bits
    * @return (id_a, id_b, hamming) with id_a < id_b, hamming ≤ bands-1
    */
  def nearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   bits: Int = 48, bands: Int = 4): DataFrame = {
    require(bits % bands == 0, s"bits=$bits not divisible by bands=$bands")
    val width = bits / bands
    val mask = (1L << width) - 1
    val slices: Seq[Column] = (0 until bands).map(i =>
      shiftright(col(hashCol), i * width).bitwiseAND(lit(mask)))
    val banded = hashes
      .select(col(idCol).as("id"), col(hashCol).as("hash"),
        posexplode(array(slices: _*)).as(Seq("band", "band_val")))
    val a = banded.select(col("id").as("id_a"), col("hash").as("hash_a"),
      col("band"), col("band_val"))
    val b = banded.select(col("id").as("id_b"), col("hash").as("hash_b"),
      col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .where(col("id_a") < col("id_b"))
      // distinct BEFORE the popcount: multi-band matches collapse here
      .select("id_a", "id_b", "hash_a", "hash_b").distinct()
      .select(col("id_a"), col("id_b"),
        expr("cast(bit_count(hash_a ^ hash_b) as int)").as("hamming"))
      .where(col("hamming") <= bands - 1)
  }
}
