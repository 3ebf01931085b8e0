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
  * slice value. Hot slices (constant image regions — e.g. a corpus of
  * near-uniform scans sharing one 12-bit band value) make the per-slice
  * self equi-join quadratic IN THAT BUCKET; the "never n²" bound is
  * per-bucket. The intended mitigation is the same as MinHashLSH's hot
  * path: this is a plain shuffle equi-join, exactly the shape AQE's
  * skew-join splits at runtime — no collect_list row ever aggregates a
  * bucket, so there is no single-task blowup to cap. At the radii used
  * here the slice width (bits/bands ≥ 12 bits) keeps buckets small by
  * construction on real perceptual hashes.
  */
object HammingLSH {

  /** Exact near-dup pairs at hamming radius `bands - 1`.
    *
    * The hash contract (meaningful in the low `bits` bits) is ENFORCED,
    * not just documented: inputs are masked to the low `bits` up front,
    * so a caller passing stray high bits gets the documented semantics
    * (banding and popcount both see only the low `bits`) instead of
    * silently missed pairs (banding would ignore high bits the popcount
    * counted).
    *
    * @param hashes (idCol: long, hashCol: long) — hash meaningful in
    *               the low `bits` bits (higher bits are masked off)
    * @return (id_a, id_b, hamming) with id_a < id_b, hamming ≤ bands-1
    */
  def nearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   bits: Int = 48, bands: Int = 4): DataFrame = {
    require(bits % bands == 0, s"bits=$bits not divisible by bands=$bands")
    val width = bits / bands
    val sliceMask = (1L << width) - 1
    val hashMask = if (bits < 64) (1L << bits) - 1 else -1L
    val slices: Seq[Column] = (0 until bands).map(i =>
      shiftright(col("hash"), i * width).bitwiseAND(lit(sliceMask)))
    val banded = hashes
      .select(col(idCol).as("id"),
        col(hashCol).bitwiseAND(lit(hashMask)).as("hash"))
      .select(col("id"), col("hash"),
        posexplode(array(slices: _*)).as(Seq("band", "band_val")))
    val a = banded.select(col("id").as("id_a"), col("hash").as("hash_a"),
      col("band"), col("band_val"))
    val b = banded.select(col("id").as("id_b"), col("hash").as("hash_b"),
      col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .where(col("id_a") < col("id_b"))
      // popcount filter BEFORE the distinct: false candidates (bucket-
      // mates beyond the radius) drop out pre-shuffle, so the distinct
      // shuffles only true pairs; distinct AFTER collapses multi-band
      // matches of the survivors (the filter commutes with distinct)
      .select(col("id_a"), col("id_b"),
        expr("cast(bit_count(hash_a ^ hash_b) as int)").as("hamming"))
      .where(col("hamming") <= bands - 1)
      .distinct()
  }
}
