package graft.datasets

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Reference `save_sub_datasets` analog: one partitioned write per
  * slice family, directory per slice value, split layering preserved.
  */
class SubDatasetsSpec extends SparkSpec {

  test("sub-datasets write one directory per slice value and keep all rows") {
    import spark.implicits._
    val ds = Seq(
      (1L, 2010, "ZH", 100, "train"),
      (2L, 2016, "ZH", 700, "validation"),
      (3L, 2019, "BE", 1300, "test"),
      (4L, 2019, null.asInstanceOf[String], 90, "test"))
      .toDF("doc_id", "year", "canton", "n_tokens", "split")

    val out = Files.createTempDirectory("sub_ds").toString
    val written = DatasetWriter.subDatasets(ds, out, Map(
      "canton" -> col("canton"),
      "len_band" -> (floor(col("n_tokens") / 512) * 512)))

    // per-slice-VALUE manifest, not a repeated total
    assert(written("canton") == Map("ZH" -> 2L, "BE" -> 1L, "__other" -> 1L))
    assert(written("len_band") == Map("0" -> 2L, "512" -> 1L, "1024" -> 1L))

    // canton slices: directory per value, nulls under __other
    val byCanton = spark.read.json(s"$out/by_canton")
    assert(byCanton.count() == 4)
    assert(byCanton.where(col("canton") === "ZH").count() == 2)
    assert(byCanton.where(col("canton") === "__other").count() == 1)

    // length bands: 0, 512, 1024
    val byLen = spark.read.json(s"$out/by_len_band")
    assert(byLen.select("len_band").distinct().count() == 3)
    assert(byLen.where(col("len_band") === 0).count() == 2)

    // split layering survives under the slice
    assert(new java.io.File(s"$out/by_canton/canton=ZH/split=train").exists())
  }
}
