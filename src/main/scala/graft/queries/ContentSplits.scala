package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE content-hash split rule, in one place: md5-prefix bucket % 10 →
  * 80/10/10 train/valid/test. o12 assigns it and d14 measures near-dup
  * leakage ACROSS it — the two gates share this helper (and its DuckDB
  * restatement) so the rule cannot drift between them.
  */
object ContentSplits {

  /** split assignment from the text column */
  def splitCol(text: Column): Column = {
    val bucket = conv(substring(md5(text), 1, 4), 16, 10).cast("bigint")
    when(bucket % 10 < 8, "train")
      .when(bucket % 10 === 8, "valid")
      .otherwise("test")
  }

  /** the same rule over a DuckDB column expression */
  def duckSplit(textExpr: String): String =
    s"""CASE WHEN CAST(('0x' || substr(md5($textExpr), 1, 4)) AS BIGINT) % 10 < 8
              THEN 'train'
            WHEN CAST(('0x' || substr(md5($textExpr), 1, 4)) AS BIGINT) % 10 = 8
              THEN 'valid'
            ELSE 'test' END"""
}
