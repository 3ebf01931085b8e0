package graft.extract

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Thin UDF layer over the pure Extractors logic (§2.9 dispatch shape:
  * one UDF per task, the row's spider column selects the marker table
  * from broadcast config; generator-style outputs come back as
  * array<struct> and are exploded — no custom Generator needed).
  */
object ExtractUdfs {

  /** spider-dispatched section splitting: (spider, paragraphs) →
    * map<section, array<paragraph>>
    */
  val splitSections: UserDefinedFunction =
    udf { (spider: String, paragraphs: Seq[String]) =>
      Extractors.splitSections(spider, paragraphs)
    }

  /** rulings text → sorted outcome labels */
  val judgments: UserDefinedFunction =
    udf { rulings: String => Extractors.extractJudgments(rulings) }

  /** outcome labels → binary label (null when empty/contradictory) */
  val binaryJudgment: UserDefinedFunction =
    udf { outcomes: Seq[String] => Extractors.toBinaryJudgment(outcomes).orNull }

  /** text → array<struct<volume,book,page>> of BGE/ATF/DTF citations */
  val rulingCitations: UserDefinedFunction =
    udf { text: String => Extractors.parseRulingCitations(text) }
}
