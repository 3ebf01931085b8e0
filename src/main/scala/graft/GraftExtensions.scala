package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.{CharNgrams, CosineSim, CounterMerge, MinHashSig, SimHashMd5, SortedIntersect, TextFunctions, Uuid3, WinnowFp, WordNgrams}

/** Session extension point: registers graft's native functions so SQL
  * users get them without touching the Scala API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or call
  * `GraftExtensions.registerUdfs(spark)` for the UDF-backed names on an
  * existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("uuid3"), Uuid3.info, Uuid3.builder))
    ext.injectFunction((FunctionIdentifier("counter_merge"),
      CounterMerge.info, CounterMerge.builder))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      CosineSim.info, CosineSim.builder))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      MinHashSig.info, MinHashSig.builder))
    ext.injectFunction((FunctionIdentifier("simhash_md5"),
      SimHashMd5.info, SimHashMd5.builder))
    ext.injectFunction((FunctionIdentifier("winnow_fp"),
      WinnowFp.info, WinnowFp.builder))
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      WordNgrams.info, WordNgrams.builder))
    ext.injectFunction((FunctionIdentifier("char_ngrams"),
      CharNgrams.info, CharNgrams.builder))
  }
}

object GraftExtensions {
  /** Idempotently register the native expressions on an EXISTING
    * session (for callers that didn't boot with spark.sql.extensions —
    * library operators call this before using `cosine_sim` etc.).
    */
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit = {
    // session-construction side effects that READERS depend on: the .xz
    // codec must be resolvable by extension in THIS session, not only in
    // whichever session happened to call writeJsonl — a fresh session
    // reading an exported .xz JSONL would otherwise parse raw bytes into
    // _corrupt_record (ADVICE r6)
    graft.sources.XzCodec.register(spark)
    graft.sources.ZstdCodec.register(spark)
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(FunctionIdentifier("uuid3"), Uuid3.info, Uuid3.builder)
    reg.registerFunction(FunctionIdentifier("counter_merge"),
      CounterMerge.info, CounterMerge.builder)
    reg.registerFunction(FunctionIdentifier("cosine_sim"),
      CosineSim.info, CosineSim.builder)
    reg.registerFunction(FunctionIdentifier("minhash_sig"),
      MinHashSig.info, MinHashSig.builder)
    reg.registerFunction(FunctionIdentifier("simhash_md5"),
      SimHashMd5.info, SimHashMd5.builder)
    reg.registerFunction(FunctionIdentifier("winnow_fp"),
      WinnowFp.info, WinnowFp.builder)
    reg.registerFunction(FunctionIdentifier("word_ngrams"),
      WordNgrams.info, WordNgrams.builder)
    reg.registerFunction(FunctionIdentifier("char_ngrams"),
      CharNgrams.info, CharNgrams.builder)
    reg.registerFunction(FunctionIdentifier("sorted_intersect_size"),
      SortedIntersect.info, SortedIntersect.builder)
  }

  /** UDF-backed helpers (no codegen need): RFC uuid5 decision ids,
    * text cleaning, roman numerals, simhash, language ID, sentence
    * segmentation, PDF text extraction.
    */
  def registerUdfs(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("decision_id", (name: String) => TextFunctions.decisionId(name))
    spark.udf.register("clean_text", (s: String) => TextFunctions.cleanText(s))
    spark.udf.register("roman_to_int", (s: String) => TextFunctions.romanToInt(s))
    spark.udf.register("int_to_roman", (n: Int) => TextFunctions.intToRoman(n))
    spark.udf.register("simhash64",
      (tokens: Seq[String]) => TextFunctions.simhash64(tokens))
    spark.udf.register("lang_id", (t: String) => graft.functions.LangId.detect(t))
    spark.udf.register("sentences_icu",
      (t: String, lang: String) => TextFunctions.sentencesIcu(t, lang))
    spark.udf.register("pdf_text",
      (b: Array[Byte]) => graft.sources.PdfText.extract(b))
  }
}
