package graft.stats

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib TF-IDF path (A6): the reference builds a docs × citation-vocab
  * matrix and runs sklearn's TfidfTransformer
  * (`doc2doc_ir_dataset_creator.py:287-325`); the Spark-native
  * equivalent is CountVectorizer → IDF over distributed sparse vectors
  * (no docs×vocab dense matrix ever materializes). The exact-arithmetic
  * SQL formulation lives in TextQueries.t5_tfidf — this pipeline is the
  * ML-integration variant whose output feeds MLlib models directly.
  */
object TfIdfPipeline {

  case class Result(features: DataFrame, vocabulary: Array[String])

  /** token column → (raw counts, tfidf) sparse vectors + vocabulary.
    * `vocabSize` caps the vocabulary at the most frequent terms (the
    * reference caps at the 1000 most common citations).
    */
  def fit(docs: DataFrame, tokensCol: String, vocabSize: Int = 1000): Result = {
    val cv = new CountVectorizer()
      .setInputCol(tokensCol).setOutputCol("tf_vec").setVocabSize(vocabSize)
    val cvModel: CountVectorizerModel = cv.fit(docs)
    val counted = cvModel.transform(docs)
    val idf = new IDF().setInputCol("tf_vec").setOutputCol("tfidf_vec")
    val idfModel = idf.fit(counted)
    Result(idfModel.transform(counted), cvModel.vocabulary)
  }

  /** Explode the sparse tf-idf vectors back to (doc, term, weight) rows
    * for relational consumers.
    */
  def toLong(result: Result, idCol: String): DataFrame = {
    val vocab = result.vocabulary
    val explodeVec = udf { v: SparseVector =>
      v.indices.zip(v.values).map { case (i, w) => (vocab(i), w) }.toSeq
    }
    result.features
      .select(col(idCol), explode(explodeVec(col("tfidf_vec"))).as("tw"))
      .select(col(idCol), col("tw._1").as("term"), col("tw._2").as("tfidf"))
  }
}
