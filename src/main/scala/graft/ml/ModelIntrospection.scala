package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.feature.CountVectorizerModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model introspection as DataFrames — replaces the reference's driver-side
  * NumPy tail (`np.argsort(coefficients)` top/bottom-20 slicing,
  * `sst2_test2.py:145-161`) with `orderBy(...).limit(k)` plans
  * (TakeOrderedAndProject — per-partition top-k, no global sort).
  */
object ModelIntrospection {

  /** (word, coefficient) relation from a fitted CountVectorizer + LR pair. */
  def featureWeights(spark: SparkSession, vocabulary: Array[String],
                     coefficients: Array[Double]): DataFrame = {
    require(vocabulary.length == coefficients.length,
            s"${vocabulary.length} words vs ${coefficients.length} weights")
    import spark.implicits._
    vocabulary.zip(coefficients).toSeq.toDF("word", "coefficient")
  }

  /** Top-k most positive and most negative features, like the reference's
    * two argsort slices — one DataFrame each.
    */
  def topFeatures(spark: SparkSession, model: PipelineModel, k: Int,
                  cvStage: Int = 2, lrStage: Int = 4)
      : (DataFrame, DataFrame) = {
    val cv = model.stages(cvStage).asInstanceOf[CountVectorizerModel]
    val lr = model.stages(lrStage).asInstanceOf[LogisticRegressionModel]
    val fw = featureWeights(spark, cv.vocabulary, lr.coefficients.toArray)
    (fw.orderBy(desc("coefficient"), asc("word")).limit(k),
     fw.orderBy(asc("coefficient"), asc("word")).limit(k))
  }
}
