package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-rule DISTILLATION: train a text classifier to imitate the
  * Gopher heuristic gate — the CCNet/fastText quality-model stage of a
  * web-scale pipeline, where expensive quality judgments (hand rules, an
  * LM, human labels) are distilled into a fast linear model that scores
  * the whole crawl.
  *
  * The weak labels here come from
  * [[graft.llm.QualityFilters.gopherStats]]' `keep` flag over a labeled
  * slice; the model is RegexTokenizer → HashingTF → IDF →
  * LogisticRegression (the M5/M6/M9 stack — HashingTF because at crawl
  * scale a vocabulary fit is an extra aggregation pass over everything).
  * Every stage is deterministic given (data, config): the hash features
  * need no fit, IDF and LR reduce with order-independent aggregates.
  *
  * At 100 TB the labeled slice is sample-sized (rules are run once, on a
  * fraction), the fit is MLlib's treeAggregate loop over that sample, and
  * scoring is one row-local scan of the full corpus against broadcast
  * coefficients — the same deployment shape as every persisted-model
  * scorer here.
  */
object QualityDistill {

  /** The distillation pipeline. `numFeatures` 2^14 keeps the coefficient
    * vector broadcast-tiny (128 KiB of doubles) while leaving hash
    * collisions rare at vocabulary sizes a quality signal needs.
    */
  def pipeline(textCol: String = "text", labelCol: String = "label",
               numFeatures: Int = 1 << 14, maxIter: Int = 20): Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("words")
      .setPattern("\\W").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("words").setOutputCol("raw_features")
      .setNumFeatures(numFeatures)
    val idf = new IDF()
      .setInputCol("raw_features").setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(maxIter).setRegParam(0.01)
    new Pipeline().setStages(Array(tokenizer, tf, idf, lr))
  }

  /** Fit the distilled gate on the `trainFilter` slice (labeled by the
    * Gopher rules) and score the HELD-OUT remainder. Returns the held-out
    * docs with `label` (the rule's verdict, recomputed as ground truth)
    * and the model's `prediction`/`probability` — the frame a release
    * gate audits before swapping the rule for the model.
    */
  def distillGopher(docs: DataFrame, idCol: String, textCol: String,
                    trainFilter: Column, minStopwordHits: Int = 2,
                    numFeatures: Int = 1 << 14,
                    maxIter: Int = 20): DataFrame = {
    val labeled = graft.llm.QualityFilters
      .gopherStats(docs.select(col(idCol), col(textCol)), textCol,
                   minStopwordHits)
      .select(col(idCol), col(textCol),
              col("keep").cast("double").as("label"))
    val model = pipeline(textCol, "label", numFeatures, maxIter)
      .fit(labeled.filter(trainFilter))
    model.transform(labeled.filter(!trainFilter))
  }
}
