package graft.metrics

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed model-quality metrics (SURVEY.md §2.6 E1–E7) — every
  * driver-side sklearn/NumPy computation of the reference re-expressed as a
  * DataFrame aggregate; only O(#classes) or O(#distinct-scores) rows ever
  * reach the driver.
  *
  * Scale notes: confusion/accuracy/F1 are one hash-aggregate shuffle on
  * (label, prediction) — cardinality #classes², trivially safe. ROC/AUC
  * groups by distinct score first (cardinality ≤ #distinct scores, bounded
  * further by `maxBins` quantile binning at cluster scale), then runs a
  * window cumulative sum over that aggregated (small) relation — the window
  * never sees raw rows.
  */
object BinaryMetrics {

  /** E4 — distributed confusion matrix: the `qnli_test.py:183-193` pattern.
    * Cardinality = #classes², safe at any data scale.
    */
  def confusionMatrix(preds: Dataset[_], labelCol: String = "label",
                      predictionCol: String = "prediction"): DataFrame =
    preds
      .groupBy(col(labelCol).cast("double").as("label"),
               col(predictionCol).cast("double").as("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")

  /** E2/E6 — accuracy as a single global aggregate. */
  def accuracy(preds: Dataset[_], labelCol: String = "label",
               predictionCol: String = "prediction"): Double =
    preds
      .agg(avg(when(col(labelCol).cast("double") ===
                      col(predictionCol).cast("double"), 1.0d)
        .otherwise(0.0d)).as("acc"))
      .head().getDouble(0)

  /** E3/E6 — weighted F1 (MulticlassClassificationEvaluator's "f1"):
    * per-class F1 from the confusion matrix, weighted by true-class counts.
    * Everything after the #classes²-row aggregate is driver-side arithmetic
    * over a handful of rows.
    */
  def weightedF1(preds: Dataset[_], labelCol: String = "label",
                 predictionCol: String = "prediction"): Double = {
    val cm = confusionMatrix(preds, labelCol, predictionCol)
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    val classes = (cm.map(_._1) ++ cm.map(_._2)).distinct
    val total   = cm.map(_._3).sum.toDouble
    classes.map { c =>
      val tp = cm.filter(t => t._1 == c && t._2 == c).map(_._3).sum.toDouble
      val fp = cm.filter(t => t._1 != c && t._2 == c).map(_._3).sum.toDouble
      val fn = cm.filter(t => t._1 == c && t._2 != c).map(_._3).sum.toDouble
      val support   = tp + fn
      val precision = if (tp + fp == 0) 0.0 else tp / (tp + fp)
      val recall    = if (tp + fn == 0) 0.0 else tp / (tp + fn)
      val f1 =
        if (precision + recall == 0) 0.0
        else 2 * precision * recall / (precision + recall)
      f1 * (support / total)
    }.sum
  }

  /** E5 — ROC curve points, DataFrame-native (replaces sklearn `roc_curve`
    * over collected arrays, `sst2_test2.py:127-128`).
    *
    * Shape follows BinaryClassificationMetrics: group rows by score
    * (one aggregate), sort scores descending, cumulative TP/FP via a window
    * over the score-grouped relation, normalize by total P/N. Returns
    * (score, fpr, tpr) without the (0,0) origin point.
    *
    * `maxBins` is the cluster-scale guard: continuous scores (real LR
    * probabilities) are almost all distinct, so the score-grouped relation
    * is data-sized and the single-partition cumulative window would sort it
    * on one task. With `maxBins > 0`, scores are first quantile-binned —
    * approxQuantile edges (a distributed sketch, O(maxBins) to the driver),
    * each score mapped to its bin, bin threshold = max score in bin — the
    * same downsampling BinaryClassificationMetrics(numBins) applies. The
    * window input is then ≤ maxBins rows no matter the data scale.
    * `maxBins = 0` keeps the exact per-distinct-score curve (right for
    * discrete scores / oracle comparison).
    *
    * `maxBins = -1` (the DEFAULT) resolves automatically: one
    * `approx_count_distinct(score)` pre-check picks exact mode when the
    * cardinality is ≤ [[AutoExactMaxScores]] and [[AutoBins]]-bin
    * quantile binning above it — a naive caller with continuous LR
    * scores gets a bounded window WITHOUT opting in, and the unbounded
    * exact mode is an explicit choice, never a scale accident.
    */
  val AutoExactMaxScores = 10000L
  val AutoBins           = 1000

  def rocPoints(preds: Dataset[_], labelCol: String = "label",
                scoreCol: String = "score", maxBins: Int = -1): DataFrame = {
    val scored = preds.select(
      col(scoreCol).cast("double").as("score"),
      col(labelCol).cast("double").as("label"))
    val bins =
      if (maxBins >= 0) maxBins
      else {
        val distinct = scored.agg(
          approx_count_distinct("score")).head().getLong(0)
        if (distinct <= AutoExactMaxScores) 0 else AutoBins
      }
    val pos = sum(when(col("label") === 1.0d, 1L).otherwise(0L)).as("pos")
    val neg = sum(when(col("label") === 1.0d, 0L).otherwise(1L)).as("neg")
    val byScore =
      if (bins <= 0) scored.groupBy("score").agg(pos, neg)
      else {
        val probs = (1 until bins).map(_.toDouble / bins).toArray
        val edges = scored.stat
          .approxQuantile("score", probs, 1.0 / (4.0 * bins))
          .distinct.sorted.toSeq
        // bin index = #edges strictly below the score (monotone in score),
        // so binning preserves score order; threshold of a bin = its max.
        val bin = size(filter(typedLit(edges), e => e < col("score")))
        scored.withColumn("bin", bin)
          .groupBy("bin")
          .agg(max("score").as("score"), pos, neg)
          .drop("bin")
      }
    // Window over the score-aggregated relation (≤ #distinct scores or
    // maxBins rows); single-partition window is intentional here — the
    // input is already reduced, so this is a driver-scale sort, not a
    // data-scale one.
    val w = Window.orderBy(desc("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = byScore.agg(sum("pos"), sum("neg")).head()
    val (totP, totN) = (totals.getLong(0).toDouble, totals.getLong(1).toDouble)
    byScore
      .withColumn("cum_tp", sum("pos").over(w))
      .withColumn("cum_fp", sum("neg").over(w))
      .select(
        col("score"),
        (col("cum_fp") / lit(totN)).as("fpr"),
        (col("cum_tp") / lit(totP)).as("tpr"))
      .orderBy(desc("score"))
  }

  /** E1 — area under the ROC curve by trapezoidal integration of
    * [[rocPoints]] (the BinaryClassificationMetrics construction: curve
    * points at each distinct score, origin prepended). Matches
    * `BinaryClassificationEvaluator` when the score column is
    * P(class=1) — exact-equality tested in MetricsSpec.
    */
  def aucROC(preds: Dataset[_], labelCol: String = "label",
             scoreCol: String = "score", maxBins: Int = -1): Double = {
    val pts = rocPoints(preds, labelCol, scoreCol, maxBins)
      .select("fpr", "tpr").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val curve = ((0.0, 0.0) +: pts.toSeq).toList
    curve.zip(curve.tail).map { case ((x0, y0), (x1, y1)) =>
      (x1 - x0) * (y1 + y0) / 2.0
    }.sum
  }

  /** All binary-classification metrics from one persisted pass — the fix
    * for the reference's recompute-per-evaluator inefficiency (it re-ran
    * the whole transform chain 3×, `sst2_test2.py:80-86`; SURVEY §3.2).
    * Callers hand in scored predictions once; the input is persisted for
    * the duration of the four aggregates and unpersisted before return.
    */
  case class MetricsSummary(accuracy: Double, f1: Double, auc: Double,
                            confusion: Map[(Double, Double), Long])

  def summary(preds: Dataset[_], labelCol: String = "label",
              predictionCol: String = "prediction",
              scoreCol: String = "score"): MetricsSummary = {
    val cached = preds.persist()
    try {
      MetricsSummary(
        accuracy(cached, labelCol, predictionCol),
        weightedF1(cached, labelCol, predictionCol),
        aucROC(cached, labelCol, scoreCol),
        confusionMatrix(cached, labelCol, predictionCol).collect()
          .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap)
    } finally { cached.unpersist(); () }
  }

  /** E7a — fixed-width probability histogram (replaces driver-side
    * `plt.hist`, `sst2_test2.py:174-189`): floor-binning then one
    * aggregate; `bins` rows to the driver.
    */
  def probabilityHistogram(preds: Dataset[_], scoreCol: String = "score",
                           bins: Int = 30): DataFrame =
    preds
      .select(
        least(floor(col(scoreCol).cast("double") * bins), lit(bins - 1))
          .cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .orderBy("bin")

  /** E7b — class distribution (`qqp_test.py:181-189`). */
  def classDistribution(df: Dataset[_], labelCol: String): DataFrame =
    df.groupBy(labelCol).agg(count(lit(1)).as("n")).orderBy(labelCol)

  /** Calibration curve (reliability diagram): scores bucketed into
    * `bins` equal-width bins, each reporting its count, mean predicted
    * score, and empirical positive rate — "when the model says 0.8, is
    * it right 80% of the time?". The standard diagnostic next to
    * ROC/AUC; score 1.0 lands in the top bin (the `least` clamp, same as
    * [[probabilityHistogram]]).
    *
    * Scale: one shuffle down to `bins` groups — partial aggregation does
    * the data-scale work map-side. Means are rounded to 4 decimals so the
    * double summation order never leaks into comparisons.
    */
  def calibrationCurve(preds: Dataset[_], scoreCol: String = "score",
                       labelCol: String = "label",
                       bins: Int = 10): DataFrame =
    preds
      .select(
        least(floor(col(scoreCol).cast("double") * bins), lit(bins - 1))
          .cast("long").as("bin"),
        col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("double").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
           round(avg("s"), 4).as("mean_score"),
           round(avg("y"), 4).as("frac_pos"))
      .orderBy("bin")
}
