package graft.ml

import graft.SparkSpec
import graft.metrics.BinaryMetrics
import graft.sources.Tables
import org.apache.spark.sql.functions._

class QualityDistillSpec extends SparkSpec {

  private def scored = QualityDistill.distillGopher(
    Tables.documents(spark, sf0001), "doc_id", "text",
    trainFilter = col("doc_id") % 4 === 0, minStopwordHits = 1)

  test("distilled gate beats the majority baseline on held-out docs — " +
       "the model learned the rule, not the prior") {
    val cm = BinaryMetrics.confusionMatrix(scored, labelCol = "label")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2))
      .toMap.withDefaultValue(0L)
    val n = cm.values.sum.toDouble
    val acc = (cm((0.0, 0.0)) + cm((1.0, 1.0))) / n
    val majority = math.max(cm((0.0, 0.0)) + cm((0.0, 1.0)),
                            cm((1.0, 0.0)) + cm((1.0, 1.0))) / n
    assert(acc > majority + 0.02,
           s"held-out acc $acc must clear majority $majority")
    // and both rule verdicts are actually represented held-out
    assert(cm((0.0, 0.0)) + cm((0.0, 1.0)) > 0)
    assert(cm((1.0, 0.0)) + cm((1.0, 1.0)) > 0)
  }

  test("distillation is deterministic across partitionings") {
    val a = BinaryMetrics.confusionMatrix(scored, labelCol = "label")
      .collect().toSeq
    val b = BinaryMetrics.confusionMatrix(
        QualityDistill.distillGopher(
          Tables.documents(spark, sf0001).repartition(7), "doc_id", "text",
          trainFilter = col("doc_id") % 4 === 0, minStopwordHits = 1),
        labelCol = "label")
      .collect().toSeq
    assert(a == b, s"repartitioned fit must yield the same matrix: $a vs $b")
  }
}
