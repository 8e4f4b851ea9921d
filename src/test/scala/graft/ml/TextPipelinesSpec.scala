package graft.ml

import graft.SparkSpec
import graft.metrics.BinaryMetrics
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.feature.CountVectorizerModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden end-to-end pipeline tests on a deterministic, linearly separable
  * synthetic corpus (positive docs use "good" vocabulary, negative docs use
  * "bad" vocabulary) — every pipeline must reach perfect accuracy on its
  * training set, and stage introspection must expose vocabulary and
  * coefficients like the reference relies on (`sst2_test2.py:145-146`).
  */
class TextPipelinesSpec extends SparkSpec {

  private val posWords = Seq("great", "wonderful", "superb", "delightful",
    "excellent", "charming", "stellar", "amazing")
  private val negWords = Seq("awful", "dreadful", "boring", "terrible",
    "horrid", "lousy", "tedious", "abysmal")

  /** 120 rows, seeded; sentence i uses 4 words from its class pool. */
  private def corpus(textCol: String = "sentence"): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 120).map { i =>
      val pool  = if (i % 2 == 0) posWords else negWords
      val words = Seq.fill(4)(pool(rnd.nextInt(pool.size)))
      (("the movie was " + words.mkString(" ")), (1 - i % 2).toDouble)
    }.toDF(textCol, "label")
  }

  test("SST-2 pipeline: fit, transform, evaluate, introspect, persist") {
    val df = corpus()
    val model = TextPipelines.sst2(vocabSize = 100).fit(df)
    val preds = model.transform(df)
    // separable vocabulary → training accuracy must be perfect
    assert(BinaryMetrics.accuracy(preds) == 1.0)
    assert(BinaryMetrics.aucROC(
      preds.withColumn("score",
        Cleaning.positiveProbability(col("probability")))) == 1.0)

    // stage introspection (M4 vocabulary / M9 coefficients)
    val cv = model.stages(2).asInstanceOf[CountVectorizerModel]
    assert((posWords ++ negWords).forall(cv.vocabulary.contains))
    val lr = model.stages(4).asInstanceOf[LogisticRegressionModel]
    assert(lr.coefficients.size == cv.vocabulary.length)
    // positive-class words should carry higher weight than negative ones
    val w = cv.vocabulary.zipWithIndex.toMap
    val meanPos = posWords.map(p => lr.coefficients(w(p))).sum / posWords.size
    val meanNeg = negWords.map(p => lr.coefficients(w(p))).sum / negWords.size
    assert(meanPos > meanNeg)

    // S5: PipelineModel persistence round-trip gives identical predictions
    val path = tmpDir("sst2") + "/model"
    model.write.overwrite().save(path)
    val loaded = PipelineModel.load(path)
    assert(loaded.transform(df).select("prediction").collect().toSeq ==
      preds.select("prediction").collect().toSeq)
  }

  test("topFeatures: positive-class words rank top, negative rank bottom") {
    val df = corpus()
    val model = TextPipelines.sst2(vocabSize = 100).fit(df)
    val (top, bottom) = ModelIntrospection.topFeatures(spark, model, k = 8)
    val topWords = top.collect().map(_.getString(0)).toSet
    val bottomWords = bottom.collect().map(_.getString(0)).toSet
    assert((topWords intersect posWords.toSet).size >= 6, topWords)
    assert((bottomWords intersect negWords.toSet).size >= 6, bottomWords)
    // top-k plans as TakeOrderedAndProject, not a global sort
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("QQP pipeline: pair concat + HashingTF/IDF/StringIndexer path") {
    import spark.implicits._
    val base = corpus("q1")
    val pairs = base
      .withColumn("q2", col("q1"))
      .withColumn("is_duplicate",
        when(col("label") === 1.0, lit("1")).otherwise(lit("0")))
      .withColumn("combined_text",
        Cleaning.pairConcat(col("q1"), col("q2")))
    val model = TextPipelines.qqp(maxIter = 30).fit(pairs)
    val preds = model.transform(pairs)
    assert(BinaryMetrics.accuracy(preds, labelCol = "indexed_label") == 1.0)
    // HashingTF is fit-free: feature vector dimension is the configured 2^16
    assert(preds.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0).size == (1 << 16))
  }

  test("QNLI pipeline: EmptyListHandler + Word2Vec path, seeded determinism") {
    val df = corpus("input_text")
    val fit1 = TextPipelines.qnli(vectorSize = 16, minCount = 1, seed = 42L)
      .fit(df)
    val fit2 = TextPipelines.qnli(vectorSize = 16, minCount = 1, seed = 42L)
      .fit(df)
    val p1 = fit1.transform(df).select("prediction").collect().toSeq
    val p2 = fit2.transform(df).select("prediction").collect().toSeq
    assert(p1 == p2, "same seed must give identical predictions")
    assert(BinaryMetrics.accuracy(fit1.transform(df)) > 0.9)
  }

  test("QNLI pipeline survives rows that tokenize to nothing (U5 guard)") {
    import spark.implicits._
    val df = corpus("input_text")
      .union(Seq(("!!! ...", 1.0), ("??", 0.0)).toDF("input_text", "label"))
    val model = TextPipelines.qnli(vectorSize = 8, minCount = 1).fit(df)
    // would throw in Word2Vec on empty token lists without EmptyListHandler
    assert(model.transform(df).count() == 122)
  }
}
