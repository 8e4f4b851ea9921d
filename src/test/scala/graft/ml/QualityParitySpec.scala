package graft.ml

import graft.SparkSpec
import graft.metrics.BinaryMetrics
import org.apache.spark.ml.evaluation.{
  BinaryClassificationEvaluator, MulticlassClassificationEvaluator
}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-parity hardening at scale: the GLUE TSVs behind BASELINE.md's
  * published metrics are not in the container, so model quality is pinned
  * on a 50k-row synthetic corpus with KNOWN class structure instead. Each
  * of the three reference pipeline shapes must land inside a golden
  * accuracy/AUC window on a held-out split — a bound on learner behavior
  * that 500-row fixtures cannot give — and the distributed evaluators
  * must agree exactly with MLlib's on the same scaled predictions.
  *
  * Corpus: two topic vocabularies + shared filler; each sentence draws
  * `signal` topic words and filler, with a 15% chance per signal slot of
  * sampling from the WRONG topic. The Bayes ceiling is therefore below
  * 1.0 and the golden windows have real upper bounds — a degenerate
  * always-one classifier (acc 0.5) and a perfect memorizer (acc 1.0)
  * both fail.
  */
class QualityParitySpec extends SparkSpec {

  private val N = 50000

  /** Driver-built corpora used directly as a parallelize/LocalRelation
    * source ship their data slice inside EVERY task binary of every job
    * that scans them (38 MB tasks, 214 "maximum recommended task size"
    * warnings in the r7 suite run). Writing the corpus to temp parquet
    * ONCE — from many sub-MiB parallelize slices — and scanning the
    * files back keeps all downstream ML-fit jobs at scan-split task
    * size, matching how the engine reads real tables.
    */
  private def viaParquet(df: DataFrame, name: String): DataFrame = {
    val dir = tmpDir(name)
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private val topicA = (0 until 60).map(i => s"alpha$i")
  private val topicB = (0 until 60).map(i => s"beta$i")
  private val filler = (0 until 120).map(i => s"common$i")

  private def sentence(rnd: scala.util.Random, cls: Int): String = {
    val own   = if (cls == 1) topicA else topicB
    val other = if (cls == 1) topicB else topicA
    val signal = (0 until 4).map { _ =>
      val pool = if (rnd.nextDouble() < 0.15) other else own
      pool(rnd.nextInt(pool.size))
    }
    val noise = (0 until 6).map(_ => filler(rnd.nextInt(filler.size)))
    rnd.shuffle(signal ++ noise).mkString(" ")
  }

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val rows = (0 until N).map { i =>
      val cls = i % 2
      (i.toLong, sentence(rnd, cls), cls.toDouble)
    }
    viaParquet(spark.sparkContext.parallelize(rows, 32)
                 .toDF("id", "sentence", "label"), "qp_corpus").persist()
  }

  /** Sentence pairs with an independent duplicate coin. The label must be
    * LINEARLY decodable from the combined bag-of-words — "both halves
    * share a topic" is an XOR over topic counts ((8,0)/(0,8) vs (4,4))
    * that a linear model scores at chance — so dup pairs draw both halves
    * from topic A and non-dup pairs mix the topics: the combined alpha
    * count separates the classes up to the 15% word noise. (Also note:
    * pairing rows of `corpus` by any affine index map degenerates — it
    * preserves index parity, and with it the class — so pairs are drawn
    * directly.)
    */
  private lazy val pairCorpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(987)
    val rows = (0 until N / 2).map { p =>
      val dup = rnd.nextBoolean()
      val (c1, c2) =
        if (dup) (1, 1)
        else if (rnd.nextBoolean()) (1, 0)
        else (0, 1)
      (p.toLong, sentence(rnd, c1), sentence(rnd, c2),
       (if (dup) 1 else 0).toString)
    }
    viaParquet(spark.sparkContext.parallelize(rows, 32)
                 .toDF("pid", "q1", "q2", "is_duplicate"),
               "qp_pairs").persist()
  }

  private def split(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col("id") % 5 =!= 0), df.filter(col("id") % 5 === 0))

  private def assertWindow(name: String, acc: Double, auc: Double): Unit = {
    assert(acc > 0.80 && acc < 0.995,
           s"$name holdout accuracy $acc outside golden window (.80, .995)")
    assert(auc > 0.88 && auc <= 1.0,
           s"$name holdout AUC $auc outside golden window (.88, 1.0]")
  }

  test("SST-2 shape at 50k rows: holdout metrics inside the golden window; " +
       "distributed evaluators equal MLlib exactly at scale") {
    val (train, test) = split(corpus)
    val model = TextPipelines.sst2(textCol = "sentence", labelCol = "label")
      .fit(train)
    val preds = model.transform(test)
      .withColumn("score", Cleaning.positiveProbability(col("probability")))
      .persist()
    try {
      val acc = BinaryMetrics.accuracy(preds)
      // maxBins = 0: this test's claim is about the EXACT curve (the auto
      // default would quantile-bin at this cardinality, which the
      // BinaryMetricsSpec auto test covers separately)
      val auc = BinaryMetrics.aucROC(preds, scoreCol = "score", maxBins = 0)
      assertWindow("sst2", acc, auc)
      val mlAcc = new MulticlassClassificationEvaluator()
        .setLabelCol("label").setPredictionCol("prediction")
        .setMetricName("accuracy").evaluate(preds)
      val mlAuc = new BinaryClassificationEvaluator()
        .setLabelCol("label").setRawPredictionCol("probability")
        .setMetricName("areaUnderROC").evaluate(preds)
      assert(math.abs(acc - mlAcc) < 1e-12)
      // above 1000 distinct scores MLlib's evaluator downsamples the curve
      // (BinaryClassificationMetrics numBins=1000), so the comparison vs
      // our EXACT curve is tolerance-bounded, not bit-equal (the 40-row
      // BinaryMetricsSpec pins exact equality below the binning threshold)
      assert(math.abs(auc - mlAuc) < 1e-3,
             s"exact AUC $auc vs MLlib downsampled $mlAuc")
      val f1 = BinaryMetrics.weightedF1(preds)
      val mlF1 = new MulticlassClassificationEvaluator()
        .setLabelCol("label").setPredictionCol("prediction")
        .setMetricName("f1").evaluate(preds)
      assert(math.abs(f1 - mlF1) < 1e-12)
    } finally { preds.unpersist(); () }
  }

  test("QQP shape at 25k pairs: holdout metrics inside the golden window") {
    val pairs = pairCorpus
      .withColumn("combined_text", Cleaning.pairConcat(col("q1"), col("q2")))
    val (train, test) = (pairs.filter(col("pid") % 5 =!= 0),
                         pairs.filter(col("pid") % 5 === 0))
    val model = TextPipelines.qqp(maxIter = 25).fit(train)
    val preds = model.transform(test)
      .withColumn("score", Cleaning.positiveProbability(col("probability")))
    val acc = BinaryMetrics.accuracy(preds, labelCol = "indexed_label")
    val auc = BinaryMetrics.aucROC(preds, labelCol = "indexed_label",
                                   scoreCol = "score")
    // StringIndexer is frequency-ordered: index 1 may be either raw
    // label, so AUC of P(class=1) can be the complement — normalize.
    assertWindow("qqp", acc, math.max(auc, 1.0 - auc))
  }

  test("SST-2 shape at GLUE-train size (67,349 rows): the golden window " +
       "holds at the reference's actual data scale") {
    import spark.implicits._
    // SST-2's train split is 67,349 sentences — the scale behind
    // BASELINE.md's published 0.7752. Fresh draws from the same
    // generator (different seed), so this pins learner behavior at the
    // reference's data size rather than replaying the 50k corpus.
    val nGlue = 67349
    val rnd = new scala.util.Random(5678)
    val glue = viaParquet(
      spark.sparkContext.parallelize(
        (0 until nGlue).map { i =>
          val cls = i % 2
          (i.toLong, sentence(rnd, cls), cls.toDouble)
        }, 64).toDF("id", "sentence", "label"), "qp_sst2_glue").persist()
    try {
      val (train, test) = split(glue)
      val model = TextPipelines.sst2(textCol = "sentence", labelCol = "label")
        .fit(train)
      val preds = model.transform(test)
        .withColumn("score", Cleaning.positiveProbability(col("probability")))
      val acc = BinaryMetrics.accuracy(preds)
      val auc = BinaryMetrics.aucROC(preds, scoreCol = "score", maxBins = 0)
      assertWindow("sst2@67k", acc, auc)
    } finally { glue.unpersist(); () }
  }

  test("QQP shape at GLUE-train size (363,846 pairs): the golden window " +
       "holds at the reference's actual data scale") {
    import spark.implicits._
    // QQP's train split is 363,846 question pairs — the scale behind
    // BASELINE.md's QQP numbers. Fresh draws, different seed (the
    // sst2@67k pattern): pins learner behavior at the real data size.
    val nGlue = 363846
    val rnd = new scala.util.Random(24681)
    val glue = viaParquet(
      spark.sparkContext.parallelize(
        (0 until nGlue).map { p =>
          val dup = rnd.nextBoolean()
          val (c1, c2) =
            if (dup) (1, 1)
            else if (rnd.nextBoolean()) (1, 0)
            else (0, 1)
          (p.toLong, sentence(rnd, c1), sentence(rnd, c2),
           (if (dup) 1 else 0).toString)
        }, 128).toDF("pid", "q1", "q2", "is_duplicate"), "qp_qqp_glue")
      .withColumn("combined_text", Cleaning.pairConcat(col("q1"), col("q2")))
      .persist()
    try {
      val (train, test) = (glue.filter(col("pid") % 5 =!= 0),
                           glue.filter(col("pid") % 5 === 0))
      val model = TextPipelines.qqp(maxIter = 25).fit(train)
      val preds = model.transform(test)
        .withColumn("score", Cleaning.positiveProbability(col("probability")))
      val acc = BinaryMetrics.accuracy(preds, labelCol = "indexed_label")
      val auc = BinaryMetrics.aucROC(preds, labelCol = "indexed_label",
                                     scoreCol = "score")
      assertWindow("qqp@364k", acc, math.max(auc, 1.0 - auc))
    } finally { glue.unpersist(); () }
  }

  test("QNLI shape at GLUE-train size (104,743 rows): the golden window " +
       "holds at the reference's actual data scale") {
    import spark.implicits._
    val nGlue = 104743
    val rnd = new scala.util.Random(13579)
    val glue = viaParquet(
      spark.sparkContext.parallelize(
        (0 until nGlue).map { i =>
          val cls = i % 2
          (i.toLong, sentence(rnd, cls), cls.toDouble)
        }, 64).toDF("id", "sentence", "label"), "qp_qnli_glue")
      .withColumn("input_text", col("sentence"))
      .persist()
    try {
      val (train, test) = split(glue)
      val model = TextPipelines
        .qnli(vectorSize = 48, minCount = 5, maxIter = 20, seed = 42L)
        .fit(train)
      val preds = model.transform(test)
        .withColumn("score", Cleaning.positiveProbability(col("probability")))
      val acc = BinaryMetrics.accuracy(preds)
      val auc = BinaryMetrics.aucROC(preds, scoreCol = "score")
      assertWindow("qnli@105k", acc, auc)
    } finally { glue.unpersist(); () }
  }

  test("QNLI shape at 50k rows: holdout metrics inside the golden window") {
    val df = corpus.withColumn("input_text", col("sentence"))
    val (train, test) = split(df)
    val model = TextPipelines
      .qnli(vectorSize = 48, minCount = 5, maxIter = 20, seed = 42L)
      .fit(train)
    val preds = model.transform(test)
      .withColumn("score", Cleaning.positiveProbability(col("probability")))
    val acc = BinaryMetrics.accuracy(preds)
    val auc = BinaryMetrics.aucROC(preds, scoreCol = "score")
    // Word2Vec averaging is a weaker featurizer than tf-idf (the reference
    // saw the same ordering: QNLI 0.51 vs SST-2 0.78 on real GLUE); the
    // topic corpus is linearly separable in embedding space, so the
    // window still applies.
    assertWindow("qnli", acc, auc)
  }

  override def afterAll(): Unit = {
    corpus.unpersist()
    pairCorpus.unpersist()
    super.afterAll()
  }
}
