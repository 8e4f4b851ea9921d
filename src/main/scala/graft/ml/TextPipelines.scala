package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature._

/** The three text-classification pipeline shapes of the reference, as
  * configured there (SURVEY.md §2.7 M1–M10). All stages are Scala MLlib
  * natives; seeds are pinned so golden tests are deterministic.
  *
  * Scale notes: every estimator here fits with distributed aggregation
  * (`CountVectorizer`/`IDF` doc-frequency counts, `Word2Vec` skip-gram,
  * LR `treeAggregate` L-BFGS) — no driver-side materialization beyond the
  * model coefficients themselves. Callers should `persist()` the featurized
  * training set before multi-iteration fits at large SF (LR does so
  * internally via its `handlePersistence` path).
  */
object TextPipelines {

  /** SST-2 shape (`sst2_test2.py:50-59`): RegexTokenizer(pattern="\\W") →
    * StopWordsRemover → CountVectorizer(vocabSize=3000) → IDF →
    * LogisticRegression(maxIter=10).
    */
  def sst2(textCol: String = "sentence", labelCol: String = "label",
           vocabSize: Int = 3000, maxIter: Int = 10): Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("words").setPattern("\\W")
    val remover = new StopWordsRemover()
      .setInputCol("words").setOutputCol("filtered")
    val cv = new CountVectorizer()
      .setInputCol("filtered").setOutputCol("raw_features")
      .setVocabSize(vocabSize)
    val idf = new IDF().setInputCol("raw_features").setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features").setMaxIter(maxIter)
    new Pipeline().setStages(Array(tokenizer, remover, cv, idf, lr))
  }

  /** QQP shape (`qqp_test.py:64-109`): RegexTokenizer → StopWordsRemover →
    * HashingTF(2^16) → IDF(minDocFreq=5) → StringIndexer(label) →
    * LogisticRegression(maxIter=100, regParam=0.01, elasticNetParam=0.5).
    *
    * HashingTF needs no vocabulary fit — at 100 TB that removes an entire
    * aggregation pass vs CountVectorizer (the reference chose it for QQP's
    * 400k rows for exactly this reason).
    */
  def qqp(textCol: String = "combined_text", labelCol: String = "is_duplicate",
          numFeatures: Int = 1 << 16, maxIter: Int = 100): Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("words")
      .setPattern("\\W").setToLowercase(true)
    val remover = new StopWordsRemover()
      .setInputCol("words").setOutputCol("filtered")
    val tf = new HashingTF()
      .setInputCol("filtered").setOutputCol("raw_features")
      .setNumFeatures(numFeatures)
    val idf = new IDF()
      .setInputCol("raw_features").setOutputCol("features").setMinDocFreq(5)
    val indexer = new StringIndexer()
      .setInputCol(labelCol).setOutputCol("indexed_label")
    val lr = new LogisticRegression()
      .setLabelCol("indexed_label").setFeaturesCol("features")
      .setMaxIter(maxIter).setRegParam(0.01).setElasticNetParam(0.5)
    new Pipeline().setStages(Array(tokenizer, remover, tf, idf, indexer, lr))
  }

  /** QNLI shape (`qnli_test.py:121-149`): RegexTokenizer(minTokenLength=2) →
    * EmptyListHandler (custom U5 Transformer) → StopWordsRemover →
    * Word2Vec(vectorSize=100, minCount=10, seeded) →
    * LogisticRegression(maxIter=20, regParam=0.05, elasticNetParam=0.8).
    */
  def qnli(textCol: String = "input_text", labelCol: String = "label",
           vectorSize: Int = 100, minCount: Int = 10, maxIter: Int = 20,
           seed: Long = 42L): Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("raw_words")
      .setPattern("\\W").setMinTokenLength(2)
    val emptyHandler = new EmptyListHandler()
      .setInputCol("raw_words").setOutputCol("words")
    val remover = new StopWordsRemover()
      .setInputCol("words").setOutputCol("filtered")
    val safeTokens = new EmptyListHandler()
      .setInputCol("filtered").setOutputCol("safe_tokens")
    val w2v = new Word2Vec()
      .setInputCol("safe_tokens").setOutputCol("features")
      .setVectorSize(vectorSize).setMinCount(minCount).setSeed(seed)
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(maxIter).setRegParam(0.05).setElasticNetParam(0.8)
    new Pipeline().setStages(
      Array(tokenizer, emptyHandler, remover, safeTokens, w2v, lr))
  }
}
