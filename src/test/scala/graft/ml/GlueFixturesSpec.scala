package graft.ml

import graft.SparkSpec
import graft.io.Tsv
import graft.metrics.BinaryMetrics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden end-to-end runs of the three reference pipelines over the
  * checked-in mini-GLUE fixtures (FIXTURES.md §A) — each replays its
  * script's exact load → clean → featurize → fit → evaluate flow
  * (`sst2_test2.py:21-91`, `qqp_test.py:17-135`, `qnli_test.py:53-174`)
  * including every cleaning-branch edge row the fixtures plant.
  */
class GlueFixturesSpec extends SparkSpec {

  private def fixture(task: String, split: String) =
    getClass.getResource(s"/glue/$task/$split.tsv").getPath

  test("SST-2 golden: load → dropna → pipeline → all metrics") {
    // S1 read with inferSchema, exactly sst2_test2.py:34-35
    val raw = Tsv.readTsvInfer(spark, fixture("SST-2", "train"))
    assert(raw.count() == 24)
    val train = raw.na.drop() // P6: drops the null-sentence row
    assert(train.count() == 23)
    val model = TextPipelines
      .sst2(vocabSize = 200)
      .fit(train.withColumn("label", col("label").cast("double")))
    val dev = Tsv.readTsvInfer(spark, fixture("SST-2", "dev"))
      .withColumn("label", col("label").cast("double"))
    val preds = model.transform(dev)
      .withColumn("score", Cleaning.positiveProbability(col("probability")))
    val m = BinaryMetrics.summary(preds)
    // separable vocab → perfect dev metrics, deterministically
    assert(m.accuracy == 1.0 && m.auc == 1.0 && m.f1 == 1.0, m)
  }

  test("QQP golden: quoted read → casts → na.drop(subset) → [SEP] → pipeline") {
    // S2 quote/escape read, exactly qqp_test.py:25-31
    val raw = Tsv.readTsvQuoted(spark, fixture("QQP", "train"))
    // the embedded-quote row must parse as one field
    val quoted = raw.filter(col("id") === 18).head()
    assert(quoted.getAs[String]("question1") == "has \"quoted\" words inside")
    // P5 cast chain per qqp_test.py:34-41, P7 subset null-drop
    val clean = raw.select(
      col("id").cast("int").as("id"),
      col("qid1").cast("string"), col("qid2").cast("string"),
      col("question1"), col("question2"),
      col("is_duplicate").cast("float").as("is_duplicate"))
      .na.drop(Seq("question1", "question2", "is_duplicate"))
    assert(clean.count() == 19) // null-label row dropped
    val pairs = clean.withColumn("combined_text",
      Cleaning.pairConcat(col("question1"), col("question2")))
    val model = TextPipelines.qqp(maxIter = 30).fit(pairs)
    val preds = model.transform(pairs)
    assert(BinaryMetrics.accuracy(preds, labelCol = "indexed_label") >= 0.9)
  }

  test("QNLI golden: selectExpr rename → label codec → compose → U5 pipeline") {
    val raw = Tsv.readTsvInfer(spark, fixture("QNLI", "train"))
    assert(raw.count() == 23)
    // P2 selectExpr rename, exactly qnli_test.py:99-105
    val renamed = raw.selectExpr("question as text", "sentence as context",
                                 "label as raw_label")
    // U2 codec: entailment→0, not_entailment→1, "1"→1, junk→null
    val coded = renamed
      .withColumn("label", Cleaning.cleanLabel(col("raw_label")).cast("double"))
      .filter(col("label").isNotNull)
    assert(coded.count() == 22) // garbage-label row dropped
    // F2/F4 compose + length filter, qnli_test.py:108-113
    val composed = coded
      .withColumn("input_text",
        Cleaning.composeText(col("text"), col("context")))
      .filter(length(col("input_text")) > 0)
    assert(composed.count() == 21) // empty-combined row dropped
    // whitespace row survived with trimmed content
    val padded = composed.filter(col("text").contains("padded"))
    assert(padded.head().getAs[String]("input_text") ==
      "padded question padded sentence text")
    // pipeline incl. minTokenLength=2 + EmptyListHandler guard: the
    // single-char row tokenizes to [] and must still transform
    val model = TextPipelines
      .qnli(vectorSize = 16, minCount = 1, seed = 42L).fit(composed)
    assert(model.transform(composed).count() == 21)
  }

  test("S4: prediction export to CSV exactly like sst2_test2.py:225-227") {
    val train = Tsv.readTsvInfer(spark, fixture("SST-2", "train")).na.drop()
      .withColumn("label", col("label").cast("double"))
    val model = TextPipelines.sst2(vocabSize = 100).fit(train)
    val preds = model.transform(train)
      .select("sentence", "label", "prediction") // the reference's 3 columns
    val out = tmpDir("sst2csv") + "/preds"
    Tsv.writeCsv(preds, out)
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(out)
    assert(back.count() == preds.count())
    assert(back.columns.toSeq == Seq("sentence", "label", "prediction"))
  }

  test("StringIndexer round-trip: IndexToString inverts the indexing") {
    import org.apache.spark.ml.feature.{IndexToString, StringIndexer}
    import spark.implicits._
    val df = Seq("cat", "dog", "cat", "bird", "dog", "dog").toDF("animal")
    val model = new StringIndexer()
      .setInputCol("animal").setOutputCol("idx").fit(df)
    val back = new IndexToString()
      .setInputCol("idx").setOutputCol("animal_back")
      .setLabels(model.labelsArray(0))
      .transform(model.transform(df))
    assert(back.filter(col("animal") =!= col("animal_back")).count() == 0)
    // frequency-ordered: most common label gets index 0
    assert(model.labelsArray(0).head == "dog")
  }

  test("batch-inference fixture shape (FIXTURES.md §A.4): ERROR sentinel + confidence") {
    import graft.infer.{BatchInference, TextScorer}
    val dev = Tsv.readTsvInfer(spark, fixture("SST-2", "dev"))
      .select(col("sentence").as("text"), col("label").as("target"))
    val scorer = () => new TextScorer {
      def score(t: String): (String, Double) =
        if (t.contains("dreadful")) throw new RuntimeException("boom")
        else ("ok", 0.8)
    }
    val out = BatchInference.scoreAll(dev, "text", "target", scorer)
    assert(out.schema == BatchInference.outputSchema)
    val byLabel = out.groupBy("predicted_label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.contains("ERROR") && byLabel("ERROR") >= 1)
    assert(out.filter(col("confidence").isNull).count() == 0)
  }
}
