package graft.operators

import org.apache.spark.ml.feature.{RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.infer.{BatchInference, HashScorer}
import graft.metrics.BinaryMetrics
import graft.ml.{Cleaning, QualityDistill, TextPipelines}
import graft.sources.Tables

/** ML text-classification surface as driver-checkable queries: feature
  * stages (M1/M3) under the DuckDB oracle, full pipelines (SST-2/QQP/QNLI
  * shapes) and batch inference as deterministic rows-only entries (model
  * floats have no SQL twin; golden assertions live in the ScalaTest specs).
  */
object MlQueries {

  /** M1 RegexTokenizer(pattern="\\W", lowercase) over documents — output
    * flattened to scalars (token count, first/last, joined) so the driver's
    * hash compare sees plain strings. Oracle replays the split in DuckDB.
    */
  def q41Tokenize(spark: SparkSession, dir: String): DataFrame = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("words").setPattern("\\W")
    tok.transform(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        size(col("words")).cast("long").as("n_tokens"),
        element_at(col("words"), 1).as("first_tok"),
        element_at(col("words"), -1).as("last_tok"),
        concat_ws("|", col("words")).as("joined"))
      .orderBy("doc_id")
  }

  /** M1+M3: tokenizer then StopWordsRemover (default English list) —
    * oracle inlines MLlib's own stopword list into the DuckDB SQL.
    */
  def q42StopWords(spark: SparkSession, dir: String): DataFrame = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("words").setPattern("\\W")
    val rem = new StopWordsRemover()
      .setInputCol("words").setOutputCol("filtered")
    rem.transform(tok.transform(Tables.documents(spark, dir)))
      .select(
        col("doc_id"),
        size(col("filtered")).cast("long").as("n_kept"),
        concat_ws("|", col("filtered")).as("joined"))
      .orderBy("doc_id")
  }

  /** Binary label every pipeline query trains against: is the document
    * English? (deterministic, learnable from text content). */
  private def labeled(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("label", (col("lang") === "en").cast("double"))

  /** M4/M6/M9/M10 — SST-2-shaped pipeline (RegexTokenizer →
    * StopWordsRemover → CountVectorizer → IDF → LR) fit on the documents
    * table; output is the E4 confusion matrix (deterministic given fixed
    * data/seed; rows-only check).
    */
  // stashed by the four pipeline queries so oracleSql (dumped AFTER the
  // queries run — the q59 capture pattern) can emit the pinned self-oracle
  // matching the sf dir actually verified
  @volatile private var pipelineDir: String = ""

  def q50Sst2Pipeline(spark: SparkSession, dir: String): DataFrame = {
    pipelineDir = dir
    val df = labeled(spark, dir).select("text", "label")
    val model = TextPipelines.sst2(textCol = "text", labelCol = "label").fit(df)
    BinaryMetrics.confusionMatrix(model.transform(df))
  }

  /** M5/M6(minDocFreq)/M8/M9 — QQP-shaped pipeline over synthesized
    * sentence pairs (consecutive docs; label = same language), with the
    * reference's `[SEP]` concat. maxIter lowered to keep Verify fast.
    */
  def q51QqpPipeline(spark: SparkSession, dir: String): DataFrame = {
    pipelineDir = dir
    val d = Tables.documents(spark, dir)
    val a = d.select(col("doc_id").as("id_a"), col("text").as("q1"),
                     col("lang").as("lang_a"))
    val b = d.select(col("doc_id").as("id_b"), col("text").as("q2"),
                     col("lang").as("lang_b"))
    val pairs = a.join(b, col("id_b") === col("id_a") + 1)
      .withColumn("combined_text",
                  Cleaning.pairConcat(col("q1"), col("q2")))
      .withColumn("is_duplicate",
                  (col("lang_a") === col("lang_b")).cast("string"))
    val model = TextPipelines.qqp(maxIter = 20).fit(pairs)
    BinaryMetrics.confusionMatrix(
      model.transform(pairs), labelCol = "indexed_label")
  }

  /** M7 Word2Vec + U5 EmptyListHandler — QNLI-shaped pipeline; label via
    * the U2 codec expression over a synthesized entailment-style string.
    */
  def q52QnliPipeline(spark: SparkSession, dir: String): DataFrame = {
    pipelineDir = dir
    val df = Tables.documents(spark, dir)
      .withColumn("raw_label",
        when(col("lang") === "en", lit("entailment"))
          .otherwise(lit("not_entailment")))
      .withColumn("label", Cleaning.cleanLabel(col("raw_label")).cast("double"))
      .withColumn("input_text", Cleaning.composeText(col("text"), col("source")))
      .filter(length(col("input_text")) > 0)
    val model = TextPipelines
      .qnli(vectorSize = 32, minCount = 2, seed = 42L).fit(df)
    BinaryMetrics.confusionMatrix(model.transform(df))
  }

  /** U3 — mapPartitions batch inference with the deterministic stub scorer;
    * emits the `confidence` column the reference forgot. Aggregated for a
    * stable rows-only check.
    */
  def q53BatchInfer(spark: SparkSession, dir: String): DataFrame = {
    pipelineDir = dir
    val scored = BatchInference.scoreAll(
      labeled(spark, dir).withColumn("target", col("label").cast("int")),
      "text", "target", () => new HashScorer(Seq("pos", "neg", "neu")))
    scored.groupBy("predicted_label")
      .agg(count(lit(1)).as("n"),
           round(avg("confidence"), 4).as("conf_avg"))
      .orderBy("predicted_label")
  }

  /** E5 — ROC points from a deterministic score/label pair, oracle-checked
    * (pure window arithmetic in both engines).
    */
  def q54RocPoints(spark: SparkSession, dir: String): DataFrame = {
    val preds = Tables.documents(spark, dir).select(
      (col("lang") === "en").cast("double").as("label"),
      round((col("n_chars") % 97).cast("double") / 97.0, 6).as("score"))
    BinaryMetrics.rocPoints(preds)
      .select(col("score"), round(col("fpr"), 6).as("fpr"),
              round(col("tpr"), 6).as("tpr"))
      .orderBy(desc("score"))
  }

  /** E7a — probability histogram of the same deterministic score,
    * oracle-checked.
    */
  def q55ProbHistogram(spark: SparkSession, dir: String): DataFrame = {
    val preds = Tables.documents(spark, dir).select(
      ((col("n_chars") % 97).cast("double") / 97.0).as("score"))
    BinaryMetrics.probabilityHistogram(preds, "score", bins = 20)
  }

  /** E-family extension — calibration curve over the same deterministic
    * synthetic score/label as q54; oracle-checked.
    */
  def q80Calibration(spark: SparkSession, dir: String): DataFrame = {
    val preds = Tables.documents(spark, dir).select(
      (col("lang") === "en").cast("double").as("label"),
      ((col("n_chars") % 97).cast("double") / 97.0).as("score"))
    BinaryMetrics.calibrationCurve(preds, bins = 10)
  }

  /** Quality-rule distillation ([[QualityDistill.distillGopher]]): the
    * Gopher gate's verdicts on the (doc_id % 4 = 0) slice train a
    * HashingTF+IDF+LR imitator, which is then audited on the held-out
    * remainder — output is the rule-vs-model confusion matrix (the
    * accept/reject evidence for swapping the rule for the model).
    * Deterministic given (data, config); pinned golden self-oracle at
    * the driver sf dirs, rows-only elsewhere. minStopwordHits = 1 as in
    * q65 (the synthetic corpus tops out at 1 distinct Gopher stopword).
    */
  def q163QualityDistill(spark: SparkSession, dir: String): DataFrame = {
    pipelineDir = dir
    val scored = QualityDistill.distillGopher(
      Tables.documents(spark, dir), "doc_id", "text",
      trainFilter = col("doc_id") % 4 === 0, minStopwordHits = 1)
    BinaryMetrics.confusionMatrix(scored, labelCol = "label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_tokenize"        -> (q41Tokenize(_, _)),
    "q163_quality_distill" -> (q163QualityDistill(_, _)),
    "q42_stop_words"      -> (q42StopWords(_, _)),
    "q50_sst2_pipeline"   -> (q50Sst2Pipeline(_, _)),
    "q51_qqp_pipeline"    -> (q51QqpPipeline(_, _)),
    "q52_qnli_pipeline"   -> (q52QnliPipeline(_, _)),
    "q53_batch_infer"     -> (q53BatchInfer(_, _)),
    "q54_roc_points"      -> (q54RocPoints(_, _)),
    "q55_prob_histogram"  -> (q55ProbHistogram(_, _)),
    "q80_calibration"     -> (q80Calibration(_, _))
  )

  private val mlStopList = StopWordsRemover
    .loadDefaultStopWords("english")
    .map(s => "'" + s.replace("'", "''") + "'")
    .mkString("[", ", ", "]")

  /** PINNED SELF-ORACLES for the seeded-model pipelines (q50–q53).
    *
    * DuckDB cannot refit LR/Word2Vec, so these queries carried rows-only
    * checks — silent model-behavior drift (an MLlib default change, a
    * broken seed path, a vocabulary-ordering regression) would never turn
    * a CORRECTNESS row red. Their outputs ARE deterministic given
    * (data, seed) — measured bit-identical across local[4]/local[8]/
    * local[32] in round 8 — so the expected rows at the driver-generated
    * sf dirs are pinned here as committed literals and emitted as VALUES
    * oracles. Clearly labeled self-consistency gates: they do not
    * validate the model math independently (the exact-equality specs vs
    * MLlib evaluators do that); they pin the pipeline's observable
    * behavior. Unknown sf dirs fall back to the rows-only check (entry
    * omitted), so the gate can never false-fail on fresh data.
    */
  private def cmGolden(rows: Seq[(Double, Double, Long)]): String = {
    val vs = rows.map { case (l, p, n) => s"($l, $p, $n)" }.mkString(", ")
    s"""-- pinned self-oracle (r8): seeded-pipeline golden, not derived
       |-- from the tables; see MlQueries.pipelineGoldens
       |SELECT CAST(label AS DOUBLE) AS label,
       |  CAST(prediction AS DOUBLE) AS prediction, CAST(n AS BIGINT) AS n
       |FROM (VALUES $vs) AS t(label, prediction, n)
       |ORDER BY label, prediction""".stripMargin
  }

  private def inferGolden(rows: Seq[(String, Long, Double)]): String = {
    val vs = rows.map { case (c, n, a) => s"('$c', $n, $a)" }.mkString(", ")
    s"""-- pinned self-oracle (r8): seeded-pipeline golden, not derived
       |-- from the tables; see MlQueries.pipelineGoldens
       |SELECT CAST(predicted_label AS VARCHAR) AS predicted_label,
       |  CAST(n AS BIGINT) AS n, CAST(conf_avg AS DOUBLE) AS conf_avg
       |FROM (VALUES $vs) AS t(predicted_label, n, conf_avg)
       |ORDER BY predicted_label""".stripMargin
  }

  private val pipelineGoldens: Map[(String, String), String] = Map(
    ("sf0.01", "q50_sst2_pipeline") -> cmGolden(Seq(
      (0.0, 0.0, 215L), (0.0, 1.0, 67L), (1.0, 0.0, 133L),
      (1.0, 1.0, 85L))),
    ("sf0.01", "q51_qqp_pipeline") -> cmGolden(Seq(
      (0.0, 0.0, 368L), (1.0, 0.0, 131L))),
    ("sf0.01", "q52_qnli_pipeline") -> cmGolden(Seq(
      (0.0, 1.0, 218L), (1.0, 1.0, 282L))),
    ("sf0.01", "q53_batch_infer") -> inferGolden(Seq(
      ("neg", 176L, 0.7415), ("neu", 148L, 0.7416),
      ("pos", 176L, 0.7476))),
    ("sf0.001", "q50_sst2_pipeline") -> cmGolden(Seq(
      (0.0, 0.0, 273L), (0.0, 1.0, 34L), (1.0, 0.0, 161L),
      (1.0, 1.0, 32L))),
    ("sf0.001", "q51_qqp_pipeline") -> cmGolden(Seq(
      (0.0, 0.0, 378L), (1.0, 0.0, 121L))),
    ("sf0.001", "q52_qnli_pipeline") -> cmGolden(Seq(
      (0.0, 1.0, 193L), (1.0, 1.0, 307L))),
    ("sf0.001", "q53_batch_infer") -> inferGolden(Seq(
      ("neg", 175L, 0.7397), ("neu", 145L, 0.7311),
      ("pos", 180L, 0.7384))),
    ("sf0.01", "q163_quality_distill") -> cmGolden(Seq(
      (0.0, 0.0, 58L), (0.0, 1.0, 28L), (1.0, 0.0, 14L),
      (1.0, 1.0, 275L))),
    ("sf0.001", "q163_quality_distill") -> cmGolden(Seq(
      (0.0, 0.0, 69L), (0.0, 1.0, 15L), (1.0, 0.0, 12L),
      (1.0, 1.0, 279L))))

  def oracleSql: Map[String, String] = {
    val base = pipelineDir.split('/').lastOption.getOrElse("")
    staticOracleSql ++
      Seq("q50_sst2_pipeline", "q51_qqp_pipeline", "q52_qnli_pipeline",
          "q53_batch_infer", "q163_quality_distill")
        .flatMap(q => pipelineGoldens.get((base, q)).map(q -> _))
  }

  private val staticOracleSql: Map[String, String] = Map(
    "q41_tokenize" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\W'),
        |                x -> len(x) >= 1) AS words
        |  FROM documents)
        |SELECT doc_id, len(words) AS n_tokens,
        |  words[1] AS first_tok, words[-1] AS last_tok,
        |  array_to_string(words, '|') AS joined
        |FROM t ORDER BY doc_id""".stripMargin,
    "q42_stop_words" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '\\W'),
         |                x -> len(x) >= 1) AS words
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    list_filter(words, x -> NOT list_contains($mlStopList, x))
         |      AS filtered
         |  FROM t)
         |SELECT doc_id, len(filtered) AS n_kept,
         |  array_to_string(filtered, '|') AS joined
         |FROM f ORDER BY doc_id""".stripMargin,
    "q54_roc_points" ->
      """WITH preds AS (
        |  SELECT CAST(lang = 'en' AS DOUBLE) AS label,
        |    round(CAST(n_chars % 97 AS DOUBLE) / 97.0, 6) AS score
        |  FROM documents),
        |by_score AS (
        |  SELECT score,
        |    sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS pos,
        |    sum(CASE WHEN label = 1.0 THEN 0 ELSE 1 END) AS neg
        |  FROM preds GROUP BY score),
        |cum AS (
        |  SELECT score,
        |    sum(pos) OVER (ORDER BY score DESC
        |                   ROWS UNBOUNDED PRECEDING) AS cum_tp,
        |    sum(neg) OVER (ORDER BY score DESC
        |                   ROWS UNBOUNDED PRECEDING) AS cum_fp,
        |    sum(pos) OVER () AS tot_p, sum(neg) OVER () AS tot_n
        |  FROM by_score)
        |SELECT score,
        |  round(cum_fp / CAST(tot_n AS DOUBLE), 6) AS fpr,
        |  round(cum_tp / CAST(tot_p AS DOUBLE), 6) AS tpr
        |FROM cum ORDER BY score DESC""".stripMargin,
    "q55_prob_histogram" ->
      """WITH s AS (
        |  SELECT CAST(n_chars % 97 AS DOUBLE) / 97.0 AS score
        |  FROM documents)
        |SELECT least(CAST(floor(score * 20) AS BIGINT), 19) AS bin,
        |  count(*) AS n
        |FROM s GROUP BY bin ORDER BY bin""".stripMargin,
    "q80_calibration" ->
      """WITH s AS (
        |  SELECT CAST(lang = 'en' AS DOUBLE) AS y,
        |    CAST(n_chars % 97 AS DOUBLE) / 97.0 AS score
        |  FROM documents)
        |SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
        |  count(*) AS n,
        |  round(avg(score), 4) AS mean_score,
        |  round(avg(y), 4) AS frac_pos
        |FROM s GROUP BY bin ORDER BY bin""".stripMargin
  )
}
