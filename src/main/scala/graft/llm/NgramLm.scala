package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character n-gram language-model perplexity scoring — the CCNet/KenLM
  * quality component of web-scale pipelines: fit a small LM on a clean
  * reference corpus, score every candidate document, and gate (or
  * bucket) on perplexity. A 5-gram KenLM is the published tool; the same
  * pipeline role is filled here by an add-k-smoothed character n-gram
  * model expressed entirely in DataFrame aggregations, so fit and score
  * are one corpus scan each and the whole computation is replayable in
  * plain SQL (the q83 oracle).
  *
  * Scale shape: the fitted model is (ctx, next) → count — bounded by
  * |charset|^n rows regardless of corpus size (tens of thousands for
  * char trigrams), so it BROADCASTS to the score join; scoring is
  * explode (row-local) → two broadcast lookups → per-doc aggregate. No
  * data-scale shuffle except the final per-doc agg, which partial-aggs
  * map-side.
  */
object NgramLm {

  /** Fitted model: per-(ctx,next) counts, per-ctx totals, and the
    * next-char vocabulary size V used by add-k smoothing. Persist both
    * frames via parquet for cross-session reuse — they are tiny.
    */
  final case class LmModel(counts: DataFrame, ctxTotals: DataFrame,
                           vocabSize: Long, n: Int)

  /** (doc-rows → one row per char n-gram of the NORMALIZED text, with
    * multiplicity). The sequence bound is guarded: Spark's
    * `sequence(1, len-n+1)` runs DESCENDING when len < n, which would
    * fabricate grams for short docs — they must yield none.
    */
  private def grams(df: DataFrame, textCol: String, n: Int,
                    keep: Seq[String] = Nil): DataFrame = {
    val withNorm = df.withColumn("__norm",
                                 Dedup.normalizeText(col(textCol)))
    val norm = col("__norm")
    val gramArr = when(length(norm) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(norm) - (n - 1)),
                           i => norm.substr(i, lit(n))))
    val keepCols = keep.map(col)
    withNorm
      .select(keepCols :+ explode(gramArr).as("g"): _*)
      .select(keepCols :+ substring(col("g"), 1, n - 1).as("ctx")
                       :+ substring(col("g"), n, 1).as("nxt"): _*)
  }

  /** One aggregation pass over the reference corpus → the model.
    * An empty/sub-n corpus yields V = 0, which would turn the smoothing
    * denominator into 0 (log ∞); clamp to 1 so a degenerate model
    * scores everything at the uniform floor instead of NaN.
    */
  def fit(corpus: DataFrame, textCol: String, n: Int = 3): LmModel = {
    val g = grams(corpus, textCol, n)
    val counts = g.groupBy("ctx", "nxt").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("ctx").agg(sum("c").as("t"))
    val v = counts.select("nxt").distinct().count()
    LmModel(counts, totals, math.max(v, 1L), n)
  }

  /** Persist a fitted model as three plain tables (counts / totals / a
    * one-row meta with n and V) — the fit-once-score-daily shape: the
    * model is charset-bounded, so no bucketing is needed; it broadcasts
    * at score time regardless.
    */
  def save(model: LmModel, name: String): Unit = {
    val spark = model.counts.sparkSession
    import spark.implicits._
    // versioned publish (IndexStore.savePlainArtifact): a crashed
    // re-fit must not destroy the live model
    IndexStore.savePlainArtifact(model.counts, s"${name}_counts")
    IndexStore.savePlainArtifact(model.ctxTotals, s"${name}_totals")
    IndexStore.savePlainArtifact(
      Seq((model.n, model.vocabSize)).toDF("n", "vocab_size"),
      s"${name}_meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession,
           name: String): LmModel = {
    val meta = IndexStore.loadPlainArtifact(spark, s"${name}_meta").head()
    LmModel(IndexStore.loadPlainArtifact(spark, s"${name}_counts"),
            IndexStore.loadPlainArtifact(spark, s"${name}_totals"),
            meta.getLong(1), meta.getInt(0))
  }

  def drop(spark: org.apache.spark.sql.SparkSession, name: String): Unit =
    Seq(s"${name}_counts", s"${name}_totals", s"${name}_meta")
      .foreach(t => IndexStore.dropArtifact(spark, t))

  /** Score documents against a fitted model: per-doc gram count, mean
    * add-k log-probability, and perplexity exp(−mean). Unseen grams get
    * the smoothed floor (0+k)/(t+kV) (or 1/V for unseen contexts) — the
    * standard add-k treatment, never −∞. Docs shorter than n chars have
    * no grams and are absent from the output (nothing to score).
    */
  def scoreDocs(docs: DataFrame, model: LmModel, idCol: String,
                textCol: String, k: Double = 1.0): DataFrame = {
    val g = grams(docs.select(col(idCol).as("doc_id"), col(textCol)),
                  textCol, model.n, keep = Seq("doc_id"))
    g.join(broadcast(model.counts), Seq("ctx", "nxt"), "left")
      .join(broadcast(model.ctxTotals), Seq("ctx"), "left")
      .select(col("doc_id"),
              log((coalesce(col("c"), lit(0L)) + k) /
                    (coalesce(col("t"), lit(0L)) + k * model.vocabSize))
                .as("logp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
           avg("logp").as("avg_logp"))
      .select(col("doc_id"), col("n_grams"),
              round(col("avg_logp"), 6).as("avg_logp"),
              round(exp(-col("avg_logp")), 4).as("ppl"))
  }

  /** Perplexity gate: score and keep docs at or below the cutoff — the
    * CCNet "head/middle/tail" split reduces to two cutoffs of this.
    */
  def perplexityFilter(docs: DataFrame, model: LmModel, idCol: String,
                       textCol: String, maxPpl: Double,
                       k: Double = 1.0): DataFrame =
    docs.join(
      scoreDocs(docs, model, idCol, textCol, k)
        .filter(col("ppl") <= maxPpl)
        .select(col("doc_id").as(idCol)),
      Seq(idCol))

  /** The CCNet head/middle/tail split (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * candidates bucketed by perplexity TERCILES within each partition
    * (CCNet partitions by language) — `head` is the most-fluent third
    * under the reference LM, `tail` the least, and downstream pipelines
    * typically train on head+middle. Ordering is (rounded ppl, doc_id),
    * so ties are deterministic and the split replays exactly in SQL.
    *
    * Scale shape: scoring inherits [[scoreDocs]]'s broadcast-join plan;
    * the tercile is one `ntile` window per partition value — a sort of
    * each language's scored docs (id + two numbers, never text). At
    * 100 TB the exact ntile is the correctness anchor for
    * [[perplexityBucketsApprox]], the implemented production variant
    * (per-language `percentile_approx` cutoffs, bucket by comparison —
    * one scan, no global sort). Docs shorter than
    * n chars have no grams and are absent, exactly as in [[scoreDocs]].
    */
  def perplexityBuckets(docs: DataFrame, model: LmModel, idCol: String,
                        textCol: String, byCols: Seq[String],
                        k: Double = 1.0): DataFrame = {
    val scored = scoreDocs(docs, model, idCol, textCol, k)
    val keys = docs.select(
      (col(idCol).as("doc_id") +: byCols.map(col)): _*)
    val w = Window.partitionBy(byCols.map(col): _*)
      .orderBy(col("ppl"), col("doc_id"))
    scored.join(keys, Seq("doc_id"))
      .withColumn("tercile", ntile(3).over(w))
      .withColumn("bucket",
                  when(col("tercile") === 1, "head")
                    .when(col("tercile") === 2, "middle")
                    .otherwise("tail"))
      .select(
        (col("doc_id") +: byCols.map(col)) ++
          Seq(col("n_grams"), col("ppl"), col("tercile"),
              col("bucket")): _*)
  }

  /** [[perplexityBuckets]]'s at-scale twin — the production form CCNet
    * itself uses (cutoffs from a sample, then bucket by comparison).
    * Per-partition 1/3 and 2/3 perplexity cutoffs come from one
    * `percentile_approx` aggregation (a mergeable sketch — no
    * per-language sort, no ntile window), broadcast back, and every doc
    * buckets by comparing its ppl to its partition's two cutoffs. One
    * scoring scan + a #partitions-row broadcast join. Bucket sizes land
    * within sketch error of thirds; docs tied at a cutoff all take the
    * lower bucket (ntile would split them by doc_id), which is the only
    * disagreement source vs the exact anchor — the spec brackets it.
    */
  def perplexityBucketsApprox(docs: DataFrame, model: LmModel,
                              idCol: String, textCol: String,
                              byCols: Seq[String], k: Double = 1.0,
                              accuracy: Int = 10000): DataFrame = {
    val scored = scoreDocs(docs, model, idCol, textCol, k)
    val keys = docs.select(
      (col(idCol).as("doc_id") +: byCols.map(col)): _*)
    val j = scored.join(keys, Seq("doc_id"))
      .transform(graft.Materialize(_)) // scanned twice: cuts + bucketing
    val cuts = j.groupBy(byCols.map(col): _*)
      .agg(percentile_approx(col("ppl"),
                             array(lit(1.0 / 3), lit(2.0 / 3)),
                             lit(accuracy)).as("__cuts"))
    j.join(broadcast(cuts), byCols)
      .withColumn("bucket",
                  when(col("ppl") <= col("__cuts")(0), "head")
                    .when(col("ppl") <= col("__cuts")(1), "middle")
                    .otherwise("tail"))
      .select(
        (col("doc_id") +: byCols.map(col)) ++
          Seq(col("n_grams"), col("ppl"), col("bucket")): _*)
  }

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): weight = mean log-likelihood under the TARGET-domain
    * model minus mean log-likelihood under the RAW-corpus model. Docs
    * that look more like the target than like average raw data get
    * positive weights; selection = keep the top slice (or sample
    * proportional to exp(weight)). Both scores come from [[scoreDocs]],
    * so the whole computation inherits its broadcast-join scale shape —
    * two tiny models, one candidate scan each.
    */
  def importanceWeights(docs: DataFrame, target: LmModel, raw: LmModel,
                        idCol: String, textCol: String,
                        k: Double = 1.0): DataFrame = {
    require(target.n == raw.n, "models must share the gram order n")
    val t = scoreDocs(docs, target, idCol, textCol, k)
      .select(col("doc_id"), col("n_grams"),
              col("avg_logp").as("logp_target"))
    val r = scoreDocs(docs, raw, idCol, textCol, k)
      .select(col("doc_id"), col("avg_logp").as("logp_raw"))
    t.join(r, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"),
              col("logp_target"), col("logp_raw"),
              round(col("logp_target") - col("logp_raw"), 6)
                .as("importance"))
  }
}
