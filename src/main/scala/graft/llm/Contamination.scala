package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag training documents that share any word
  * n-gram with an evaluation set — the standard benchmark-leakage guard a
  * training-data pipeline runs before every corpus release (n = 8..13 word
  * grams in published pipelines).
  *
  * Plan shape at 100 TB: eval sets are small (benchmarks are MBs), so the
  * distinct eval-gram relation is BROADCAST and the train side is a
  * scan → explode → broadcast-semi-join → partial-agg — one narrow
  * shuffle on doc_id for the per-doc counts, no giant gram×gram shuffle.
  * Grams travel as md5 strings (fixed 32 bytes, engine-portable) rather
  * than raw gram text.
  */
object Contamination {

  /** Distinct word-n-gram fingerprints per document, as 60-bit md5-prefix
    * longs ([[graft.functions.PortableHash]] family — engine-portable and
    * 8 bytes on the wire instead of a 32-byte md5 hex string). Tokens and
    * grams are materialized columns per the HOF scale rule
    * ([[Dedup.shinglesOfNorm]]); the gram ARRAY is hashed by the fused
    * native kernel before the explode, so the explode moves only longs.
    */
  def gramFingerprints(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
              Dedup.wordTokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), Dedup.wordNgrams(col("__toks"), n).as("__grams"))
      .select(col("doc_id"),
              explode(expr("md5prefix60(__grams)")).as("gram_fp"))

  /** Corpus-internal gram novelty: for each doc, the share of its
    * distinct word-n-grams appearing in NO other document — high novelty
    * marks unique content worth keeping (and, inverted, low novelty
    * flags templated/boilerplate-heavy docs the repetition gates may
    * miss); the same df-per-gram table doubles as the memorization-risk
    * audit (grams with df = 1 are the ones a model can only have learned
    * from this document).
    *
    * Plan: distinct per-doc gram fps (row-local, longs only) → df per fp
    * (one shuffle, map-side combined) → join back on fp → per-doc agg.
    * The fraction is the exact ×10⁶-floored integer (ppm), so it is
    * order-independent and engine-portable.
    */
  def gramNovelty(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 6): DataFrame = {
    val g = gramFingerprints(docs, idCol, textCol, n)
      .transform(graft.Materialize(_))
    val dfreq = g.groupBy("gram_fp").agg(count(lit(1)).as("df"))
    g.join(dfreq, Seq("gram_fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
           sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_ppm",
                  floor(col("n_novel") * lit(1000000.0) / col("n_grams"))
                    .cast("long"))
  }

  /** Positional gram fingerprints: one row per gram OCCURRENCE with its
    * 0-based start-token offset (no distinct — positions are the point).
    * Sub-n docs yield a single whole-doc gram at offset 0, matching the
    * [[gramFingerprints]] construction.
    */
  def gramFingerprintsPos(df: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val toks = col("__toks")
    val gramsPos =
      when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(
        transform(sequence(lit(0), size(toks) - n),
                  i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    df.select(col(idCol).as("doc_id"),
              Dedup.wordTokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(toks).as("__nt"), gramsPos.as("__grams"))
      .select(col("doc_id"), col("__nt"),
              posexplode(expr("md5prefix60(__grams)")))
      .select(col("doc_id"),
              col("pos").cast("long").as("gram_pos"),
              least(col("pos") + (n - 1), col("__nt") - 1).cast("long")
                .as("gram_end"),
              col("col").as("gram_fp"))
  }

  /** WHERE the leak sits: matched eval grams in each train doc, merged
    * into maximal token spans (overlapping/adjacent gram hits collapse —
    * the gaps-and-islands construction). The audit view surgical
    * decontamination needs: instead of dropping a 10k-token document for
    * one leaked benchmark sentence, excise `[span_start, span_end]`.
    *
    * Plan: positional train grams (row-local) → broadcast semi-join on
    * the distinct eval fingerprints → per-doc window (bounded by doc
    * length) → island aggregate. Same broadcast shape as
    * [[contaminationReport]]; the window partitions by doc_id, never
    * globally.
    */
  def contaminationSpans(train: DataFrame, eval: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = gramFingerprintsPos(train, idCol, textCol, n)
      .join(broadcast(gramFingerprints(eval, idCol, textCol, n)
                        .select("gram_fp").distinct()),
            Seq("gram_fp"))
      .select(col("doc_id"), col("gram_pos").as("start"),
              col("gram_end").as("end"))
    val w = Window.partitionBy("doc_id").orderBy("start", "end")
    hits
      .withColumn("__prev_end",
                  max("end").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
                  when(col("__prev_end").isNull ||
                         col("start") > col("__prev_end") + 1, 1)
                    .otherwise(0))
      .withColumn("__island", sum("__new").over(w))
      .groupBy("doc_id", "__island")
      .agg(min("start").as("span_start"), max("end").as("span_end"),
           count(lit(1)).as("n_grams"))
      .select("doc_id", "span_start", "span_end", "n_grams")
  }

  /** SURGICAL decontamination: excise the leaked token spans found by
    * [[contaminationSpans]] instead of dropping whole documents — the
    * action the span audit exists for (a 10k-token doc loses its one
    * leaked benchmark sentence, not its place in the corpus). Returns
    * every train doc with its cleaned token text (leaked spans removed,
    * original token order preserved) plus kept/removed counts; docs with
    * no leak pass through with `n_tokens_removed = 0`.
    *
    * Output text is the NORMALIZED token stream (lowercased, punctuation
    * collapsed — the same [[Dedup.wordTokens]] view the gram match runs
    * on), which is what downstream tokenize-first pipelines consume;
    * callers that must preserve raw bytes should treat the spans as
    * offsets into their own token view instead.
    *
    * Plan: spans (broadcast-semi-join + doc-local window, per
    * [[contaminationSpans]]) → token posexplode (row-local) → equi-join
    * on doc_id with the span range as residual (spans per doc are few
    * and disjoint, so no fanout) → per-doc sort_array(collect_list)
    * reassembly — the [[Dedup.lineDedup]] shape, deterministic without a
    * global window.
    */
  def exciseContamination(train: DataFrame, eval: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 8): DataFrame =
    exciseSpans(train, idCol, textCol,
                contaminationSpans(train, eval, idCol, textCol, n)
                  .select("doc_id", "span_start", "span_end"))

  /** Excise token spans from documents: the reassembly tail shared by
    * [[exciseContamination]] and [[Dedup.scrubSharedSubstrings]]. `spans`
    * must be (doc_id, span_start, span_end) with DISJOINT intervals per
    * doc (maximal merged islands — both callers guarantee this), so the
    * range join marks each token at most once (no row duplication).
    * Returns every doc in `docs` with its cleaned token text (spans
    * removed, original token order preserved) plus kept/removed counts;
    * docs with no span pass through with `n_tokens_removed = 0`.
    *
    * Plan: token posexplode (row-local) → equi-join on doc_id with the
    * span range as residual (spans per doc are few and disjoint, so no
    * fanout) → per-doc sort_array(collect_list) reassembly — the
    * [[Dedup.lineDedup]] shape, deterministic without a global window.
    */
  private[llm] def exciseSpans(docs: DataFrame, idCol: String,
                               textCol: String,
                               spans: DataFrame): DataFrame = {
    val sp = spans.select(col("doc_id").as("s_doc"),
                          col("span_start"), col("span_end"))
    val toks = docs.select(col(idCol).as("doc_id"),
                           posexplode(Dedup.wordTokens(col(textCol))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
              col("col").as("token"))
    val marked = toks.join(
        sp,
        col("doc_id") === col("s_doc") &&
          col("pos").between(col("span_start"), col("span_end")),
        "left")
      .withColumn("leak", col("s_doc").isNotNull)
    val agg = marked.groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("leak"), struct(col("pos"), col("token"))))),
            s => s.getField("token")),
          " ").as("clean_text"),
        sum(when(!col("leak"), 1L).otherwise(0L)).as("n_tokens_kept"),
        sum(when(col("leak"), 1L).otherwise(0L)).as("n_tokens_removed"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("clean_text"), lit("")).as("clean_text"),
              coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
              coalesce(col("n_tokens_removed"), lit(0L))
                .as("n_tokens_removed"))
  }

  /** Per-train-doc contamination report against `eval`: number of distinct
    * eval-shared n-grams and the boolean flag. Train docs that ARE eval
    * docs should be excluded by the caller (or pass disjoint frames).
    */
  def contaminationReport(train: DataFrame, eval: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 8): DataFrame = {
    val trainG = gramFingerprints(train, idCol, textCol, n)
    val evalG  = broadcast(
      gramFingerprints(eval, idCol, textCol, n)
        .select("gram_fp").distinct())
    val shared = trainG.join(evalG, Seq("gram_fp"))
      .groupBy("doc_id")
      .agg(countDistinct("gram_fp").as("n_shared_grams"))
    train.select(col(idCol).as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }

  /** Bloom-prefiltered decontamination — same result as
    * [[contaminationReport]], different scale regime: when the distinct
    * eval gram set outgrows what a broadcast HASH relation tolerates
    * (~100M grams ≈ GBs of hashed relation per executor), a Bloom filter
    * at `fpp` is ~10 bits/gram — an order of magnitude smaller to ship.
    * The train side is prefiltered by the broadcast Bloom (dropping
    * ~(1-fpp) of its grams scan-side), and only the surviving sliver
    * takes the exact SHUFFLE semi-join that removes the false positives.
    * Output is therefore byte-identical to the exact path (spec-pinned).
    *
    * Two driver actions build the filter (count + the distributed
    * BloomFilter aggregate) — both over the small eval side only.
    */
  def contaminationReportBloom(train: DataFrame, eval: DataFrame,
                               idCol: String, textCol: String,
                               n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val trainG = gramFingerprints(train, idCol, textCol, n)
    val evalG  = gramFingerprints(eval, idCol, textCol, n)
      .select("gram_fp").distinct()
      .transform(graft.Materialize(_)) // referenced by count, the bloom agg, AND the verify join
    val items = math.max(evalG.count(), 1L)
    val bloom = evalG.stat.bloomFilter("gram_fp", items, fpp)
    val bloomB = train.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((fp: Long) => bloomB.value.mightContainLong(fp))
    val shared = trainG.filter(mightContain(col("gram_fp")))
      .join(evalG, Seq("gram_fp")) // exact verify: kills bloom false positives
      .groupBy("doc_id")
      .agg(countDistinct("gram_fp").as("n_shared_grams"))
    train.select(col(idCol).as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * lexical gram reports above: a training vector is contaminated when
    * any eval vector sits within `threshold` cosine of it (paraphrased /
    * templated benchmark leakage that shares no 8-gram and so slips past
    * every lexical gate). Returns one row per train vector: the closest
    * eval id (ties → smallest id), the max cosine, the count of eval
    * vectors above threshold, and the flag.
    *
    * Plan shape at 100 TB: eval benchmark embeddings are tiny (thousands
    * of vectors, MBs) → they collapse to ONE array row, broadcast to a
    * single-row nested-loop join, and the whole report is then a
    * ROW-LOCAL map over the train scan: per train vector, ONE fused
    * codegen'd pass over the eval array ([[Similarity.cosineArgmax]])
    * computes max/argmax/hit-count. ZERO data-scale shuffles, no
    * aggregation, no window — |train| rows in, |train| rows out at scan
    * speed (the first cut aggregated max(struct) per train_id, which
    * planned as a SortAggregate SORTING the train×eval product per task;
    * PlanSpec pins the sort-free shape). The argmax tie rule matches
    * max(struct(cos, -eval_id)) — deterministic, independent of
    * collect_list order — and every cosine is [[CosineSimExpr]]'s double
    * accumulation, so threshold compare and ordering are
    * engine-portable. An EMPTY eval set yields the honest all-clean
    * report (null closest/max, zero hits).
    */
  def semanticContamination(train: DataFrame, eval: DataFrame,
                            threshold: Double,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val e = eval
      .select(struct(col(idCol).cast("long").as("eid"),
                     col(vecCol).as("ev")).as("__e"))
      .agg(collect_list("__e").as("__evs"))
    train.select(col(idCol).as("train_id"), col(vecCol).as("__tv"))
      .crossJoin(broadcast(e))
      .withColumn("__m",
                  Similarity.cosineArgmax(col("__tv"), col("__evs"),
                                          threshold))
      .select(col("train_id"),
              col("__m.closest").as("closest_eval"),
              round(col("__m.max_cos"), 6).as("max_cos"),
              col("__m.n_hits").as("n_hits"),
              coalesce(col("__m.max_cos") >= threshold, lit(false))
                .as("is_contaminated"))
  }
}
