package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-corpus token-distribution statistics: unigram entropy,
  * type-token ratio, and a Zipf power-law fit — the summary numbers a
  * dataset card reports and a curation run monitors for drift (a corpus
  * whose entropy collapses or whose Zipf slope steepens between
  * snapshots usually picked up boilerplate or lost diversity).
  *
  * Scale shape: ONE token-count aggregation (partial agg → single
  * shuffle on token), consumed twice — a global 1-row aggregate for
  * entropy, and a `TakeOrderedAndProject` top-K (per-partition top-k,
  * K·partitions rows to the driver, never a global sort) for the Zipf
  * fit. The closed-form least-squares slope avoids any ML fit. All
  * arithmetic is engine-portable (ln/log2 + sums, rounded to 6
  * decimals), so the DuckDB oracle replays it exactly (q99).
  */
object CorpusStats {

  /** Per-token occurrence counts: (token, n). */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Dedup.wordTokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))

  /** One-row summary: token/type counts, type-token ratio, unigram
    * entropy in bits (H = log2 N − Σ n·log2 n ⁄ N), and the least-squares
    * fit of ln(freq) against ln(rank) over the `topK` most frequent
    * tokens (slope ≈ −1 for natural text, per Zipf's law).
    */
  def corpusStats(docs: DataFrame, textCol: String,
                  topK: Int = 100): DataFrame =
    statsFromCounts(tokenCounts(docs, textCol), topK)

  /** Token counts are the MERGEABLE sufficient statistic for every
    * number [[corpusStats]] reports: persist them once
    * ([[saveCounts]]/[[loadCounts]]), then a day's ingest updates the
    * dataset card by aggregating BATCH counts and [[mergeCounts]]-ing —
    * touching yesterday's corpus only through its (token, n) table,
    * never rescanning the text. Exact (no sketch): the merge is a sum.
    */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.select("token", "n").unionByName(b.select("token", "n"))
      .groupBy("token")
      .agg(sum("n").as("n"))

  /** Versioned publish ([[IndexStore.savePlainArtifact]]): the daily
    * stats roll must never destroy the live counts on a crashed save.
    */
  def saveCounts(counts: DataFrame, name: String): Unit =
    IndexStore.savePlainArtifact(counts.select("token", "n"),
                                 s"${name}_counts")

  def loadCounts(spark: org.apache.spark.sql.SparkSession,
                 name: String): DataFrame =
    IndexStore.loadPlainArtifact(spark, s"${name}_counts")

  def dropCounts(spark: org.apache.spark.sql.SparkSession,
                 name: String): Unit =
    IndexStore.dropArtifact(spark, s"${name}_counts")

  /** Population Stability Index between a REFERENCE and a CURRENT score
    * distribution — the standard drift number data-quality monitors
    * alarm on (rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * shifted). Scores in [0, 1) bucket into `buckets` fixed-width bins
    * (values ≥ 1 clamp into the last); bucket shares are
    * Laplace-smoothed ((n_i + 1) ⁄ (N + buckets)) so empty buckets need
    * no epsilon hacks and the arithmetic stays engine-portable.
    *
    * Output: one row per bucket with both smoothed shares (ppm, exact
    * integers) and the PSI contribution (p − q)·ln(p ⁄ q) rounded to 6
    * decimals, plus a `bucket = -1` TOTAL row. Scale shape: two
    * fixed-width-bucket aggregations (partial-agg to ≤ `buckets` rows
    * each) + a broadcast join — nothing corpus-scale shuffles.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
               buckets: Int = 10): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def bucketed(df: DataFrame, nCol: String): DataFrame =
      df.select(least(lit(buckets - 1),
                      greatest(lit(0),
                               floor(col(valueCol) * buckets).cast("int")))
        .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(nCol))
    val all = ref.sparkSession.range(0, buckets)
      .select(col("id").cast("int").as("bucket"))
    val r = bucketed(ref, "n_ref")
    val c = bucketed(cur, "n_cur")
    val nr = ref.count(); val nc = cur.count()
    require(nr > 0 && nc > 0,
            s"psiDrift needs non-empty samples (ref=$nr, cur=$nc)")
    val joined = all
      .join(broadcast(r), Seq("bucket"), "left")
      .join(broadcast(c), Seq("bucket"), "left")
      .select(col("bucket"),
              coalesce(col("n_ref"), lit(0L)).as("n_ref"),
              coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("p", (col("n_ref") + 1).cast("double") /
        lit((nr + buckets).toDouble))
      .withColumn("q", (col("n_cur") + 1).cast("double") /
        lit((nc + buckets).toDouble))
      .withColumn("psi_contrib",
                  round((col("p") - col("q")) * log(col("p") / col("q")),
                        6))
      .transform(graft.Materialize(_))
    val perBucket = joined.select(
      col("bucket"), col("n_ref"), col("n_cur"),
      floor(col("p") * 1000000.0).cast("long").as("p_ppm"),
      floor(col("q") * 1000000.0).cast("long").as("q_ppm"),
      col("psi_contrib"))
    val total = joined.agg(
      sum("n_ref").as("n_ref"), sum("n_cur").as("n_cur"),
      round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
        .as("psi_contrib"))
      .select(lit(-1).as("bucket"), col("n_ref"), col("n_cur"),
              lit(-1L).as("p_ppm"), lit(-1L).as("q_ppm"),
              col("psi_contrib"))
    perBucket.unionByName(total)
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — [[psiDrift]]'s
    * sharper twin: the max CDF gap catches a shift that PSI's 10 coarse
    * buckets smooth over. Returns one row: the KS statistic, the score
    * where the gap peaks, and both sample sizes.
    *
    * Scale note (the rocPoints argument): the CDF window is bounded by
    * the number of DISTINCT score values, not rows — quality-style
    * scores are 4-decimal rationals (≤ 10⁴ + 1 values), so the single-
    * partition cumulative window sees a bounded input at ANY corpus
    * size. For genuinely continuous scores, quantize first (the
    * `maxBins` pattern); this exact form is that approximation's
    * correctness anchor.
    */
  def ksDrift(ref: DataFrame, cur: DataFrame,
              valueCol: String): DataFrame = {
    def counts(df: DataFrame, nCol: String): DataFrame =
      df.select(col(valueCol).as("v")).groupBy("v")
        .agg(count(lit(1)).as(nCol))
    val r = counts(ref, "n_r")
    val c = counts(cur, "n_c")
    val merged = r.join(c, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("n_r"), lit(0L)).as("n_r"),
              coalesce(col("n_c"), lit(0L)).as("n_c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("v").rowsBetween(Long.MinValue, 0)
    val nr = ref.count(); val nc = cur.count()
    require(nr > 0 && nc > 0,
            s"ksDrift needs non-empty samples (ref=$nr, cur=$nc)")
    merged
      .withColumn("cdf_r", sum("n_r").over(w).cast("double") / lit(nr))
      .withColumn("cdf_c", sum("n_c").over(w).cast("double") / lit(nc))
      .withColumn("gap", abs(col("cdf_r") - col("cdf_c")))
      .orderBy(desc("gap"), asc("v"))
      .limit(1)
      .select(round(col("gap"), 6).as("ks"),
              col("v").as("v_at_max"),
              lit(nr).as("n_ref"), lit(nc).as("n_cur"))
  }

  /** Per-group word-n-gram diversity — the corpus self-repetition
    * numbers a curation run watches per source: n-gram instance count,
    * distinct count, type-token ratio, and the fraction of instances
    * whose n-gram occurs more than once (the "duplicate n-gram mass" of
    * Rae et al. 2021 §A1.1, lifted from per-document to per-source). A
    * source whose ttr collapses or rep_frac spikes between snapshots is
    * emitting templated/boilerplate text.
    *
    * Unlike [[Dedup.wordNgrams]] (a distinct SET for Jaccard), this
    * counts the positional MULTISET — repetition is the signal here.
    * Scale shape: explode → two mergeable aggregations (partial agg →
    * one shuffle on (group, gram), then one on group). No windows, no
    * distinct-on-raw-rows; the (group, gram) pre-aggregation is the
    * map-side combine that keeps the shuffle proportional to distinct
    * grams, not corpus tokens. Docs shorter than n grams contribute
    * nothing (explode drops their empty arrays).
    */
  def ngramDiversity(docs: DataFrame, textCol: String, groupCol: String,
                     n: Int = 3): DataFrame = {
    val toks = Dedup.wordTokens(col(textCol))
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
                           i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    docs.select(col(groupCol), explode(grams).as("__g"))
      .groupBy(groupCol, "__g")
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(groupCol)
      .agg(sum("__cnt").as("n_grams"),
           count(lit(1)).as("distinct_grams"),
           sum(when(col("__cnt") > 1, col("__cnt")).otherwise(0L))
             .as("__rep"))
      .select(col(groupCol),
              col("n_grams"),
              col("distinct_grams"),
              round(col("distinct_grams").cast("double") / col("n_grams"), 6)
                .as("ttr"),
              round(col("__rep").cast("double") / col("n_grams"), 6)
                .as("rep_frac"))
  }

  /** Vocabulary-growth curve (Heaps' law: vocab(N) ≈ K·N^β, β ≈ 0.5 for
    * natural text): the number of DISTINCT word types seen after reading
    * the first 1/nGrid, 2/nGrid, … of the doc_id-ordered token stream.
    * A corpus whose curve flattens early is repeating itself; one whose
    * curve stays near-linear is noise — the companion diagnostic to
    * [[ngramDiversity]]'s end-state ratios.
    *
    * Scale shape: the ordered prefix is NOT a data-scale sort — each
    * token's global position comes from [[Sharding.tokenOffsets]]'s
    * two-phase prefix sum (doc offset + in-doc posexplode index), the
    * per-type first occurrence is one groupBy(word).min shuffle
    * (proportional to distinct types, with map-side combine), and the
    * curve itself is a grid-binned count: `bin = first·nGrid div total`,
    * an nGrid-row aggregate cum-summed in one bounded window. Pure
    * BIGINT arithmetic throughout (first·nGrid ≤ 10× corpus tokens «
    * 2^63), replayed exactly by the oracle. Returns one row per grid
    * point: `grid_idx, prefix_toks (= ceil(g·total/nGrid)), new_types,
    * vocab`.
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  nGrid: Int = 10, nBuckets: Int = 32): DataFrame = {
    require(nGrid > 0, "nGrid must be positive")
    val toks = docs.select(col(idCol),
                           Dedup.wordTokens(col(textCol)).as("__toks"))
      .withColumn("__ntoks", size(col("__toks")).cast("long"))
    // shardTokens is irrelevant here — MaxValue collapses shard_id to 0
    val offsets = Sharding.tokenOffsets(toks, idCol, "__ntoks", nBuckets,
                                        Long.MaxValue)
    val first = offsets
      .select(col("global_offset"),
              posexplode(col("__toks")).as(Seq("__pos", "__word")))
      .groupBy("__word")
      .agg(min(col("global_offset") + col("__pos")).as("__first"))
    val total = toks.agg(sum("__ntoks").as("__total"))
    val binCounts = first.crossJoin(broadcast(total))
      .withColumn("__bin", expr(s"(__first * $nGrid) div __total"))
      .groupBy("__bin")
      .agg(count(lit(1)).as("new_types"))
    val grid = docs.sparkSession.range(0, nGrid).toDF("__bin")
    val cumW = Window.orderBy("__bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(binCounts, Seq("__bin"), "left")
      .na.fill(0L, Seq("new_types"))
      .crossJoin(broadcast(total))
      .select((col("__bin") + 1).cast("int").as("grid_idx"),
              expr(s"((__bin + 1) * __total + ${nGrid - 1}) div $nGrid")
                .as("prefix_toks"),
              col("new_types"),
              sum("new_types").over(cumW).as("vocab"))
      .orderBy("grid_idx")
  }

  /** [[corpusStats]] from an existing (token, n) table. */
  def statsFromCounts(counts: DataFrame, topK: Int = 100): DataFrame = {
    val tc = counts
      .select(col("token"), col("n").cast("double").as("n"))
      .transform(graft.Materialize(_))

    val global = tc.agg(
      sum("n").as("nt"),
      count(lit(1)).as("nd"),
      sum(col("n") * log2(col("n"))).as("s"))

    // TakeOrderedAndProject keeps this a per-partition top-k; the window
    // then ranks only the ≤ topK surviving rows (single tiny partition).
    val top = tc.orderBy(desc("n"), asc("token")).limit(topK)
      .withColumn("rk",
                  row_number().over(Window.orderBy(desc("n"), asc("token")))
                    .cast("double"))
      .select(log(col("rk")).as("x"), log(col("n")).as("y"))
    val fit = top.agg(
      count(lit(1)).cast("double").as("k"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))

    val slope = (col("k") * col("sxy") - col("sx") * col("sy")) /
      (col("k") * col("sxx") - col("sx") * col("sx"))
    global.crossJoin(fit).select(
      col("nt").cast("long").as("n_tokens"),
      col("nd").cast("long").as("n_distinct"),
      round(col("nd") / col("nt"), 6).as("ttr"),
      round(log2(col("nt")) - col("s") / col("nt"), 6).as("entropy_bits"),
      round(slope, 6).as("zipf_slope"),
      round((col("sy") - slope * col("sx")) / col("k"), 6)
        .as("zipf_intercept"))
  }
}
