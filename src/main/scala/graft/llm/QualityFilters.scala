package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition/quality filters and deterministic sampling for training-data
  * pipelines — the Gopher-style (Rae et al. 2021, arXiv:2112.11446 §A1.1)
  * repetition rules, PII masking, and hash-threshold sampling. All
  * row-local expressions (zero shuffle, scan speed at 100 TB); the
  * aggregate queries over them are one partial-agg shuffle.
  *
  * HOF scale rule (see [[Dedup.shinglesOfNorm]]): lambdas re-evaluate
  * referenced outer expressions per element, so every helper that refers
  * to an array inside a lambda REQUIRES a materialized column reference —
  * [[repetitionProfile]] shows the intended composition.
  */
object QualityFilters {

  /** Non-empty trimmed lines of a document. Materialize before the
    * duplicate-line metrics.
    */
  def docLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Gopher duplicate-line fraction: 1 − |distinct lines| / |lines|
    * (0 for ≤1 line). `linesCol` must be a materialized column.
    */
  def duplicateLineFraction(linesCol: Column): Column =
    when(size(linesCol) <= 1, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(linesCol)).cast("double") /
        size(linesCol).cast("double"))

  /** Gopher duplicate-line CHARACTER fraction: chars inside lines whose
    * value occurs more than once, over total line chars.
    */
  def duplicateLineCharFraction(linesCol: Column): Column = {
    val dupChars = aggregate(linesCol, lit(0L), (acc, l) =>
      acc + when(size(filter(linesCol, x => x === l)) > 1,
                 length(l).cast("long")).otherwise(lit(0L)))
    val totChars = aggregate(linesCol, lit(0L),
                             (acc, l) => acc + length(l).cast("long"))
    when(totChars === 0, lit(0.0))
      .otherwise(dupChars.cast("double") / totChars.cast("double"))
  }

  /** Word n-gram occurrence list (NOT distinct — the repetition metrics
    * need multiplicities). `toks` must be a materialized column.
    */
  def ngramOccurrences(toks: Column, n: Int): Column =
    when(size(toks) < n, array()).otherwise(
      transform(sequence(lit(0), size(toks) - n),
                i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Gopher top-n-gram character fraction: characters covered by the most
    * frequent word n-gram (count × gram length) over total text chars.
    * Tie-break: the longer gram, then lexicographic — fully deterministic.
    * `gramsCol` and `distinctCol` must be materialized columns.
    */
  def topNgramCharFraction(gramsCol: Column, distinctCol: Column,
                           text: Column): Column = {
    val scored = transform(distinctCol, d =>
      struct(size(filter(gramsCol, g => g === d)).as("cnt"),
             length(d).as("len"), d.as("gram")))
    val best = array_max(scored)
    when(size(gramsCol) === 0 || length(text) === 0, lit(0.0)).otherwise(
      least(lit(1.0),
        (best.getField("cnt") * best.getField("len")).cast("double") /
          length(text).cast("double")))
  }

  /** One-call Gopher repetition profile: duplicate-line fraction,
    * duplicate-line char fraction, top-2-gram char fraction.
    */
  def repetitionProfile(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__lines", docLines(col(textCol)))
      .withColumn("dup_line_frac",
                  round(duplicateLineFraction(col("__lines")), 4))
      .withColumn("dup_line_char_frac",
                  round(duplicateLineCharFraction(col("__lines")), 4))
      .withColumn("__toks", Dedup.wordTokens(col(textCol)))
      .withColumn("__grams2", ngramOccurrences(col("__toks"), 2))
      .withColumn("__dgrams2", array_distinct(col("__grams2")))
      .withColumn("top_2gram_char_frac",
                  round(topNgramCharFraction(col("__grams2"),
                                             col("__dgrams2"),
                                             col(textCol)), 4))
      .drop("__lines", "__toks", "__grams2", "__dgrams2")

  /** PII masking: emails, URLs, IPv4 addresses → typed placeholder
    * tokens. Plain character-class regexes (no backrefs/lookaround) so
    * Java regex and DuckDB's RE2 agree byte-for-byte.
    */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe   = "https?://[^\\s]+"
  private val ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def maskPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "<URL>"),
        emailRe, "<EMAIL>"),
      ipv4Re, "<IP>")

  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(emailRe)),
     regexp_count(text, lit(urlRe)),
     regexp_count(text, lit(ipv4Re)))

  /** Deterministic hash-threshold sampling: keep a row iff the first 4
    * hex chars of md5(key) sort below `thresholdHex4` — a content-stable
    * ~(threshold/0x10000) sample that is reproducible across engines
    * (md5 hex strings compare identically everywhere), partitions, and
    * reruns, with no RNG state. The standard web-pipeline holdout trick.
    */
  def hashSampleFlag(key: Column, thresholdHex4: String): Column = {
    require(thresholdHex4.matches("[0-9a-f]{4}"),
            s"threshold must be 4 lowercase hex chars, got $thresholdHex4")
    substring(md5(key.cast("string").cast("binary")), 1, 4) < thresholdHex4
  }

  /** Weighted dataset mixing: per-stratum deterministic hash-threshold
    * rates — the "sampling weights per source" step that assembles a
    * training mixture (e.g. keep 90% of en, 25% of zh). Same md5-prefix
    * mechanics as [[hashSampleFlag]], so membership is content-stable,
    * engine-portable, RNG-free, and each stratum's kept set NESTS as its
    * weight grows. Row-local (scan-speed at 100 TB; no shuffle).
    *
    * `weights` maps stratum value → 4-hex-digit threshold (≈ rate ×
    * 0x10000); strata not listed fall back to `defaultHex4`.
    */
  def weightedMix(df: DataFrame, stratumCol: String, keyCol: String,
                  weights: Map[String, String],
                  defaultHex4: String = "0000"): DataFrame = {
    (weights.values.toSeq :+ defaultHex4).foreach { t =>
      require(t.matches("[0-9a-f]{4}"),
              s"thresholds must be 4 lowercase hex chars, got $t")
    }
    val threshold = weights.foldLeft(lit(defaultHex4)) {
      case (acc, (k, t)) => when(col(stratumCol) === k, lit(t)).otherwise(acc)
    }
    df.filter(
      substring(md5(col(keyCol).cast("string").cast("binary")), 1, 4)
        < threshold)
  }

  /** Temperature-controlled stratum rebalancing — the multilingual mixing
    * rule (mT5 / XLM-R): sampling rate per stratum ∝ n^(1/T), so
    * high-resource strata are DOWN-sampled toward the low-resource tail
    * as T grows (T=1 reproduces proportional sampling; T→∞ uniform).
    * T ∈ {1, 2, 4} keeps the weight arithmetic a sqrt chain — IEEE sqrt
    * is correctly rounded, so weights are bit-portable across engines
    * (a general pow() is not). Weights quantize to ⌊w·10⁶⌋ integers, the
    * weight/row totals are exact integer sums, the per-stratum keep
    * threshold is a ppm from one fixed-order double expression, and
    * membership is the md5-prefix trick compared in EXACT integer space
    * (h·10⁶ < ppm·2³², both ≤ 4.4e15 — no float boundary). Row-local
    * after two tiny aggregations; content-stable, RNG-free.
    *
    * Returns the input plus (n_total, thresh_ppm, keep).
    */
  def temperatureSample(df: DataFrame, stratumCol: String, keyCol: String,
                        budgetFrac: Double,
                        temperature: Int = 2): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1, "budgetFrac in (0,1]")
    require(Set(1, 2, 4).contains(temperature),
            "temperature must be 1, 2, or 4 (sqrt-chain portability)")
    def w(c: Column): Column = temperature match {
      case 1 => c.cast("double")
      case 2 => sqrt(c)
      case 4 => sqrt(sqrt(c))
    }
    val counts = df.groupBy(col(stratumCol).as("__stratum"))
      .agg(count(lit(1)).as("n_total"))
      .withColumn("wq", floor(w(col("n_total")) * 1000000).cast("long"))
    val tot = counts.agg(sum("n_total").as("n_corpus"),
                         sum("wq").as("w_sum"))
    val thr = counts.crossJoin(broadcast(tot))
      .withColumn("target",
                  floor(col("n_corpus") * lit(budgetFrac)).cast("long"))
      .withColumn("thresh_ppm",
        // target cast to double BEFORE the multiply: LONG*LONG would wrap
        // silently past ~1e9-row strata (target*wq > Long.MaxValue) while
        // DuckDB's BIGINT*BIGINT raises — double-first keeps both engines
        // on the identical IEEE op sequence at any corpus size
        least(lit(1000000L),
              floor(col("target").cast("double") * col("wq") / col("w_sum")
                      / col("n_total") * 1000000.0).cast("long")))
      .select(col("__stratum"), col("n_total"), col("thresh_ppm"))
    val h = expr(s"CAST(conv(substring(md5(CAST($keyCol AS STRING)), 1, 8)" +
                 s", 16, 10) AS BIGINT)")
    df.join(broadcast(thr), col(stratumCol) === col("__stratum"))
      .drop("__stratum")
      .withColumn("keep",
                  h * 1000000L < col("thresh_ppm") * 4294967296L)
  }

  /** Balanced per-stratum sampling: the first `n` rows of each stratum in
    * md5(key) order — a deterministic, content-stable "random" balanced
    * subset (class-balanced training sets, per-language caps). No RNG
    * state, reproducible across engines/partitions/reruns.
    *
    * Plan: one shuffle on the stratum key; Spark's WindowGroupLimit
    * pushes the rank limit below the sort, so each task keeps only n rows
    * per stratum — never a full per-stratum sort at the reducer.
    */
  def stratifiedTopN(df: DataFrame, strataCol: String, keyCol: String,
                     n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(col(keyCol).cast("string").cast("binary")))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** PER-ROW-weighted deterministic sampling — the priority-sampling
    * complement of [[weightedMix]] (whose rates are per-STRATUM): each
    * row draws a content-stable uniform key h from md5(key:salt) and
    * competes with priority h/weight, and the k smallest priorities per
    * stratum win. Heavier rows draw proportionally smaller priorities,
    * so inclusion odds scale with the weight column (token counts,
    * quality scores) — the Efraimidis–Spirakis priority-sampling shape
    * with the exponential key replaced by a uniform one: exp keys make
    * inclusion probabilities exactly ∝w but need ln(), whose last-ulp
    * varies across math libraries; h/w is ONE correctly-rounded IEEE
    * divide on a 52-bit-exact integer, so priorities (and the sample)
    * are bit-identical in any engine. QualityFiltersSpec pins the
    * ∝w pull statistically.
    *
    * Plan: row-local hash + divide, then ONE shuffle on the stratum key
    * where WindowGroupLimit keeps ≤k rows per task — never a full
    * per-stratum sort. Returns the winners with their `rank`.
    */
  def weightedPrioritySample(df: DataFrame, strataCol: String,
                             keyCol: String, weightCol: String, k: Int,
                             salt: String = "wps"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 13 hex digits = 52 bits: exact in an IEEE double, so the
    // long→double cast below is value-preserving in every engine.
    val h = conv(substring(md5(concat(col(keyCol).cast("string"),
                                      lit(":" + salt)).cast("binary")),
                           1, 13), 16, 10).cast("long")
    val w = Window.partitionBy(strataCol)
      .orderBy(asc_nulls_last("__pri"), asc(keyCol))
    // nonpositive weights draw a NULL priority and sort last: they can
    // only fill slots no positive-weight row wants (and never crash
    // ANSI division; DuckDB replays the same CASE)
    df.withColumn("__pri",
                  when(col(weightCol) > 0,
                       h.cast("double") / col(weightCol).cast("double")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .drop("__pri")
  }

  /** Gopher-style document quality gate (Rae et al. 2021 §A1.1): word
    * count bounds, mean word length band, symbol-to-word ratio, bullet /
    * ellipsis line fractions, alphabetic-word fraction, minimum distinct
    * stopword hits. Returns the stats AND the composite `keep` flag so
    * pipelines can either filter or audit. All row-local expressions;
    * `toks` / `lines` must be materialized columns (HOF scale rule).
    */
  /** Perplexity-driven domain reweighting — the DoReMi/CCNet idea of
    * letting a reference LM's judgment set the training mixture: domains
    * whose documents the reference model finds surprising (high mean
    * perplexity) are DOWN-weighted from their natural token share by
    * `exp(−η · excessPpl)`, then renormalized. One deterministic round
    * (the published method iterates with a proxy model; the fixed-point
    * arithmetic here is the portable, oracle-checkable core).
    *
    * All arithmetic is exact-integer after the per-doc ppl quantization:
    * per-domain mean ppl is an integer division of summed ×10⁴ longs
    * (order-independent), the multiplier is exp of an exactly-determined
    * double rounded to ppm, and the final weights are HUGEINT-free ppm
    * ratios via decimal floor division — so another engine reproduces
    * every output bit. Plan: one groupBy(domain) over the scored docs +
    * two one-row broadcasts (min, total) — #domains-row arithmetic after
    * a single aggregation pass.
    *
    * Input: per-doc rows with a domain column, the 4-decimal `pplCol`
    * (from [[NgramLm.scoreDocs]]), and an integer token-mass column.
    * `etaE2` is η in hundredths (100 = 1.0) so configs stay exact.
    */
  def perplexityDomainWeights(scored: DataFrame, domainCol: String,
                              pplCol: String, massCol: String,
                              etaE2: Int = 100): DataFrame = {
    val d = scored.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col(massCol).cast("long")).as("n_tokens"),
           sum(floor(col(pplCol) * 10000.0d + 0.5d).cast("long"))
             .as("__ppl_sum"))
      .withColumn("avg_ppl_e4", expr("__ppl_sum div n_docs"))
    val mins = d.agg(min("avg_ppl_e4").as("__min_e4"))
    val u = d.crossJoin(broadcast(mins))
      .withColumn(
        "u_ppm",
        floor(exp(lit(-etaE2 / 100.0d) *
                    ((col("avg_ppl_e4") - col("__min_e4")).cast("double")
                       / 10000.0d))
                * 1000000.0d + 0.5d).cast("long"))
      .withColumn("__unnorm", col("n_tokens") * col("u_ppm"))
    val tot = u.agg(sum("__unnorm").as("__tot"))
    u.crossJoin(broadcast(tot))
      // exact integer floor-division (IntegralDivide): a decimal `/`
      // rounds HALF_UP at the result scale BEFORE the floor, so a true
      // ratio within ~5e-7 below an integer would round up past the
      // exact floor the DuckDB `//` oracle computes — div truncates the
      // exact quotient instead (all operands nonnegative ⇒ trunc = floor)
      .withColumn(
        "weight_ppm",
        expr("CAST((CAST(__unnorm AS DECIMAL(38,0)) * 1000000) div " +
             "CAST(__tot AS DECIMAL(38,0)) AS BIGINT)"))
      .select("domain", "n_docs", "n_tokens", "avg_ppl_e4", "u_ppm",
              "weight_ppm")
  }

  def gopherStats(df: DataFrame, textCol: String,
                  minStopwordHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val toks  = col("__toks")
    val lines = col("__lines")
    val nWords = size(toks)
    val meanWordLen =
      when(nWords === 0, lit(0.0)).otherwise(
        aggregate(toks, lit(0L), (acc, x) => acc + length(x).cast("long"))
          .cast("double") / nWords.cast("double"))
    val symbolRatio =
      when(nWords === 0, lit(0.0)).otherwise(
        (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")))
          .cast("double") / nWords.cast("double"))
    val bulletFrac =
      when(size(lines) === 0, lit(0.0)).otherwise(
        size(filter(lines, l => l.startsWith("-") || l.startsWith("*") ||
                                l.startsWith("•"))).cast("double") /
          size(lines).cast("double"))
    val ellipsisFrac =
      when(size(lines) === 0, lit(0.0)).otherwise(
        size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
          .cast("double") / size(lines).cast("double"))
    val alphaFrac =
      when(nWords === 0, lit(0.0)).otherwise(
        size(filter(toks, x => x.rlike("[a-z]"))).cast("double") /
          nWords.cast("double"))
    val stopHits = size(array_intersect(
      toks, array(TextAnalysis.gopherStopwords.map(lit): _*)))
    df.withColumn("__toks", Dedup.wordTokens(t))
      .withColumn("__lines", docLines(t))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("mean_word_len", round(meanWordLen, 4))
      .withColumn("symbol_ratio", round(symbolRatio, 4))
      .withColumn("bullet_line_frac", round(bulletFrac, 4))
      .withColumn("ellipsis_line_frac", round(ellipsisFrac, 4))
      .withColumn("alpha_word_frac", round(alphaFrac, 4))
      .withColumn("stopword_hits", stopHits.cast("long"))
      .withColumn("keep",
        col("n_words") >= 5 && col("n_words") <= 100000 &&
        col("mean_word_len") >= 2.0 && col("mean_word_len") <= 10.0 &&
        col("symbol_ratio") <= 0.1 &&
        col("bullet_line_frac") <= 0.9 &&
        col("ellipsis_line_frac") <= 0.3 &&
        col("alpha_word_frac") >= 0.8 &&
        col("stopword_hits") >= minStopwordHits)
      .drop("__toks", "__lines")
  }

  /** Token-budget subsetting, at-scale form: keep the highest-quality
    * docs until ~`budgetFrac` of the corpus's tokens are spent. Instead
    * of the exact global cumulative-sum window (a data-scale total order
    * — the q73 correctness anchor), this picks a QUALITY THRESHOLD with
    * `approxQuantile` (a distributed sketch, O(1/relErr) to the driver)
    * and keeps every doc above it — two scans, no global sort, ±ε on the
    * budget. Assumes tokens are roughly uniform across the quality range
    * (true of natural corpora; for a pathological token/quality
    * correlation, iterate on the quantile).
    *
    * Returns the kept docs as (idCol, toks, q); the spec brackets the
    * kept token share against the target on real data.
    */
  def approxTokenBudget(df: DataFrame, idCol: String, textCol: String,
                        budgetFrac: Double = 0.5,
                        relErr: Double = 0.01): DataFrame = {
    require(budgetFrac > 0 && budgetFrac < 1, "budgetFrac in (0,1)")
    val scored = df.select(
      col(idCol),
      TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("toks"),
      TextAnalysis.qualityScore(col(textCol)).as("q"))
      .transform(graft.Materialize(_)) // scanned twice: quantile sketch + filter
    val cut = scored.stat
      .approxQuantile("q", Array(1.0 - budgetFrac), relErr)(0)
    scored.filter(col("q") >= cut)
  }

  /** Per-source token-budget allocation — the release-mix allocator
    * ("sample an N-token corpus: web-heavy, best documents first"):
    * `budgetFraction` of the corpus's tokens is split across sources in
    * proportion to RELATIVE INTEGER weights (integer sums are exact and
    * order-independent, so the per-source budgets are engine- and
    * partitioning-portable — a double-weight sum would not be), then
    * each source's budget fills best-quality-first (ties → smallest id)
    * until the next document would overflow it.
    *
    * Output: one row per SELECTED doc — (doc_id, source, toks, q,
    * cum_toks, src_budget). Budgets are
    * floor(total·fraction·w/Σw): sources missing from `weights` get
    * `defaultWeight`.
    *
    * Scale shape: one row-local scoring scan; a one-row total and a
    * #sources-row weight sum, both broadcast back; one cumulative-sum
    * window PER SOURCE (ids + two numbers, never text). The per-source
    * sort is the exact-form anchor of [[mixtureTokenBudgetApprox]],
    * the implemented 100 TB form (token-weighted histogram cutoffs —
    * no per-source sort).
    */
  def mixtureTokenBudget(df: DataFrame, idCol: String, textCol: String,
                         sourceCol: String, budgetFraction: Double,
                         weights: Map[String, Long],
                         defaultWeight: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetFraction > 0 && budgetFraction <= 1,
            "budgetFraction in (0,1]")
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
            "weights must be non-negative")
    val s = df.select(
      col(idCol).as("doc_id"), col(sourceCol).as("source"),
      TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("toks"),
      TextAnalysis.qualityScore(col(textCol)).as("q"))
      .withColumn("w", weights.foldLeft(lit(defaultWeight)) {
        case (acc, (k, v)) =>
          when(col("source") === k, lit(v)).otherwise(acc)
      })
    val total = s.agg(sum("toks").as("total_toks"))
    val wsum = s.select("source", "w").distinct()
      .agg(sum("w").as("w_sum"))
    val win = Window.partitionBy("source")
      .orderBy(desc("q"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.crossJoin(broadcast(total)).crossJoin(broadcast(wsum))
      .withColumn("src_budget",
                  floor(col("total_toks") * lit(budgetFraction)
                          * col("w") / col("w_sum")).cast("long"))
      .withColumn("cum_toks", sum("toks").over(win))
      .filter(col("cum_toks") <= col("src_budget"))
      .select("doc_id", "source", "toks", "q", "cum_toks", "src_budget")
  }

  /** [[mixtureTokenBudget]]'s at-scale twin — the production form the
    * exact per-source cumulative sort anchors. The quality score lives
    * in [0,1], so each source's token mass is histogrammed over a fixed
    * `grid` of quality bins (ONE narrow groupBy — #sources × (grid+1)
    * rows total), the per-source suffix cumsum over that BOUNDED
    * histogram (a window over ≤ grid+1 pre-aggregated rows, never data
    * rows) yields "tokens spent keeping everything at or above bin b",
    * and the cutoff is the lowest bin whose spend fits the budget. A
    * broadcast join + filter then keeps `q >= q_cut`. No data-scale
    * sort anywhere, and — unlike a doc-count quantile — the cutoff is
    * TOKEN-weighted, so a quality/length correlation (short docs score
    * lower) cannot overshoot the budget: spend is ≤ budget by
    * construction and under-fills by at most one bin's token mass.
    *
    * Empty-selection edge: the under-fill bound above assumes the top
    * bin fits. If a source's TOP quality bin alone already exceeds its
    * budget, no bin satisfies `spend <= src_budget` and the source is
    * dropped entirely (0 kept docs), whereas the exact form may still
    * keep a few leading docs that individually fit. This is deliberate:
    * recovering those docs would need a per-doc order within the bin —
    * exactly the data-scale sort this twin exists to avoid — and keeping
    * the whole top bin would overshoot the budget. At production grids
    * (≥200 bins) a single bin holding more than a source's entire budget
    * means the budget is a tiny sliver of that source; the exact anchor
    * remains the tool for that regime. The spec pins this edge.
    *
    * Output: (doc_id, source, toks, q, q_cut, src_budget) — kept docs
    * only. The spec brackets per-source kept tokens against the exact
    * form's budget fill.
    */
  def mixtureTokenBudgetApprox(df: DataFrame, idCol: String,
                               textCol: String, sourceCol: String,
                               budgetFraction: Double,
                               weights: Map[String, Long],
                               defaultWeight: Long = 1L,
                               grid: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetFraction > 0 && budgetFraction <= 1,
            "budgetFraction in (0,1]")
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
            "weights must be non-negative")
    require(grid >= 10, "grid too coarse to realize a budget")
    val s = df.select(
      col(idCol).as("doc_id"), col(sourceCol).as("source"),
      TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("toks"),
      TextAnalysis.qualityScore(col(textCol)).as("q"))
      .withColumn("w", weights.foldLeft(lit(defaultWeight)) {
        case (acc, (k, v)) =>
          when(col("source") === k, lit(v)).otherwise(acc)
      })
      .transform(graft.Materialize(_)) // scanned twice: histogram + filter
    val total = s.agg(sum("toks").as("total_toks"))
    val wsum = s.select("source", "w").distinct()
      .agg(sum("w").as("w_sum"))
    val hist = s
      .groupBy(col("source"),
               least(lit(grid), floor(col("q") * grid)).cast("int")
                 .as("qb"))
      .agg(sum("toks").as("btoks"), first("w").as("w"))
    // suffix token mass: spend(b) = Σ btoks over bins ≥ b (≤ grid+1
    // rows per source — an aggregate-scale window, not a data one)
    val wDesc = Window.partitionBy("source").orderBy(desc("qb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cuts = hist
      .withColumn("spend", sum("btoks").over(wDesc))
      .crossJoin(broadcast(total)).crossJoin(broadcast(wsum))
      .withColumn("src_budget",
                  floor(col("total_toks") * lit(budgetFraction)
                          * col("w") / col("w_sum")).cast("long"))
      .filter(col("spend") <= col("src_budget"))
      .groupBy("source")
      .agg(min("qb").as("cut_bin"), first("src_budget").as("src_budget"))
      .withColumn("q_cut", col("cut_bin").cast("double") / grid)
      .select("source", "q_cut", "src_budget")
    s.join(broadcast(cuts), "source")
      .filter(col("src_budget") > 0 && col("q") >= col("q_cut"))
      .select("doc_id", "source", "toks", "q", "q_cut", "src_budget")
  }

  /** Per-source epoch schedule for a token budget — the data-constrained
    * training plan (Muennighoff et al. 2023's repeat-vs-mix question):
    * given a total budget of `budgetMult` × corpus tokens, split it by
    * temperature weight (the [[temperatureSample]] sqrt chain), then cap
    * each source at `maxEpochs` passes over its own tokens; `capped`
    * sources would be over-repeated and the planner reallocates their
    * unmet remainder in the next iteration (reported, not looped, here).
    *
    * One row per SOURCE: the token totals are the only data-scale
    * aggregation (partial agg → one shuffle on source), then all
    * planning math runs on that #sources-row frame against a broadcast
    * 1-row total. Arithmetic is the portable integer-weight pattern:
    * integer token sums, `floor(sqrt·1e6)` weights, double-FIRST
    * multiplies (never LONG·LONG that could wrap at 100 TB — the
    * [[temperatureSample]] overflow lesson), so any SQL engine replays
    * it bit-identically.
    */
  def epochSchedule(df: DataFrame, sourceCol: String, textCol: String,
                    budgetMult: Double, maxEpochs: Int = 4,
                    temperature: Int = 2): DataFrame = {
    require(budgetMult > 0, "budgetMult must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    require(Set(1, 2, 4).contains(temperature),
            "temperature must be 1, 2, or 4 (sqrt-chain portability)")
    def w(c: Column): Column = temperature match {
      case 1 => c.cast("double")
      case 2 => sqrt(c)
      case 4 => sqrt(sqrt(c))
    }
    val perSrc = df
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(graft.llm.TextAnalysis.wsTokenCount(col(textCol))
                 .cast("long")).as("n_toks"))
      .withColumn("wq", floor(w(col("n_toks")) * 1000000).cast("long"))
    val tot = perSrc.agg(sum("n_toks").as("n_corpus"),
                         sum("wq").as("w_sum"))
    perSrc.crossJoin(broadcast(tot))
      .withColumn("budget",
                  floor(col("n_corpus").cast("double") * budgetMult)
                    .cast("long"))
      .withColumn("weight_ppm",
                  floor(col("wq").cast("double") * 1000000.0 / col("w_sum"))
                    .cast("long"))
      .withColumn("target_toks",
                  floor(col("wq").cast("double") * col("budget")
                          / col("w_sum")).cast("long"))
      .withColumn("cap_toks", col("n_toks") * maxEpochs)
      .withColumn("effective_toks", least(col("target_toks"), col("cap_toks")))
      .withColumn("epochs_x1000",
                  floor(col("effective_toks").cast("double") * 1000.0
                          / col("n_toks")).cast("long"))
      .withColumn("capped", col("target_toks") > col("cap_toks"))
      .select("source", "n_toks", "weight_ppm", "target_toks",
              "effective_toks", "epochs_x1000", "capped")
  }

  /** Per-domain document cap (the DCLM/RefinedWeb curation rule): keep at
    * most `cap` documents per domain, highest `scoreCol` first (ties by
    * id — fully deterministic). Over-represented domains (SEO farms, one
    * crawler-friendly wiki) otherwise dominate a corpus however good the
    * per-doc filters are.
    *
    * Plan: one shuffle on the domain key; WindowGroupLimit pushes the
    * rank bound below the sort (the [[stratifiedTopN]] shape), so each
    * task retains ≤ cap rows per domain — never a full per-domain sort
    * at the reducer. Returns the surviving rows + their `domain_rank`.
    */
  def domainCap(df: DataFrame, domainCol: String, idCol: String,
                scoreCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(domainCol)
      .orderBy(desc(scoreCol), asc(idCol))
    df.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= cap)
  }

  /** C4-style LINE-level structural cleaning (Raffel et al. 2020 §2.2 —
    * the rules that act on lines, complementing [[Dedup.lineDedup]]'s
    * cross-doc duplicate strike): keep only lines that end in terminal
    * punctuation (optionally quoted), carry ≥ `minLineWords` words, and
    * are not list/nav chrome (bullet or numbered-list markers). Returns
    * per-doc counts, the floored kept-fraction, and the md5 of the
    * cleaned text (narrow output; the cleaned text itself is
    * reconstructable and row-local).
    *
    * All higher-order functions over a materialized line array — zero
    * shuffle, scan-speed row-local, SQL-replayable.
    */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
                   minLineWords: Int = 3): DataFrame = {
    val keepLine: Column => Column = l =>
      l.rlike("[.!?][\"']?$") &&
        size(split(l, "\\s+")) >= minLineWords &&
        !l.rlike("^([-*>•]|\\d+[.)])\\s")
    df.select(col(idCol).as("doc_id"),
              filter(transform(split(col(textCol), "\n"), l => trim(l)),
                     l => length(l) > 0).as("__ls"))
      .withColumn("__kept", filter(col("__ls"), keepLine))
      .select(
        col("doc_id"),
        size(col("__ls")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        when(size(col("__ls")) === 0, lit(0.0))
          .otherwise(
            floor(size(col("__kept")).cast("double") /
                    size(col("__ls")) * 1e6d + 0.5d) / 1e6d)
          .as("kept_frac"),
        md5(array_join(col("__kept"), "\n").cast("binary")).as("clean_md5"))
  }
}
