package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the QA gate every labeling pipeline
  * (RLHF preference raters, quality-label vendors, eval graders) needs
  * before anyone trains on the labels: how much do the raters agree
  * beyond chance? Low kappa means the labeling GUIDELINE is broken, not
  * the model; per-pair kappa localizes WHICH rater drifted.
  *
  * Input shape: one row per (item, rater, label) with binary labels
  * (0/1). Both statistics are exact integer arithmetic in ppm — no
  * float summation anywhere, so results are partitioning/engine/row-
  * order invariant and fully SQL-replayable:
  *
  *  - Cohen's kappa per unordered rater pair:
  *    `po = agree/n`, `pe = (a1·b1 + a0·b0)/n²`,
  *    `kappa = (po − pe)/(1 − pe)`, all floored to ppm with the
  *    products widened through DECIMAL(38,0) (n² ppm overflows BIGINT
  *    past ~3e6 items; HUGEINT on the DuckDB side).
  *  - Fleiss' kappa over all raters at once (works for any rater count,
  *    including items rated by a subset): per item with r ratings of
  *    which r1 are 1s, the agreeing rater-pairs are
  *    `C(r1,2) + C(r−r1,2)` of `C(r,2)`; `po` is the global ratio,
  *    `pe = p1² + p0²` from the pooled label marginals.
  *
  * Scale shape: the pairwise stats are one self-join co-partitioned on
  * the item id (labels are R·N rows — R small — so this is one shuffle
  * of the label table, never of content) followed by a map-side-combined
  * aggregation to ≤ R² counter rows; Fleiss is one groupBy(item) to
  * per-item counters, then a single bounded global aggregate. Nothing
  * driver-side, nothing quadratic in items.
  */
object Annotation {

  /** Per-pair Cohen rows + one Fleiss row over a binary-label rating
    * table. Output: `(pair, n, agree, po_ppm, pe_ppm, kappa_ppm)` where
    * `pair` is `"cohen <a>:<b>"` per rater pair (a < b, n = co-rated
    * items, agree = matching labels) or `"fleiss"` (n = items rated by
    * ≥ 2 raters, agree = agreeing rater-pairs, po/pe over rater-pairs).
    */
  def agreement(labels: DataFrame, itemCol: String, raterCol: String,
                labelCol: String): DataFrame = {
    val l = labels.select(col(itemCol).as("__item"),
                          col(raterCol).cast("long").as("__rater"),
                          col(labelCol).cast("long").as("__label"))
    val a = l.select(col("__item"), col("__rater").as("ra"),
                     col("__label").as("la"))
    val b = l.select(col("__item"), col("__rater").as("rb"),
                     col("__label").as("lb"))
    val pairs = a.join(b, Seq("__item")).filter(col("ra") < col("rb"))
      .groupBy("ra", "rb")
      .agg(count(lit(1)).as("n"),
           sum(when(col("la") === col("lb"), 1L).otherwise(0L))
             .as("agree"),
           sum("la").as("a1"), sum("lb").as("b1"))
    val cohen = pairs.select(
      concat(lit("cohen "), col("ra"), lit(":"), col("rb")).as("pair"),
      col("n"), col("agree"),
      expr("agree * 1000000 DIV n").as("po_ppm"),
      expr("""CAST(((CAST(a1 AS DECIMAL(38,0)) * b1
             |  + CAST(n - a1 AS DECIMAL(38,0)) * (n - b1)) * 1000000)
             |  DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"""
        .stripMargin.replace("\n", " ")).as("pe_ppm"))
    // per-item rating counters → exact rater-pair agreement counts
    val perItem = l.groupBy("__item")
      .agg(count(lit(1)).as("r"), sum("__label").as("r1"))
      .filter(col("r") >= 2)
    val fleiss = perItem.agg(
        count(lit(1)).as("n"),
        sum(expr("(r1 * (r1 - 1) + (r - r1) * (r - r1 - 1)) DIV 2"))
          .as("agree"),
        sum(expr("(r * (r - 1)) DIV 2")).as("npairs"),
        sum("r1").as("t1"), sum("r").as("t"))
      .select(
        lit("fleiss").as("pair"), col("n"), col("agree"),
        expr("agree * 1000000 DIV npairs").as("po_ppm"),
        expr("""CAST(((CAST(t1 AS DECIMAL(38,0)) * t1
               |  + CAST(t - t1 AS DECIMAL(38,0)) * (t - t1)) * 1000000)
               |  DIV (CAST(t AS DECIMAL(38,0)) * t) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("pe_ppm"))
    // pe = 1 (degenerate one-class marginals) leaves kappa undefined:
    // pin the convention — perfect agreement stays 1, anything else 0 —
    // so constant-label inputs never divide by zero (mirrored in the
    // oracle SQL). Rounding convention: TRUNCATION TOWARD ZERO on both
    // sides — Spark `DIV` truncates, and the installed DuckDB 1.0.0's
    // `//` ALSO truncates toward zero (verified in-container:
    // (0-7)//2 = -3, not -4), so plain DIV here replays bit-exactly,
    // including negative (below-chance) kappa. Do NOT "fix" this to
    // floor division: that creates an engine/oracle divergence on
    // negative inexact kappa (AnnotationSpec pins the trunc branch).
    cohen.unionByName(fleiss)
      .withColumn("kappa_ppm",
        expr("""CASE WHEN pe_ppm >= 1000000 THEN
               |  CASE WHEN po_ppm = 1000000 THEN 1000000L ELSE 0L END
               |ELSE (po_ppm - pe_ppm) * 1000000 DIV (1000000 - pe_ppm)
               |END""".stripMargin.replace("\n", " ")))
      .orderBy("pair")
  }

  /** Deterministic correlated pseudo-raters over a ground-truth bit:
    * rater r's label flips the ground label iff the 60-bit keyed hash
    * of `"{key}:{r}:{id}"` lands below `flipPct` of 100 — a replayable
    * noisy-rater model (no RNG; the oracle replays the same md5s).
    * Returns one (id, rater, label) row per (row, rater).
    */
  def syntheticRaters(df: DataFrame, idCol: String, groundCol: String,
                      raters: Seq[(Int, Int)], key: String): DataFrame = {
    val raterArr = array(raters.map { case (r, f) =>
      struct(lit(r).as("r"), lit(f).as("f")) }: _*)
    df.select(col(idCol).as("item"), col(groundCol).cast("long")
        .as("__g"))
      .select(col("item"), col("__g"), explode(raterArr).as("__rf"))
      .withColumn("__h",
        conv(substring(md5(concat(lit(s"$key:"),
          col("__rf.r").cast("string"), lit(":"),
          col("item").cast("string")).cast("binary")), 1, 15), 16, 10)
          .cast("long"))
      .select(col("item"), col("__rf.r").cast("long").as("rater"),
              when(col("__h") % 100 < col("__rf.f"), lit(1L) - col("__g"))
                .otherwise(col("__g")).as("label"))
  }
}
