package graft.ml

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-level cleaning / extraction expressions the reference implements as
  * Python UDFs, re-expressed as pure Catalyst expressions so they stay in
  * whole-stage codegen (SURVEY.md §2.8 U1/U2/U4).
  *
  * At 100 TB this is the single biggest structural win over the reference:
  * no per-row executor↔Python-worker hop, no codegen break.
  */
object Cleaning {

  /** U1 — P(class=1) out of an ml.linalg Vector `probability` column
    * (reference UDF `extract_probability`, `sst2_test2.py:68-75`).
    * `vector_to_array` + ElementAt — handles both sparse (CountVectorizer
    * path) and dense (Word2Vec path) vectors.
    */
  def positiveProbability(probabilityCol: Column): Column =
    vector_to_array(probabilityCol).getItem(1)

  /** U2 — QNLI label codec (reference UDF `clean_label`,
    * `qnli_test.py:82-96`): "not_entailment"→1, "entailment"→0, else try
    * int-cast else null. `try_cast` (not `cast`) gives null on non-numeric
    * strings under ANSI mode — exactly the reference's `except: return
    * None` branch.
    */
  def cleanLabel(c: Column): Column =
    when(c === "not_entailment", lit(1))
      .when(c === "entailment", lit(0))
      .otherwise(c.try_cast(org.apache.spark.sql.types.IntegerType))

  /** F5 — programmatic CASE-WHEN chain from a label map, unknown → default
    * (reference `transformers_test.py:220-232`). Deterministic order via
    * sort so plans are stable run-to-run.
    */
  def labelMapToExpr(c: Column, m: Map[String, Int], default: Int = -1): Column =
    m.toSeq.sortBy(_._2).foldLeft(lit(default)) { case (acc, (s, i)) =>
      when(c === s, lit(i)).otherwise(acc)
    }

  /** U4 — `["unknown"]` for null/empty token arrays (reference
    * `replace_empty`, `qnli_test.py:39-49`); also used inside
    * [[EmptyListHandler]].
    */
  def replaceEmptyTokens(c: Column, fill: String = "unknown"): Column =
    when(c.isNull || size(c) === 0, array(lit(fill))).otherwise(c)

  /** F1 — sentence-pair composition with a separator token
    * (`qqp_test.py:44`). */
  def pairConcat(a: Column, b: Column, sep: String = " [SEP] "): Column =
    concat(a, lit(sep), b)

  /** F2 — null-safe trimmed composition (`qnli_test.py:108-109`). */
  def composeText(a: Column, b: Column): Column =
    concat_ws(" ", trim(a), trim(b))
}
