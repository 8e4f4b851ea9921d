package graft.infer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pluggable scorer: tests and offline runs use deterministic stubs; a real
  * deployment would wrap an in-JVM model here. Constructed lazily ONCE PER
  * PARTITION on the executor — never serialized per row, never on the
  * driver's hot path.
  */
trait TextScorer extends Serializable {
  def score(text: String): (String, Double) // (predicted_label, confidence)
}

/** Deterministic stub scorer (no network, no model files — build
  * constraint): hash-based pseudo-classification, stable across runs and
  * partitionings.
  */
class HashScorer(labels: Seq[String]) extends TextScorer {
  def score(text: String): (String, Double) = {
    val h = math.abs(text.##.toLong)
    (labels((h % labels.size).toInt), 0.5 + (h % 50) / 100.0)
  }
}

/** U3 — distributed batch inference (SURVEY.md §2.8, reference
  * `transformers_test.py:154-213`).
  *
  * The reference synthesizes an `id % 20` key and runs a GROUPED_MAP pandas
  * UDF — a full shuffle whose only purpose is parallelism, plus an
  * executor→Python-worker Arrow hop per group. Here the same semantics are
  * `mapPartitions` over the existing partitioning: zero shuffle, zero
  * process boundary, model initialized lazily once per partition.
  *
  * Emits (target, predicted_label, confidence) — including the `confidence`
  * field the reference's output schema forgot (its latent bug:
  * `transformers_test.py:159-162` vs `:235`). Per-row failures yield an
  * "ERROR" sentinel row (reference `:184-189`) instead of failing the task.
  */
object BatchInference {

  val outputSchema: StructType = StructType(Seq(
    StructField("target", IntegerType, nullable = true),
    StructField("predicted_label", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false)))

  def scoreAll(df: DataFrame, textCol: String, targetCol: String,
               mkScorer: () => TextScorer): DataFrame = {
    val in = df.select(
      col(textCol).cast("string").as("text"),
      col(targetCol).cast("int").as("target"))
    val enc = Encoders.row(outputSchema)
    in.mapPartitions { rows =>
      lazy val scorer = mkScorer() // one init per partition, on first row
      rows.map { r =>
        val target = if (r.isNullAt(1)) null else Int.box(r.getInt(1))
        try {
          val (label, conf) = scorer.score(r.getString(0))
          Row(target, label, conf)
        } catch {
          case _: Exception => Row(target, "ERROR", 0.0d)
        }
      }
    }(enc)
  }

  /** Reference-parity variant: explicit n-way repartition when the caller
    * wants to widen parallelism for a compute-bound model (replaces the
    * reference's synthetic `monotonically_increasing_id % 20` group key +
    * grouped-map shuffle with a plain round-robin repartition).
    */
  def scoreRepartitioned(df: DataFrame, textCol: String, targetCol: String,
                         parallelism: Int,
                         mkScorer: () => TextScorer): DataFrame =
    scoreAll(df.repartition(parallelism), textCol, targetCol, mkScorer)

  /** A5 — the reference's literal grouped-map shape
    * (`df.groupby("group").apply(pandas_udf)`, `transformers_test.py:
    * 207-213`): synthesize `monotonically_increasing_id() % n` groups (F7 +
    * F8), shuffle on the group key, score each group as a batch via
    * `groupByKey.flatMapGroups`. Kept for keyed-batch semantics parity;
    * prefer [[scoreAll]] (no shuffle) when grouping exists only for
    * parallelism.
    */
  def scoreGrouped(df: DataFrame, textCol: String, targetCol: String,
                   nGroups: Int, mkScorer: () => TextScorer): DataFrame = {
    val keyed = df.select(
      col(textCol).cast("string").as("text"),
      col(targetCol).cast("int").as("target"),
      (monotonically_increasing_id() % nGroups).cast("int").as("group"))
    val enc = Encoders.row(outputSchema)
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val intEnc = Encoders.scalaInt
    keyed
      .groupByKey(r => r.getInt(2))(intEnc)
      .flatMapGroups { (_: Int, rows: Iterator[Row]) =>
        lazy val scorer = mkScorer() // one init per group batch
        rows.map { r =>
          val target = if (r.isNullAt(1)) null else Int.box(r.getInt(1))
          try {
            val (label, conf) = scorer.score(r.getString(0))
            Row(target, label, conf)
          } catch { case _: Exception => Row(target, "ERROR", 0.0d) }
        }
      }(enc)
  }
}
