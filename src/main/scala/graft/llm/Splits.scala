package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/validation/test splitting.
  *
  * A naive per-document hash split leaks: near-duplicate documents land
  * on both sides of the train/test boundary, so the model is evaluated
  * on (near-)training data. The reference pipeline's GLUE benchmarks
  * (`sst2_test2.py:40-44` uses pre-made train/dev TSVs) sidestep this
  * because GLUE ships deduplicated splits — a pipeline that BUILDS
  * training corpora has to enforce it itself. The fix is standard
  * (e.g. the C4/Gopher methodology): split by near-dup CLUSTER, not by
  * document, so a whole clique of near-duplicates lands in exactly one
  * split.
  *
  * Scale shape: the split assignment is a pure projection over the
  * (doc_id, cluster_id) mapping the dedup pass already produced — no
  * additional shuffle, no per-split pass. The hash is the portable
  * md5-prefix family ([[graft.functions.PortableHash]]), so the
  * assignment is content-stable across engines, reruns, and cluster
  * sizes, and the DuckDB oracle replays it exactly.
  */
object Splits {

  private val Space60: Long = 1L << 60

  /** 60-bit md5-prefix of a string column as a non-negative long
    * (`('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB).
    */
  private def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Cumulative thresholds in the 60-bit hash space for the given
    * fractions — computed with BigDecimal so the literals are exact and
    * identical to the ones inlined into oracle SQL.
    */
  private[llm] def thresholds60(fractions: Seq[Double]): Seq[Long] = {
    require(fractions.nonEmpty && fractions.forall(_ > 0),
            "fractions must be positive")
    val total = fractions.sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1 ($total)")
    fractions.scanLeft(BigDecimal(0))(_ + BigDecimal(_)).tail
      .map(c => (c * BigDecimal(Space60)).setScale(0, BigDecimal.RoundingMode.FLOOR)
        .toLong)
  }

  /** Assign every document its cluster's split. `clusters` is the
    * (doc_id, cluster_id, …) output of any dedup variant
    * ([[Dedup.minhashPortable]], [[Dedup.exact]], …); `splits` is an
    * ordered (name, fraction) list summing to 1. The `seed` string salts
    * the hash so independent splits of the same corpus decorrelate.
    *
    * Output: (doc_id, cluster_id, split) — every member of a cluster
    * gets the SAME split, so near-duplicates can never straddle the
    * train/test boundary.
    */
  def clusterAwareSplit(clusters: DataFrame, splits: Seq[(String, Double)],
                        seed: String = "split"): DataFrame = {
    val ts = thresholds60(splits.map(_._2))
    val h = hash60(concat(lit(seed + ":"), col("cluster_id").cast("string")))
    // last branch is the unconditional remainder — floating thresholds
    // may land a hair under 2^60, and every hash value must get a split
    val assigned = splits.init.zip(ts.init).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, ((name, _), t)) =>
        when(h < lit(t), lit(name)).otherwise(acc)
      }
    clusters.select(col("doc_id"), col("cluster_id"), assigned.as("split"))
  }

  /** Clusters that straddle more than one split — MUST be empty for any
    * output of [[clusterAwareSplit]]; run it as the post-split audit.
    */
  def splitLeakage(assigned: DataFrame): DataFrame =
    assigned.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)

  /** Similarity PAIRS whose endpoints were assigned different splits —
    * the CROSS-FAMILY leak audit. [[splitLeakage]] only checks that the
    * clustering the split was keyed on doesn't straddle; a SECOND
    * similarity structure (e.g. SemDeDup cosine pairs over a
    * MinHash-keyed split) can still link a train doc to a test doc.
    * Feed that structure's pairs here: empty output iff the split
    * respects the pair graph; otherwise split on the union closure of
    * both edge sets (q150). `assigned` is (doc_id, split, …); `pairs`
    * is (doc_a, doc_b, …).
    *
    * Scale shape: two id-keyed equi-joins of the pair list against the
    * (doc_id, split) projection — no text, no vectors, no closure.
    */
  def pairLeakage(assigned: DataFrame, pairs: DataFrame): DataFrame = {
    val s = assigned.select(col("doc_id"), col("split"))
    pairs.select(col("doc_a"), col("doc_b"))
      .join(s.select(col("doc_id").as("doc_a"),
                     col("split").as("split_a")), Seq("doc_a"))
      .join(s.select(col("doc_id").as("doc_b"),
                     col("split").as("split_b")), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select("doc_a", "doc_b", "split_a", "split_b")
  }

  /** The CASE expression of [[clusterAwareSplit]] as DuckDB SQL over a
    * `cluster_id` column — inlines the SAME thresholds, for oracles.
    */
  private[graft] def splitCaseSql(splits: Seq[(String, Double)],
                                  seed: String = "split",
                                  clusterCol: String = "cluster_id"): String = {
    val ts = thresholds60(splits.map(_._2))
    val h = s"('0x' || substr(md5('$seed:' || CAST($clusterCol AS VARCHAR)), 1, 15))::BIGINT"
    val branches = splits.init.zip(ts.init)
      .map { case ((name, _), t) => s"WHEN $h < $t THEN '$name'" }
      .mkString(" ")
    s"CASE $branches ELSE '${splits.last._1}' END"
  }
}
