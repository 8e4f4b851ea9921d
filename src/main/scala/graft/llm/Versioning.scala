package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset release management: diff two corpus snapshots.
  *
  * Every corpus release pipeline needs the audit answer to "what changed
  * since the last release?" — which documents were added, removed, or
  * rewritten — both as the per-document lineage table the release notes
  * link and as the one-line summary the publication gate checks.
  *
  * Scale shape: each side reduces to (id, 128-bit content fingerprint)
  * scan-side — document text NEVER shuffles, only 8+16 bytes per row.
  * The diff is then a single full-outer hash join on id; when both
  * snapshots are stored bucketed by id (the [[IndexStore]] layout, or
  * any bucketed release table) the join plans with zero Exchange. At
  * 100 TB the diff therefore costs two fingerprint scans plus a narrow
  * join, not a byte-level compare.
  */
object Versioning {

  /** Per-document diff: `change` ∈ added | removed | changed | unchanged.
    * `removed` rows carry the OLD snapshot's fingerprint, everything else
    * the new one's, so a follow-up join can fetch the surviving text from
    * the right side.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("doc_id"),
                           md5(col(textCol).cast("binary")).as("__old_fp"))
    val n = newSnap.select(col(idCol).as("doc_id"),
                           md5(col(textCol).cast("binary")).as("__new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        when(col("__old_fp").isNull, lit("added"))
          .when(col("__new_fp").isNull, lit("removed"))
          .when(col("__old_fp") =!= col("__new_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("change"),
        coalesce(col("__new_fp"), col("__old_fp")).as("content_fp"))
  }

  /** Release-gate summary of [[snapshotDiff]]: one row per change kind
    * (a partial-agg shuffle to ≤4 groups).
    */
  def snapshotDiffSummary(oldSnap: DataFrame, newSnap: DataFrame,
                          idCol: String, textCol: String): DataFrame =
    snapshotDiff(oldSnap, newSnap, idCol, textCol)
      .groupBy("change")
      .agg(count(lit(1)).as("n_docs"))
}
