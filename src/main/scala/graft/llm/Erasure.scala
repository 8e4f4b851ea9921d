package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Estate-wide right-to-be-forgotten: ONE sweep that erases a subject's
  * rows from EVERY persisted index family and publishes each result as
  * the family's next version through [[IndexStore]]'s crash-safe flip —
  * the generalization of the per-family erase ops
  * ([[Dedup.eraseFromMinhashIndex]], [[Dedup.eraseFromFingerprintIndex]],
  * [[Relevance.deleteFromBm25Index]],
  * [[Relevance.eraseFromPositionalIndex]],
  * [[Similarity.eraseFromLshIndex]] / IVF / PQ, and the KMV sketch op
  * below) into the operation a privacy office actually runs: "user X is
  * gone EVERYWHERE, attest it". The attestation itself is q283
  * (`LlmQueries.q283EstateErasure`): per-artifact row counts, survivor
  * counts against an independently recomputed erase set, measured
  * erased-vs-net-rebuilt gaps, and content digests, plus the one ESTATE
  * summary row.
  *
  * Erasure discipline shared by every family: the erase is an id-keyed
  * anti-join (erase-proportional — corpus text/vectors are never
  * re-read), the result is a ROLL to the next index version (in-flight
  * readers keep the pre-erasure version until the commit marker lands),
  * and retention GCs the old version — the retention horizon IS the
  * erasure deadline, so size `spark.graft.index.keepVersions`
  * accordingly. Fitted model parameters (IVF centroids, PQ codebooks,
  * the LSH hyperplanes implicit in the seed, BM25's k1/b) are aggregates
  * over the training corpus and are RETAINED, the same privacy class as
  * a trained model; per-subject rows always go.
  */
object Erasure {

  /** The persisted names of one estate's eight index families. */
  final case class EstateNames(fingerprint: String, minhash: String,
                               bm25: String, positional: String,
                               lsh: String, ivf: String, pq: String,
                               kmv: String)

  /** The KMV family's 60-bit keyed user hash (q219's `kmv11` scheme) —
    * public so an erasure job can hash its erase set with EXACTLY the
    * hash the persisted sketches store.
    */
  def kmvUserHash(userId: Column): Column =
    conv(substring(md5(concat(lit("kmv11:"), userId.cast("string"))
                         .cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Per-day bottom-k KMV distinct sketch over an events table:
    * (day, h) rows, k smallest keyed user hashes per day (q219's
    * persisted artifact, as a reusable builder). One (day, hash)
    * distinct exchange + a per-day WindowGroupLimit top-k — the same
    * shuffle an exact daily-DAU job pays, after which every distinct
    * question reads k rows per day.
    */
  def kmvDailySketch(events: DataFrame, k: Int = 64): DataFrame = {
    val hashed = events.select(
        datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long")
          .as("day"),
        kmvUserHash(col("user_id")).as("h"))
      .distinct()
    hashed
      .withColumn("r", row_number().over(
        Window.partitionBy("day").orderBy("h")))
      .filter(col("r") <= k)
      .select("day", "h")
  }

  /** Right-to-be-forgotten for the KMV sketch estate: drop every row
    * whose hash belongs to an erased user (`eraseHashes` must carry an
    * `h` column produced by [[kmvUserHash]] — the hash is derived from
    * the subject's id, so it IS subject data and must go).
    *
    * Validity after erasure: every surviving hash was below the day's
    * original k-th minimum, and every NET user's hash below that
    * threshold is in the sketch — so the surviving rows are EXACTLY the
    * smallest (k − r_day) net-user hashes. The sketch therefore remains
    * a valid bottom-k' sketch of the net population with reduced
    * effective k (the estimator already handles n_sketch < k):
    * PRECISION pays for erasure, never privacy and never bias
    * direction. A net-corpus rebuild restores full k by admitting the
    * next-smallest net hashes — the q283 attestation measures that gap
    * (`n_rebuild_gap` = replacements a rebuild would re-admit) instead
    * of hiding it; schedule a rebuild after a bulk erasure.
    */
  def eraseFromKmvSketch(sketch: DataFrame,
                         eraseHashes: DataFrame): DataFrame =
    sketch.join(eraseHashes.select("h"), Seq("h"), "left_anti")

  /** The one-call estate sweep: load the CURRENT version of each
    * family, apply its erase op, and publish the result as the NEXT
    * version of the SAME name. Erase-set conventions: `eraseDocIds` and
    * `eraseVecIds` expose a `corpus_id` column (pre-gate/materialize
    * them — they are broadcast into up to six anti-joins);
    * `eraseUserHashes` exposes `h` ([[kmvUserHash]] values).
    *
    * Scale shape: eight erase-proportional anti-joins over index rows —
    * no corpus scan anywhere; each publish rewrites only that family's
    * next version. At 100 TB the sweep's cost is the index estate's
    * size, not the corpus's, and the families are independent (a
    * scheduler can run them concurrently; a crash mid-sweep leaves
    * already-flipped families erased and the rest on their old version
    * — re-running the sweep is idempotent because every erase op is).
    */
  def eraseEstate(spark: SparkSession, names: EstateNames,
                  eraseDocIds: DataFrame, eraseVecIds: DataFrame,
                  eraseUserHashes: DataFrame): Unit = {
    IndexStore.saveFingerprintIndex(
      Dedup.eraseFromFingerprintIndex(
        IndexStore.loadFingerprintIndex(spark, names.fingerprint),
        eraseDocIds),
      names.fingerprint)
    IndexStore.saveMinhashIndex(
      Dedup.eraseFromMinhashIndex(
        IndexStore.loadMinhashIndex(spark, names.minhash), eraseDocIds),
      names.minhash)
    IndexStore.saveBm25Index(
      Relevance.deleteFromBm25Index(
        IndexStore.loadBm25Index(spark, names.bm25), eraseDocIds),
      names.bm25)
    IndexStore.savePositionalIndex(
      Relevance.eraseFromPositionalIndex(
        IndexStore.loadPositionalIndex(spark, names.positional),
        eraseDocIds),
      names.positional)
    IndexStore.saveLshIndex(
      Similarity.eraseFromLshIndex(
        IndexStore.loadLshIndex(spark, names.lsh), eraseVecIds),
      names.lsh)
    IndexStore.saveIvfIndex(
      Similarity.eraseFromIvfIndex(
        IndexStore.loadIvfIndex(spark, names.ivf), eraseVecIds),
      names.ivf)
    IndexStore.savePqIndex(
      Similarity.eraseFromPqIndex(
        IndexStore.loadPqIndex(spark, names.pq), eraseVecIds),
      names.pq)
    IndexStore.savePlainArtifact(
      eraseFromKmvSketch(
        IndexStore.loadPlainArtifact(spark, names.kmv), eraseUserHashes),
      names.kmv)
  }
}
