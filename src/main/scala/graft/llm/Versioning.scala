package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Apply a CHANGELOG to a corpus snapshot — the MERGE INTO of a
    * versioned release pipeline, in plain Spark: `changes` carries
    * (id, version, op ∈ upsert|delete, payload); per id the
    * HIGHEST-version change wins (ties impossible when versions are
    * ingest sequence numbers; broken by op then payload fingerprint for
    * full determinism anyway), a winning `delete` removes the doc, a
    * winning `upsert` replaces-or-inserts it, untouched docs pass
    * through.
    *
    * Scale shape: latest-change-per-id is ONE aggregation (max_by via
    * max(struct) — no window sort), then one full-outer join with the
    * base on id. Store base snapshots bucketed by id ([[IndexStore]]
    * layout) and the join plans Exchange-free on the base side; the
    * changelog is delta-sized. Text never shuffles twice — the base
    * side moves only through the join it already needed.
    */
  /** Latest-wins resolution of a changelog: one (doc_id, op, text) row
    * per id — highest version wins, ties broken by (op, content-md5,
    * text) lexicographically, all inside one max(struct) aggregation
    * (changelog-sized, no window sort). THE single definition of the
    * tie-break: [[applyChangelog]] (corpus merge) and the index
    * maintenance jobs (q192's roll delta/deletes) both consume it, so
    * they cannot drift from each other.
    */
  def latestChanges(changes: DataFrame, idCol: String,
                    versionCol: String, opCol: String,
                    textCol: String): DataFrame =
    changes
      .select(col(idCol).as("doc_id"),
              struct(col(versionCol).as("v"), col(opCol).as("op"),
                     md5(col(textCol).cast("binary")).as("fp"),
                     col(textCol).as("text")).as("ch"))
      .groupBy("doc_id")
      .agg(max(col("ch")).as("ch"))
      .select(col("doc_id"), col("ch.op").as("op"),
              col("ch.text").as("text"))

  def applyChangelog(base: DataFrame, changes: DataFrame,
                     idCol: String, versionCol: String, opCol: String,
                     textCol: String): DataFrame = {
    val latest = latestChanges(changes, idCol, versionCol, opCol, textCol)
      .select(col("doc_id"), col("op").as("__op"),
              col("text").as("__text"))
    base.select(col(idCol).as("doc_id"), col(textCol).as("__base_text"))
      .join(latest, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("__op"), lit("keep")) =!= "delete")
      .select(col("doc_id"),
              coalesce(col("__text"), col("__base_text")).as(textCol))
  }

  /** Open-interval sentinel for [[scd2History]]: a `valid_to` of this
    * value means "still live" (no later change closed the interval).
    */
  val Scd2Open: Long = 9999L

  /** SCD-2 history build — the warehouse twin of [[applyChangelog]]:
    * instead of collapsing the changelog to the LATEST state, keep the
    * FULL version history as validity intervals, the layout every
    * "what did this record look like when we trained model v3?"
    * question needs. The base snapshot enters as version-1 upserts;
    * each upsert opens an interval `[version, next-change-version)`
    * (the closing change may be an upsert or a delete — either ends
    * the predecessor); deletes close their predecessor and open
    * nothing; an interval with no successor is open ([[Scd2Open]],
    * `is_current = 1`). Rows sharing (id, version) resolve by source
    * precedence (a changelog row beats the injected base row — the
    * changelog is authoritative), then the SAME `(op, content-md5,
    * text)` lexicographic max as [[latestChanges]] — so for any
    * changelog with versions ≥ 1 (the base snapshot IS version 1;
    * earlier versions are malformed input) the `is_current = 1` slice
    * reconciles EXACTLY with [[applyChangelog]]'s latest-state view,
    * which the spec pins including the equal-version collision cases.
    *
    * Scale shape: one union (base + changelog), one (id, version)
    * aggregation, then one window partitioned BY ID ordered over that
    * id's few versions — a single shuffle on the id key, per-partition
    * sort bounded by versions-per-id (never corpus-scale). The content
    * column rides the shuffle once, exactly as the MERGE it replaces.
    *
    * Returns `(doc_id, valid_from, valid_to, is_current, content_h)`
    * with a 60-bit md5-prefix content hash, ordered by (id, from).
    */
  def scd2History(base: DataFrame, changes: DataFrame, idCol: String,
                  versionCol: String, opCol: String,
                  textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = base.select(col(idCol).as("doc_id"),
                          lit(1L).as("version"),
                          lit(0L).as("src"),
                          lit("upsert").as("op"),
                          col(textCol).as("text"))
      .unionByName(changes.select(col(idCol).as("doc_id"),
                                  col(versionCol).cast("long")
                                    .as("version"),
                                  lit(1L).as("src"),
                                  col(opCol).as("op"),
                                  col(textCol).as("text")))
    // one shuffle serves both the (id, version) resolution and the
    // id-partitioned window: hash-distributing by id alone satisfies
    // the agg's ClusteredDistribution(id, version) (same-key rows stay
    // co-located), so Catalyst plans NO second exchange before lead()
    val resolved = all.repartition(col("doc_id"))
      .select(col("doc_id"), col("version"),
              struct(col("src"), col("op"),
                     md5(col("text").cast("binary")).as("fp"),
                     col("text")).as("ch"))
      .groupBy("doc_id", "version").agg(max(col("ch")).as("ch"))
      .select(col("doc_id"), col("version"), col("ch.op").as("op"),
              col("ch.text").as("text"))
    val w = Window.partitionBy("doc_id").orderBy("version")
    resolved
      .withColumn("valid_to",
                  coalesce(lead(col("version"), 1).over(w),
                           lit(Scd2Open)))
      .filter(col("op") === "upsert")
      .select(col("doc_id"), col("version").as("valid_from"),
              col("valid_to"),
              (col("valid_to") === Scd2Open).cast("long")
                .as("is_current"),
              conv(substring(md5(col("text").cast("binary")), 1, 15),
                   16, 10).cast("long").as("content_h"))
      .orderBy("doc_id", "valid_from")
  }

  /** Incremental SCD-2 roll — the daily-maintenance twin of
    * [[scd2History]]: apply one day's changelog delta to an EXISTING
    * history table without rebuilding it. Each affected id's open
    * interval closes at that id's first delta version; the delta's own
    * upserts chain into new intervals exactly as a rebuild would cut
    * them; untouched ids pass through byte-identical. PRECONDITION
    * (the daily-delta contract): every delta version is strictly newer
    * than any version already in `hist` for that id — then
    * `scd2Roll(scd2History(base, day1), day2) ≡
    * scd2History(base, day1 ∪ day2)` EXACTLY (per-(id, version)
    * resolution never crosses the day boundary), which the spec and
    * the q244 oracle pin byte-for-byte.
    *
    * Scale shape: all real work is DELTA-sized — the delta shuffles
    * once by id for its resolution + interval window, and the history
    * table is touched only through a BROADCAST join against the
    * (delta-sized) first-version-per-id set: the 100 TB history never
    * shuffles, exactly like the index rolls (q144/q147/...).
    */
  def scd2Roll(hist: DataFrame, changes: DataFrame, idCol: String,
               versionCol: String, opCol: String,
               textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val resolved = changes
      .select(col(idCol).as("doc_id"),
              col(versionCol).cast("long").as("version"),
              struct(lit(1L).as("src"), col(opCol).as("op"),
                     md5(col(textCol).cast("binary")).as("fp"),
                     col(textCol).as("text")).as("ch"))
      .repartition(col("doc_id"))
      .groupBy("doc_id", "version").agg(max(col("ch")).as("ch"))
      .select(col("doc_id"), col("version"), col("ch.op").as("op"),
              col("ch.text").as("text"))
    val w = Window.partitionBy("doc_id").orderBy("version")
    val newIntervals = resolved
      .withColumn("valid_to",
                  coalesce(lead(col("version"), 1).over(w),
                           lit(Scd2Open)))
      .filter(col("op") === "upsert")
      .select(col("doc_id"), col("version").as("valid_from"),
              col("valid_to"),
              (col("valid_to") === Scd2Open).cast("long")
                .as("is_current"),
              conv(substring(md5(col("text").cast("binary")), 1, 15),
                   16, 10).cast("long").as("content_h"))
    val firstNew = resolved.groupBy("doc_id")
      .agg(min("version").as("__first_v"))
    val carried = hist
      .join(broadcast(firstNew), Seq("doc_id"), "left")
      .withColumn("valid_to",
        when(col("is_current") === 1L && col("__first_v").isNotNull,
             col("__first_v")).otherwise(col("valid_to")))
      .withColumn("is_current",
        when(col("__first_v").isNotNull, lit(0L))
          .otherwise(col("is_current")))
      .select("doc_id", "valid_from", "valid_to", "is_current",
              "content_h")
    carried.unionByName(newIntervals)
      .orderBy("doc_id", "valid_from")
  }

  /** Merkle-style corpus content digest — the verifiable release
    * attestation: two parties holding "the same" release can compare one
    * root hash instead of 100 TB of bytes, and a mismatch localizes to
    * the differing bucket without re-hashing the rest.
    *
    * Layout: leaf = md5(id:text) per doc; leaves route to `buckets`
    * content-hash buckets; each bucket digests its SORTED leaf set;
    * the root digests the bucket digests in bucket order. Everything is
    * order-canonical, so the digest is invariant to partitioning,
    * engine, and row order — and fully SQL-replayable.
    *
    * Scale: per-bucket state is that bucket's leaf hashes (32 bytes ×
    * docs ⁄ buckets) — size `buckets` so that fits an executor (65k
    * buckets at 1B docs ≈ 0.5 MB each; add an intermediate level, same
    * construction, if ever needed). Output: one row per bucket
    * (level 0) + the root (level 1).
    */
  /** The content-keyed bucket of a document — ONE definition shared by
    * the Merkle digest, the shard diff, and selective-recompute
    * consumers, so "which bucket does this doc live in" can never
    * drift between the digest and its readers. Row-local md5
    * arithmetic, replayable in SQL.
    */
  def contentBucket(id: Column, text: Column, buckets: Int): Column = {
    val leaf = md5(concat(id.cast("string"), lit(":"), text)
                     .cast("binary"))
    pmod(conv(substring(md5(leaf.cast("binary")), 1, 15), 16, 10)
           .cast("long"),
         lit(buckets.toLong))
  }

  /** Shard-level release diff — the rsync story at 100 TB: compare two
    * snapshots' Merkle BUCKET digests ([[corpusDigest]]'s level-0
    * arithmetic, same content-keyed bucket routing) and report per
    * bucket whether it changed, so an incremental distribution re-ships
    * only the changed shards instead of the whole release. Output:
    * (bucket, n_old, n_new, old_digest, new_digest, status ∈
    * added|removed|changed|unchanged). Cost: one digest aggregation per
    * side (text never shuffles — only 32-byte leaves) + a
    * #buckets-row full-outer join.
    */
  def shardDiff(oldSnap: DataFrame, newSnap: DataFrame,
                idCol: String, textCol: String,
                buckets: Int = 64): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def l1(df: DataFrame) = {
      val leaf = md5(concat(col(idCol).cast("string"), lit(":"),
                            col(textCol)).cast("binary"))
      df.select(leaf.as("leaf"),
                contentBucket(col(idCol), col(textCol), buckets)
                  .as("bucket"))
        .groupBy("bucket")
        .agg(md5(array_join(sort_array(collect_list(col("leaf"))), "")
                   .cast("binary")).as("digest"),
             count(lit(1)).as("n"))
    }
    l1(oldSnap)
      .select(col("bucket"), col("digest").as("old_digest"),
              col("n").as("n_old"))
      .join(l1(newSnap)
              .select(col("bucket"), col("digest").as("new_digest"),
                      col("n").as("n_new")),
            Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        col("old_digest"), col("new_digest"),
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") === col("new_digest"),
                lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Content digest of ANY frame — [[corpusDigest]] generalized to a
    * caller-supplied canonical leaf string: one (n_rows, digest) row,
    * where digest is the md5 of the bucket-ordered level-0 Merkle
    * digests (64 buckets by default). Same scale shape as corpusDigest:
    * only 32-byte leaf md5s shuffle, the root agg sees ≤ `buckets`
    * rows. Used by the index-release manifest (q188) to pin the exact
    * content of every persisted index a serving handoff ships.
    */
  def frameDigest(df: DataFrame, leaf: Column,
                  buckets: Int = 64): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // A NULL leaf must stay digest-VISIBLE: collect_list silently drops
    // nulls, so without the sentinel a row whose leaf expression nulls
    // out (e.g. concat over a null column) would vanish from the digest
    // while still counting toward n_rows — exactly the corruption the
    // attestation exists to catch. The sentinel is not valid hex, so it
    // cannot collide with a real md5 leaf.
    val leafMd5 = coalesce(md5(leaf.cast("binary")), lit("<null-leaf>"))
    val hash60 =
      conv(substring(md5(leafMd5.cast("binary")), 1, 15), 16, 10)
        .cast("long")
    df.select(leafMd5.as("__leaf"),
              pmod(hash60, lit(buckets.toLong)).as("__bucket"))
      .groupBy("__bucket")
      .agg(count(lit(1)).as("__n"),
           md5(array_join(sort_array(collect_list(col("__leaf"))), "")
             .cast("binary")).as("__digest"))
      .agg(coalesce(sum("__n"), lit(0L)).as("n_rows"),
           md5(array_join(
             transform(sort_array(collect_list(struct(col("__bucket"),
                                                      col("__digest")))),
                       s => s.getField("__digest")), "")
             .cast("binary")).as("digest"))
  }

  /** [[frameDigest]] FUSED with a subject-survivor count (round-17
    * optimization, guide §2.6/§2.4): the estate attestations used to pay
    * one extra sequential count job per surface for
    * `join(keys, left_semi).count()` on top of the digest aggregation —
    * per-job latency, not data, was the cost. Joining the (distinct,
    * broadcastable) subject keys into the SAME two-level aggregation
    * yields one (n_rows, digest, n_survivors) row per surface with the
    * digest bit-identical to [[frameDigest]] (the left join against
    * de-duplicated keys preserves row multiplicity, so the leaf set is
    * unchanged — VersioningSpec pins both properties).
    */
  def frameDigestSurvivors(df: DataFrame, leaf: Column,
                           keys: DataFrame, kc: String,
                           buckets: Int = 64): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val leafMd5 = coalesce(md5(leaf.cast("binary")), lit("<null-leaf>"))
    val hash60 =
      conv(substring(md5(leafMd5.cast("binary")), 1, 15), 16, 10)
        .cast("long")
    // distinct() so a duplicate subject key can never re-multiply df
    // rows (which would corrupt BOTH n_rows and the digest); the key
    // sets here are KB-scale erase lists.
    df.join(broadcast(keys.select(col(kc)).distinct())
              .withColumn("__subj", lit(1)),
            Seq(kc), "left")
      .select(leafMd5.as("__leaf"),
              pmod(hash60, lit(buckets.toLong)).as("__bucket"),
              col("__subj"))
      .groupBy("__bucket")
      .agg(count(lit(1)).as("__n"),
           md5(array_join(sort_array(collect_list(col("__leaf"))), "")
             .cast("binary")).as("__digest"),
           count(col("__subj")).as("__s"))
      .agg(coalesce(sum("__n"), lit(0L)).as("n_rows"),
           md5(array_join(
             transform(sort_array(collect_list(struct(col("__bucket"),
                                                      col("__digest")))),
                       s => s.getField("__digest")), "")
             .cast("binary")).as("digest"),
           coalesce(sum("__s"), lit(0L)).as("n_survivors"))
  }

  def corpusDigest(docs: DataFrame, idCol: String, textCol: String,
                   buckets: Int = 64): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val leaf = md5(concat(col(idCol).cast("string"), lit(":"),
                          col(textCol)).cast("binary"))
    val hash60 =
      conv(substring(md5(leaf.cast("binary")), 1, 15), 16, 10).cast("long")
    val l1 = docs
      .select(leaf.as("leaf"), pmod(hash60, lit(buckets.toLong)).as("bucket"))
      .groupBy("bucket")
      .agg(md5(array_join(sort_array(collect_list(col("leaf"))), "")
        .cast("binary")).as("digest"))
    val root = l1
      .agg(md5(array_join(
        transform(sort_array(collect_list(struct(col("bucket"),
                                                 col("digest")))),
                  s => s.getField("digest")), "").cast("binary"))
        .as("digest"))
      .select(lit(1).as("level"), lit(0L).as("bucket"), col("digest"))
    l1.select(lit(0).as("level"), col("bucket"), col("digest"))
      .unionByName(root)
  }
}
