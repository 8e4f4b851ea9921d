package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance of documents against a fixed query-term set — the
  * retrieval-grade twin of the DSIR weights ([[NgramLm]]): score every
  * corpus document against a handful of domain terms and keep the top
  * slice, the "retrieve training data relevant to my domain" selection
  * tool.
  *
  * Scale shape: the term set is a literal handful, so the token explode
  * filters to it immediately (`isin` on the exploded token — pushed
  * ahead of the aggregate); per-(doc,term) tf is one narrow shuffle,
  * df/N/avgdl are O(terms)+O(1) aggregates that broadcast back. Nothing
  * corpus-scale shuffles except the tf agg on matching tokens only.
  */
object Relevance {

  /** Okapi BM25 with the standard k1/b defaults. Output: one row per doc
    * with ≥1 matching term — (doc_id, n_hits, bm25 rounded to 6) —
    * where idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the non-negative
    * variant) and tf saturates via k1 with length normalization b on
    * dl/avgdl (whitespace-token doc lengths).
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = docs.select(
      col(idCol).as("doc_id"),
      filter(split(lower(trim(col(textCol))), "\\W+"),
             t => length(t) > 0).as("toks"))
    val withDl = toks.select(col("doc_id"), col("toks"),
                             size(col("toks")).cast("long").as("dl"))
    // corpus stats: N and avgdl in one row (broadcast), df per term
    val stats = corpusStats(withDl)
    val tf = withDl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "dl", "token")
      .agg(count(lit(1)).cast("double").as("tf"))
    scoreFromTf(tf, stats, k1, b)
  }

  /** The Okapi scoring tail shared by the one-shot and indexed paths:
    * `tf` = (doc_id, dl, token, tf) already filtered to the query terms,
    * `stats` = one (n_docs, avgdl) row.
    */
  private def scoreFromTf(tf: DataFrame, stats: DataFrame,
                          k1: Double, b: Double): DataFrame = {
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) /
               (col("df") + 0.5)) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("term_score"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
           round(sum("term_score"), 6).as("bm25"))
  }

  /** PERSISTED retrieval state for ad-hoc queries — the full inverted
    * index: `postings` = one row per (token, doc) with its tf and the
    * doc length, `stats` = the one (n_docs, sum_dl, avgdl) row (sum_dl
    * is the sufficient statistic [[mergeBm25Index]] rolls). Persist via
    * [[IndexStore.saveBm25Index]] (postings bucketed + sorted by token:
    * a query-term filter prunes parquet row groups by the token min/max,
    * so scoring a term set reads the matching slivers of the index and
    * NEVER rescans corpus text — the production retrieval shape; one-shot
    * [[bm25Scores]] re-tokenizes the corpus per query batch).
    */
  final case class Bm25Index(postings: DataFrame, stats: DataFrame)

  /** Build the [[Bm25Index]] of a corpus — the offline indexing job, run
    * once per corpus release (one tokenize scan + one (token, doc) agg).
    */
  def bm25Index(docs: DataFrame, idCol: String,
                textCol: String): Bm25Index = {
    val withDl = docs.select(
      col(idCol).as("doc_id"),
      filter(split(lower(trim(col(textCol))), "\\W+"),
             t => length(t) > 0).as("toks"))
      .select(col("doc_id"), col("toks"),
              size(col("toks")).cast("long").as("dl"))
    val postings = withDl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .groupBy("token", "doc_id", "dl")
      .agg(count(lit(1)).cast("double").as("tf"))
    Bm25Index(postings, corpusStats(withDl))
  }

  /** The one-row (n_docs, sum_dl, avgdl) stats aggregate shared by the
    * one-shot scorer, the index build, and the index roll. `sum_dl` is
    * the SUFFICIENT statistic that makes the roll exact: avgdl is
    * always the exact long Σdl divided once by the exact count, so a
    * merged index's avgdl is bit-identical to a rebuilt one's (avg() on
    * doubles would be summation-order-dependent and unrecoverable from
    * a stored average).
    */
  private def corpusStats(withDl: DataFrame): DataFrame =
    withDl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") /
                             col("n_docs").cast("double"))

  /** ROLL a persisted [[Bm25Index]] forward with a delta batch — the
    * daily index-maintenance job the indexed-retrieval steady state
    * needs (the [[Dedup.mergeFingerprintIndex]] pattern, q144's
    * invariant applied to this index): tokenize ONLY the delta, upsert
    * its postings, and merge the stats as (n_docs, Σdl) sufficient
    * statistics. Docs re-ingested in the delta REPLACE their base
    * postings and stats contribution, so re-rolling the same delta is a
    * no-op and the result equals [[bm25Index]] rebuilt from scratch
    * over (base corpus ∖ delta ids) ∪ delta — RelevanceSpec pins both,
    * and q147's oracle replays the rebuild on real data.
    *
    * Scale shape: delta tokenization is O(delta) row-local work; the
    * delta id set broadcasts into an anti-join (replaced postings out)
    * and a semi-join + distinct-doc agg (their stats contribution out)
    * over the token-bucketed base postings — index-cost scans, never a
    * corpus re-scan; corpus text behind the base index is not touched.
    * Re-bucketing happens at save time exactly as for a fresh build.
    */
  def mergeBm25Index(base: Bm25Index, delta: DataFrame, idCol: String,
                     textCol: String): Bm25Index = {
    val d = bm25Index(delta, idCol, textCol)
    val deltaIds = delta.select(col(idCol).as("doc_id")).distinct()
    val postings = base.postings
      .join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
      .select("token", "doc_id", "dl", "tf")
      .unionByName(d.postings.select("token", "doc_id", "dl", "tf"))
    // stats contribution of the docs the delta replaces (empty on a
    // pure append): one (doc_id, dl) row per overlapping doc
    val removed = base.postings
      .join(broadcast(deltaIds), Seq("doc_id"), "left_semi")
      .select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("r_n"),
           coalesce(sum("dl"), lit(0L)).as("r_sum"))
    val stats = base.stats
      .select(col("n_docs").as("b_n"), col("sum_dl").as("b_sum"))
      .crossJoin(d.stats.select(col("n_docs").as("d_n"),
                                col("sum_dl").as("d_sum")))
      .crossJoin(removed)
      .select((col("b_n") - col("r_n") + col("d_n")).as("n_docs"),
              (col("b_sum") - col("r_sum") + col("d_sum")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") /
                             col("n_docs").cast("double"))
    Bm25Index(postings, stats)
  }

  /** DELETE documents from a persisted [[Bm25Index]] — the missing CRUD
    * half of [[mergeBm25Index]] (which replaces/appends but cannot
    * express a pure removal): postings anti-join the delete-id set out,
    * and the stats give back the removed docs' exact (count, Σdl)
    * sufficient-statistic contribution, so the result equals
    * [[bm25Index]] rebuilt over (corpus ∖ ids) — RelevanceSpec pins it,
    * q193's oracle replays the rebuild on real data. Deleting an id not
    * in the index is a no-op. Scale shape: one broadcast anti-join +
    * one semi-join aggregate over index rows; corpus text is never
    * touched.
    */
  def deleteFromBm25Index(base: Bm25Index, ids: DataFrame): Bm25Index = {
    val deleteIds = ids.select(col(ids.columns.head).as("doc_id"))
      .distinct()
    val removed = base.postings
      .join(broadcast(deleteIds), Seq("doc_id"), "left_semi")
      .select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("r_n"),
           coalesce(sum("dl"), lit(0L)).as("r_sum"))
    val postings = base.postings
      .join(broadcast(deleteIds), Seq("doc_id"), "left_anti")
    val stats = base.stats
      .select(col("n_docs").as("b_n"), col("sum_dl").as("b_sum"))
      .crossJoin(removed)
      .select((col("b_n") - col("r_n")).as("n_docs"),
              (col("b_sum") - col("r_sum")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") /
                             col("n_docs").cast("double"))
    Bm25Index(postings, stats)
  }

  /** Score ad-hoc `terms` against a LOADED [[Bm25Index]] — byte-identical
    * output to [[bm25Scores]] on the same corpus, without touching corpus
    * text (RelevanceSpec pins the equality).
    */
  def bm25ScoresWithIndex(index: Bm25Index, terms: Seq[String],
                          k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    scoreFromTf(index.postings.filter(col("token").isin(terms: _*)),
                index.stats, k1, b)
  }

  /** Positional inverted index: one row per (token, doc_id) with the
    * SORTED 0-based occurrence positions — the Lucene-style structure
    * exact-phrase search needs, which the tf-only [[Bm25Index]] cannot
    * answer. Same build cost family as [[bm25Index]]: one tokenize scan
    * + one (token, doc) agg; positions arrays are bounded by document
    * length. Persist via [[IndexStore.savePositionalIndex]] (bucketed +
    * sorted by token, so a phrase's term filters prune parquet row
    * groups and read only the matching-token slivers).
    */
  def positionalIndex(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      posexplode(filter(split(lower(trim(col(textCol))), "\\W+"),
                        t => length(t) > 0)))
      .withColumnRenamed("col", "token")
      .groupBy("token", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** ROLL a persisted positional index forward with a delta batch — the
    * [[mergeBm25Index]] pattern for the phrase-search structure: tokenize
    * ONLY the delta, and upsert its (token, doc_id, positions) rows
    * (docs re-ingested in the delta REPLACE their base rows via a
    * broadcast anti-join on the delta id set, so re-rolling the same
    * delta is a no-op and merged ≡ rebuilt — RelevanceSpec pins both,
    * q182's oracle replays the rebuild). Positions are per-document, so
    * unlike BM25 there is no cross-document statistic to merge — the
    * upsert IS the whole roll. Scale shape: O(delta) row-local
    * tokenization + index-rows anti-join; base corpus text is never
    * re-read.
    */
  def mergePositionalIndex(base: DataFrame, delta: DataFrame,
                           idCol: String, textCol: String): DataFrame = {
    val deltaIds = delta.select(col(idCol).as("doc_id")).distinct()
    base.join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
      .select("token", "doc_id", "positions")
      .unionByName(positionalIndex(delta, idCol, textCol)
                     .select("token", "doc_id", "positions"))
  }

  /** Right-to-be-forgotten for the persisted positional index: drop
    * every erased doc's (token, doc_id, positions) rows — one id-keyed
    * anti-join, erase-proportional, corpus text never touched. Unlike
    * the fingerprint/minhash families there is no cross-document state
    * (no min-owner, no guard, no stats row), so erased ≡ net-corpus
    * rebuild EXACTLY — the q283 estate attestation measures the gap
    * at 0. Publish the result as the NEXT index version through
    * [[IndexStore.savePositionalIndex]] (erasure is a roll, not an
    * in-place mutation).
    */
  def eraseFromPositionalIndex(index: DataFrame,
                               eraseIds: DataFrame): DataFrame = {
    val ids = eraseIds.select(col(eraseIds.columns.head).as("doc_id"))
    index.join(ids, Seq("doc_id"), "left_anti")
  }

  /** Exact-phrase matches from a LOADED positional index: docs where
    * `phrase` occurs as consecutive tokens, with the occurrence count.
    *
    * Plan: one token-pruned read of the index per DISTINCT phrase term
    * (an `In(token, …)` filter over the bucketed postings — row-group
    * sliver reads, never a corpus scan), inner-joined on doc_id (only
    * docs containing EVERY term survive, each join side is one term's
    * posting sliver), then ONE row-local codegen'd pass over the first
    * term's positions checking `p + i ∈ positions_i` for the rest —
    * no explode of positions, no window. Phrase frequency is exact;
    * ties and ordering are deterministic.
    */
  def phraseMatches(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      index.filter(col("token") === lit(t))
        .select(col("doc_id"), col("positions").as(s"__p$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, Seq("doc_id")))
    val tf =
      if (phrase.size == 1) size(col("__p0"))
      else size(filter(col("__p0"), p =>
        (1 until phrase.size)
          .map(i => array_contains(col(s"__p$i"), p + i))
          .reduce(_ && _)))
    joined.select(col("doc_id"), tf.cast("long").as("phrase_tf"))
      .filter(col("phrase_tf") > 0)
  }

  /** Ordered proximity matches from a LOADED positional index: docs
    * where `terms` appear IN ORDER with each step's gap ≤ `maxGap`
    * positions (maxGap = 1 degenerates to the exact phrase). The count
    * is the number of first-term positions that start a valid chain —
    * the "sloppy phrase" semantics a search engine's `"a b"~k` gives.
    *
    * Same plan as [[phraseMatches]]: token-pruned sliver reads, doc_id
    * inner joins, then one row-local pass — the chain check is nested
    * codegen'd `exists` over the later terms' position arrays, still no
    * explode and no window.
    */
  def proximityMatches(index: DataFrame, terms: Seq[String],
                       maxGap: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(maxGap >= 1, "maxGap must be >= 1")
    val parts = terms.zipWithIndex.map { case (t, i) =>
      index.filter(col("token") === lit(t))
        .select(col("doc_id"), col("positions").as(s"__p$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, Seq("doc_id")))
    def chain(i: Int, p: Column): Column =
      if (i == terms.size) lit(true)
      else exists(col(s"__p$i"),
                  q => q > p && q <= p + maxGap && chain(i + 1, q))
    val tf =
      if (terms.size == 1) size(col("__p0"))
      else size(filter(col("__p0"), p => chain(1, p)))
    joined.select(col("doc_id"), tf.cast("long").as("prox_tf"))
      .filter(col("prox_tf") > 0)
  }

  /** Selection form: the `topN` highest-BM25 docs (ties → smallest id),
    * joined back to the full rows. orderBy+limit plans as
    * TakeOrderedAndProject — per-partition top-N then a driver merge of
    * N×partitions rows, never a global sort.
    */
  def topRelevant(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], topN: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame =
    docs.join(
      bm25Scores(docs, idCol, textCol, terms, k1, b)
        .orderBy(desc("bm25"), asc("doc_id"))
        .limit(topN)
        .select(col("doc_id").as(idCol)),
      Seq(idCol))

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two ranked lists —
    * the standard hybrid-retrieval combiner: a lexical ranker (BM25) and
    * a vector ranker (ANN cosine) each contribute 1/(k + rank), and docs
    * ranked by both float to the top. Inputs are (doc_id, rank) frames
    * with rank starting at 1; a doc absent from a ranker contributes 0
    * for it. Output: (doc_id, <a>_rank, <b>_rank, rrf) — the `topN`
    * highest fused scores, ties → smallest id.
    *
    * Scale shape: both inputs are already top-N′ selections (bounded,
    * not corpus-sized), so the full-outer fuse touches ranked ids only;
    * the final orderBy+limit plans as TakeOrderedAndProject. The
    * corpus-scale work lives in the rankers upstream, which keep their
    * own plans ([[bm25Scores]]; `Similarity.bruteForceTopK` / the
    * persisted-index ANN paths).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, aName: String, bName: String,
              k: Int = 60, topN: Int = 20): DataFrame = {
    require(k > 0, "rrf k must be positive")
    val ar = a.select(col("doc_id"), col("rank").as(s"${aName}_rank"))
    val br = b.select(col("doc_id"), col("rank").as(s"${bName}_rank"))
    ar.join(br, Seq("doc_id"), "full_outer")
      .withColumn(
        "rrf",
        round(coalesce(lit(1.0d) / (lit(k) + col(s"${aName}_rank")),
                       lit(0.0d)) +
                coalesce(lit(1.0d) / (lit(k) + col(s"${bName}_rank")),
                         lit(0.0d)),
              6))
      .orderBy(desc("rrf"), asc("doc_id"))
      .limit(topN)
  }
}
