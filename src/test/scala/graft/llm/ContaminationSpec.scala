package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic decontamination ([[Contamination.semanticContamination]]):
  * hand-built geometry where every flag, count, and tie-break is known.
  * (The lexical contamination paths are covered in QualityFiltersSpec /
  * RobustnessSpec; the oracle-checked q67/q87/q91 carry the gate.)
  */
class ContaminationSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("semanticContamination: flags, hit counts, and argmax are exact " +
       "on known geometry") {
    // eval: e10 = x-axis, e20 = y-axis
    val eval = vecs(10L -> Seq(1f, 0f), 20L -> Seq(0f, 1f))
    val train = vecs(
      1L -> Seq(1f, 0f),    // cos 1.0 with e10 → contaminated, 1 hit
      2L -> Seq(3f, 4f),    // cos .6 with e10, .8 with e20 → 2 hits
      3L -> Seq(-1f, 0f),   // max cos 0.0 (with e20) → clean
      4L -> Seq(-3f, -4f))  // all cos < 0 → clean, closest is the larger
    val out = Contamination
      .semanticContamination(train, eval, threshold = 0.5)
      .orderBy("train_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(byId(1L) == ((10L, 1.0, 1L, true)))
    assert(byId(2L) == ((20L, 0.8, 2L, true)))
    assert(byId(3L) == ((20L, 0.0, 0L, false)))
    // t4: cos -0.6 vs e10, -0.8 vs e20 → max is -0.6 at e10
    assert(byId(4L) == ((10L, -0.6, 0L, false)))
  }

  test("semanticContamination: equal-cosine ties resolve to the SMALLEST " +
       "eval id (the struct-max tie-break)") {
    val eval = vecs(7L -> Seq(1f, 0f), 3L -> Seq(0f, 1f))
    // diagonal: identical cosine 1/sqrt(2) to both axes
    val train = vecs(1L -> Seq(1f, 1f))
    val r = Contamination.semanticContamination(train, eval, 0.5)
      .collect().head
    assert(r.getLong(1) == 3L, s"tie must pick eval 3, got ${r.getLong(1)}")
    assert(r.getBoolean(4))
    assert(r.getLong(3) == 2L) // both evals above threshold
  }

  test("semanticContamination on the corpus: deterministic, partial, and " +
       "monotone in the threshold") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val train = emb.filter(col("vec_id") % 10 =!= 3)
    val eval  = emb.filter(col("vec_id") % 10 === 3)
    def flagged(th: Double) =
      Contamination.semanticContamination(train, eval, th)
        .filter(col("is_contaminated")).count()
    val n3 = flagged(0.3)
    assert(n3 > 0 && n3 < train.count(),
           s"threshold 0.3 must flag a PARTIAL set, flagged $n3")
    assert(flagged(0.5) <= n3, "higher threshold must flag fewer")
    val a = Contamination.semanticContamination(train, eval, 0.3)
      .orderBy("train_id").collect().toSeq
    val b = Contamination.semanticContamination(train, eval, 0.3)
      .orderBy("train_id").collect().toSeq
    assert(a == b)
  }

  test("decon matrix (q157): set algebra holds per source and the rollup " +
       "covers every train doc exactly once") {
    val out = graft.operators.LlmQueries
      .q157DeconMatrix(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, lex, sem, both, either) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5))
      assert(both <= math.min(lex, sem))
      assert(either == lex + sem - both, s"inclusion-exclusion in $r")
      assert(either <= n)
    }
    val nTrain = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 10 =!= 3).count()
    assert(out.map(_.getLong(1)).sum == nTrain)
  }

  test("cluster decon (q158): a planted near-dup of an eval doc is " +
       "flagged; unrelated docs are not") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 6
    val docs = Seq(
      3L  -> base,                       // eval (id%10=3)
      11L -> (base + "tail edit"),       // near-dup of the eval doc
      12L -> ("completely different content about spark shuffles " * 6))
      .toDF("doc_id", "text")
    val clusters = Dedup.minhashPortable(docs, "doc_id", "text")
      .select("doc_id", "cluster_id")
    val leak = clusters.filter(col("doc_id") % 10 === 3)
      .select(col("cluster_id")).distinct()
    val flagged = clusters.filter(col("doc_id") % 10 =!= 3)
      .join(leak, Seq("cluster_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(11L),
           s"only the planted near-dup must be flagged, got $flagged")
    // the registered query stays deterministic end-to-end
    val a = graft.operators.LlmQueries.q158ClusterDecon(spark, sf0001)
      .collect().toSeq
    assert(a.nonEmpty)
    assert(a == graft.operators.LlmQueries.q158ClusterDecon(spark, sf0001)
             .collect().toSeq)
  }

  test("IVF-probed semantic decon (q160): flags are a strict subset of " +
       "the exact gate's (zero false positives); probing EVERY cell " +
       "recovers the exact flag set") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val train = emb.filter(col("vec_id") % 10 =!= 3)
    val eval  = emb.filter(col("vec_id") % 10 === 3)
    val exact = Contamination.semanticContamination(train, eval, 0.3)
      .filter(col("is_contaminated"))
      .select("train_id").collect().map(_.getLong(0)).toSet
    val index = Similarity.ivfIndex(train, nCells = 8, seed = 42L)
    def flagged(nProbe: Int) =
      Similarity.ivfThresholdMatches(index, eval, 0.3, nProbe)
        .select("corpus_id").distinct()
        .collect().map(_.getLong(0)).toSet
    val probed3 = flagged(3)
    assert(probed3.nonEmpty && probed3.subsetOf(exact),
           "probed flags must carry true cosines — no false positives")
    assert(flagged(8) == exact,
           "probing all cells must equal the exact threshold gate")
  }
}
