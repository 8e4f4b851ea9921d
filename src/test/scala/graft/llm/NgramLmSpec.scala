package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {

  private def refCorpus = {
    import spark.implicits._
    // repetitive "clean" language: the model should assign its own
    // distribution low perplexity and alien character stats high
    (0 until 40).map { i =>
      (i.toLong,
       s"the quick brown fox jumps over the lazy dog number $i again " +
         "and the dog sleeps near the fox while the fox waits")
    }.toDF("doc_id", "text")
  }

  test("fluent text scores lower perplexity than gibberish under a model " +
       "fitted on fluent text") {
    import spark.implicits._
    val model = NgramLm.fit(refCorpus, "text", n = 3)
    val cand = Seq(
      (100L, "the quick dog jumps over the lazy fox near the dog"),
      (101L, "zxq vvk pqj xxz qqq zzz kkk vvv jjj qqq wwq zqx")
    ).toDF("doc_id", "text")
    val scored = NgramLm.scoreDocs(cand, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(100L) < scored(101L) / 3,
           s"fluent text must score far lower ppl: $scored")
  }

  test("unseen grams get the smoothed floor, never -inf/NaN; sub-n docs " +
       "yield no score rows") {
    import spark.implicits._
    val model = NgramLm.fit(refCorpus, "text", n = 3)
    val cand = Seq((1L, "üñî"), (2L, "ab"), (3L, ""))
      .toDF("doc_id", "text")
    val rows = NgramLm.scoreDocs(cand, model, "doc_id", "text").collect()
    // doc 1: 3 chars → 1 trigram, fully unseen; docs 2 and 3 are shorter
    // than n and must be absent (no fabricated grams from the descending
    // sequence(1, len-n+1) trap)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    val ppl = rows.head.getDouble(3)
    assert(!ppl.isNaN && !ppl.isInfinite && ppl > 0)
  }

  test("perplexityFilter keeps fluent docs and drops gibberish at a " +
       "cutoff between their scores") {
    import spark.implicits._
    val model = NgramLm.fit(refCorpus, "text", n = 3)
    val cand = Seq(
      (100L, "the quick dog jumps over the lazy fox near the dog"),
      (101L, "zxq vvk pqj xxz qqq zzz kkk vvv jjj qqq wwq zqx")
    ).toDF("doc_id", "text")
    val scored = NgramLm.scoreDocs(cand, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val cutoff = (scored(100L) + scored(101L)) / 2
    val kept = NgramLm.perplexityFilter(cand, model, "doc_id", "text",
                                        maxPpl = cutoff)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(100L))
  }

  test("DSIR importance weights: target-like candidates score positive, " +
       "off-domain candidates negative") {
    import spark.implicits._
    val english = (0 until 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and " +
        s"the fox waits near the river number $i"))
    val german = (100 until 130).map(i =>
      (i.toLong, "der schnelle braune fuchs springt ueber den faulen " +
        s"hund und wartet am fluss nummer $i"))
    val ref = (english ++ german).toDF("doc_id", "text")
    val target = NgramLm.fit(english.toDF("doc_id", "text"), "text", n = 3)
    val raw    = NgramLm.fit(ref, "text", n = 3)
    val cand = Seq(
      (200L, "the lazy dog jumps over the brown fox near the river"),
      (201L, "der faule hund springt ueber den braunen fuchs am fluss"))
      .toDF("doc_id", "text")
    val w = NgramLm.importanceWeights(cand, target, raw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(w(200L) > 0, s"target-like doc must weigh positive: $w")
    assert(w(201L) < 0, s"off-domain doc must weigh negative: $w")
    assert(w(200L) > w(201L))
  }

  test("LM save→load→score is identical to the in-memory model") {
    val model = NgramLm.fit(refCorpus, "text", n = 3)
    import spark.implicits._
    val cand = Seq(
      (100L, "the quick dog jumps over the lazy fox near the dog"),
      (101L, "zxq vvk pqj xxz qqq zzz kkk vvv jjj qqq"))
      .toDF("doc_id", "text")
    def run(m: NgramLm.LmModel) =
      NgramLm.scoreDocs(cand, m, "doc_id", "text")
        .collect().map(_.toSeq).toSeq
    try {
      NgramLm.save(model, "lm_rt")
      val loaded = NgramLm.load(spark, "lm_rt")
      assert(loaded.n == model.n && loaded.vocabSize == model.vocabSize)
      assert(run(loaded) == run(model))
    } finally NgramLm.drop(spark, "lm_rt")
  }

  test("model vocabulary and counts match hand-computed values on a " +
       "tiny corpus") {
    import spark.implicits._
    // norm("aab") → trigram "aab": ctx "aa" → next "b"; V = {b}
    val model = NgramLm.fit(Seq((1L, "AAB")).toDF("doc_id", "text"),
                            "text", n = 3)
    assert(model.vocabSize == 1L)
    val counts = model.counts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts == Map(("aa", "b") -> 1L))
    // scoring the same doc: logp = ln((1+1)/(1+1*1)) = ln(1) = 0 → ppl 1
    val s = NgramLm.scoreDocs(Seq((1L, "aab")).toDF("doc_id", "text"),
                              model, "doc_id", "text").head()
    assert(s.getLong(1) == 1L && s.getDouble(2) == 0.0 &&
             s.getDouble(3) == 1.0)
  }

  test("perplexityBuckets: terciles split per language, most-fluent " +
       "third is head, ntile sizes follow the standard rule") {
    import spark.implicits._
    val model = NgramLm.fit(refCorpus, "text", n = 3)
    // per language: 6 candidates spanning fluent → gibberish. Within a
    // lang the fluent docs must land in head, the alien ones in tail.
    def docs(lang: String, base: Long) = Seq(
      (base + 0, "the quick brown fox jumps over the lazy dog", lang),
      (base + 1, "the dog sleeps near the fox while the fox waits", lang),
      (base + 2, "the lazy dog jumps again and the fox waits", lang),
      (base + 3, "table value part hash row scan merge filter", lang),
      (base + 4, "qqq zzz kkk vvv jjj xxz pqj vvk zxq wwq", lang),
      (base + 5, "zxq vvk pqj xxz qqq zzz kkk vvv jjj qqq", lang))
    val cand = (docs("en", 0L) ++ docs("de", 100L))
      .toDF("doc_id", "text", "lang")
    val out = NgramLm.perplexityBuckets(cand, model, "doc_id", "text",
                                        byCols = Seq("lang"))
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getInt(4), r.getString(5))).toMap
    // 6 docs per lang → exactly 2 per tercile in each language
    for (lang <- Seq("en", "de")) {
      val byBucket = rows.values.filter(_._1 == lang).groupBy(_._3)
        .view.mapValues(_.size).toMap
      assert(byBucket == Map("head" -> 2, "middle" -> 2, "tail" -> 2),
             s"$lang terciles: $byBucket")
    }
    // fluent docs head, gibberish tail, in BOTH languages independently
    for (base <- Seq(0L, 100L)) {
      assert(rows(base + 0)._3 == "head" && rows(base + 1)._3 == "head",
             s"fluent docs must be head: $rows")
      assert(rows(base + 4)._3 == "tail" && rows(base + 5)._3 == "tail",
             s"gibberish must be tail: $rows")
    }
    // bucket name is a pure function of the tercile
    assert(rows.values.forall { case (_, t, b) =>
      (t == 1 && b == "head") || (t == 2 && b == "middle") ||
      (t == 3 && b == "tail")
    })
  }

  test("perplexityBucketsApprox agrees with the exact ntile anchor on " +
       "distinct-ppl data and holds near-thirds on the sf0.001 corpus") {
    import spark.implicits._
    val model = NgramLm.fit(refCorpus, "text", n = 3)
    def docs(lang: String, base: Long) = Seq(
      (base + 0, "the quick brown fox jumps over the lazy dog", lang),
      (base + 1, "the dog sleeps near the fox while the fox waits", lang),
      (base + 2, "the lazy dog jumps again and the fox waits", lang),
      (base + 3, "table value part hash row scan merge filter", lang),
      (base + 4, "qqq zzz kkk vvv jjj xxz pqj vvk zxq wwq", lang),
      (base + 5, "zxq vvk pqj xxz qqq zzz kkk vvv jjj qqq", lang))
    val cand = (docs("en", 0L) ++ docs("de", 100L))
      .toDF("doc_id", "text", "lang")
    val exact = NgramLm.perplexityBuckets(
      cand, model, "doc_id", "text", byCols = Seq("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    val approx = NgramLm.perplexityBucketsApprox(
      cand, model, "doc_id", "text", byCols = Seq("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    // distinct ppl values, sketch exact at this size → full agreement
    assert(approx == exact, s"approx $approx vs exact $exact")
    // bulk check: per-source buckets on the real corpus stay near
    // thirds (25 docs/source → 8.33 per bucket; allow sketch + tie slop)
    import graft.sources.Tables
    val corpus = Tables.documents(spark, sf0001)
    val lm = NgramLm.fit(corpus, "text", n = 3)
    val shares = NgramLm.perplexityBucketsApprox(
      corpus, lm, "doc_id", "text", byCols = Seq("source"))
      .groupBy("source", "bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    for (((src, bucket), n) <- shares)
      assert(n >= 5 && n <= 12, s"$src/$bucket count $n strayed from 8.3")
  }
}
