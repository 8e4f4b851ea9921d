package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {

  test("bm25 matches the hand-computed Okapi formula on a tiny corpus") {
    import spark.implicits._
    // 3 docs, 4 tokens each (avgdl = 4, dl/avgdl = 1 → length norm is
    // exactly 1 and the denominator simplifies to tf + k1)
    val docs = Seq(
      (1L, "spark spark data sql"),   // tf(spark)=2
      (2L, "spark rows and tables"),  // tf(spark)=1
      (3L, "plain text no hits")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val k1 = 1.2
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def score(tf: Double) = idf * tf * (k1 + 1) / (tf + k1)
    assert(out.keySet == Set(1L, 2L), "only docs with hits appear")
    assert(math.abs(out(1L) - score(2)) < 1e-6)
    assert(math.abs(out(2L) - score(1)) < 1e-6)
    assert(out(1L) > out(2L), "higher tf must outrank at equal length")
  }

  test("length normalization: same tf in a longer doc scores lower") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark data"),
      (2L, "spark data and many many more filler tokens here now")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L))
  }

  test("topRelevant selects the N best and plans the model side as " +
       "broadcast joins, never a corpus-side shuffle of stats") {
    import spark.implicits._
    val docs = (0 until 50).map { i =>
      (i.toLong, if (i < 5) "vector stream merge vector" else "plain filler text row")
    }.toDF("doc_id", "text")
    val top = Relevance.topRelevant(docs, "doc_id", "text",
                                    Seq("vector", "stream", "merge"),
                                    topN = 3)
    assert(top.count() == 3)
    assert(top.select("doc_id").collect().map(_.getLong(0)).toSet
             .subsetOf((0L until 5L).toSet))
    val plan = Relevance.bm25Scores(docs, "doc_id", "text", Seq("vector"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
             plan.contains("BroadcastNestedLoopJoin"),
           s"df/stats must broadcast:\n$plan")
  }

  test("rrfFuse matches hand-computed reciprocal-rank scores, handles " +
       "single-ranker docs, and breaks score ties by id") {
    import spark.implicits._
    // doc 1: rank 1 + rank 2; doc 2: rank 2 lexical only; doc 3: rank 1
    // vector only; docs 4/5: identical single-ranker ranks → tied rrf
    val lex = Seq((1L, 1L), (2L, 2L), (4L, 3L), (5L, 3L))
      .toDF("doc_id", "rank")
    val vec = Seq((1L, 2L), (3L, 1L)).toDF("doc_id", "rank")
    val out = Relevance.rrfFuse(lex, vec, "bm25", "cos",
                                k = 60, topN = 10).collect()
    val byId = out.map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    def rrf(xs: Double*) =
      math.rint(xs.map(1.0 / _).sum * 1e6) / 1e6
    assert(byId(1L) == ((Some(1L), Some(2L), rrf(61, 62))))
    assert(byId(2L) == ((Some(2L), None, rrf(62))))
    assert(byId(3L) == ((None, Some(1L), rrf(61))))
    // both-ranker doc outranks every single-ranker doc here
    assert(out.head.getLong(0) == 1L)
    // tied rrf (docs 4 and 5, same rank, same single ranker) → id order
    val order = out.map(_.getLong(0)).toSeq
    assert(order.indexOf(4L) < order.indexOf(5L),
           s"ties must break by id: $order")
    // topN truncates: ask for 2, get the 2 best
    assert(Relevance.rrfFuse(lex, vec, "bm25", "cos", k = 60, topN = 2)
             .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("indexed BM25 is byte-identical to the one-shot scorer; postings prune by token") {
    import graft.sources.Tables
    val docs  = Tables.documents(spark, sf0001)
    val terms = Seq("vector", "stream", "merge")
    val oneShot = Relevance.bm25Scores(docs, "doc_id", "text", terms)
      .orderBy("doc_id").collect().toSeq
    val idx  = Relevance.bm25Index(docs, "doc_id", "text")
    val name = "graft_test_bm25_rt"
    IndexStore.saveBm25Index(idx, name)
    try {
      val loaded = IndexStore.loadBm25Index(spark, name)
      val viaIndex = Relevance.bm25ScoresWithIndex(loaded, terms)
        .orderBy("doc_id").collect().toSeq
      assert(viaIndex == oneShot,
             "indexed path must be byte-identical to the one-shot scorer")
      // the query-term filter reaches the postings scan (row-group
      // pruning leverage: PushedFilters carries the In(token, ...))
      val plan = Relevance.bm25ScoresWithIndex(loaded, terms)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [In(token"),
             s"expected the term filter pushed into the postings scan:\n$plan")
    } finally IndexStore.drop(spark, name)
  }

  private def indexRows(idx: Relevance.Bm25Index) = {
    val p = idx.postings.select("token", "doc_id", "dl", "tf")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getDouble(3))).toSet
    val s = idx.stats.select("n_docs", "sum_dl", "avgdl")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    (p, s)
  }

  test("mergeBm25Index: rolling a delta in equals a from-scratch rebuild " +
       "(postings AND the avgdl sufficient statistics), and re-rolling " +
       "the same delta is a no-op") {
    import graft.sources.Tables
    val docs  = Tables.documents(spark, sf0001)
    val base  = docs.filter(col("doc_id") % 3 =!= 2)
    val delta = docs.filter(col("doc_id") % 3 === 2)
    val merged  = Relevance.mergeBm25Index(
      Relevance.bm25Index(base, "doc_id", "text"), delta, "doc_id", "text")
    val rebuilt = Relevance.bm25Index(docs, "doc_id", "text")
    assert(indexRows(merged) == indexRows(rebuilt),
           "merged index must equal the from-scratch rebuild exactly")
    val rerolled = Relevance.mergeBm25Index(merged, delta, "doc_id", "text")
    assert(indexRows(rerolled) == indexRows(rebuilt),
           "re-rolling the same delta must be a no-op")
  }

  test("mergeBm25Index: a re-ingested doc REPLACES its base postings and " +
       "stats contribution (upsert, not double-count)") {
    import spark.implicits._
    val base = Seq((1L, "spark streams data"),
                   (2L, "old text here")).toDF("doc_id", "text")
    val delta = Seq((2L, "completely new and longer replacement text"),
                    (3L, "spark again")).toDF("doc_id", "text")
    val merged = Relevance.mergeBm25Index(
      Relevance.bm25Index(base, "doc_id", "text"), delta, "doc_id", "text")
    val expected = Relevance.bm25Index(
      Seq((1L, "spark streams data"),
          (2L, "completely new and longer replacement text"),
          (3L, "spark again")).toDF("doc_id", "text"), "doc_id", "text")
    assert(indexRows(merged) == indexRows(expected),
           "delta docs must replace, not add to, their base postings")
  }

  test("deleteFromBm25Index equals a rebuild without the deleted docs " +
       "(postings AND the avgdl sufficient statistics); deleting an " +
       "absent id is a no-op") {
    import spark.implicits._
    val docs = Seq((1L, "spark streams data"), (2L, "spark spark fast"),
                   (3L, "slow batch job"), (4L, "data data data"))
      .toDF("doc_id", "text")
    val full = Relevance.bm25Index(docs, "doc_id", "text")
    val afterDelete = Relevance.deleteFromBm25Index(
      full, Seq(2L, 4L, 999L).toDF("doc_id"))
    val rebuilt = Relevance.bm25Index(
      docs.filter(!col("doc_id").isin(2L, 4L)), "doc_id", "text")
    def postingRows(ix: Relevance.Bm25Index) =
      ix.postings.select("token", "doc_id", "dl", "tf")
        .collect().map(_.toSeq).toSet
    assert(postingRows(afterDelete) == postingRows(rebuilt))
    assert(afterDelete.stats.head() == rebuilt.stats.head(),
           "stats must give back the deleted docs' exact contribution")
    // no-op delete: removing nothing changes nothing
    val noop = Relevance.deleteFromBm25Index(
      full, Seq(999L).toDF("doc_id"))
    assert(postingRows(noop) == postingRows(full))
    assert(noop.stats.head() == full.stats.head())
  }

  test("phraseMatches equals a brute-force sliding-window count; " +
       "single term = tf; repeated-token phrases work") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox the quick brown"),
      (2L, "quick the brown quick quick quick"),
      (3L, "the the the"),
      (4L, "no match here"),
      (5L, "")).toDF("doc_id", "text")
    val idx = Relevance.positionalIndex(docs, "doc_id", "text")
    def brute(phrase: Seq[String]): Map[Long, Long] =
      docs.collect().map { r =>
        val toks = r.getString(1).toLowerCase.trim
          .split("\\W+").filter(_.nonEmpty).toSeq
        r.getLong(0) -> toks.sliding(phrase.size)
          .count(w => w.size == phrase.size && w == phrase).toLong
      }.filter(_._2 > 0).toMap
    for (phrase <- Seq(Seq("quick", "brown"), Seq("the", "quick", "brown"),
                       Seq("the", "the"), Seq("quick", "quick", "quick"),
                       Seq("quick"), Seq("absent", "tokens"))) {
      val got = Relevance.phraseMatches(idx, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == brute(phrase), s"phrase $phrase: $got vs ${brute(phrase)}")
    }
  }

  test("mergePositionalIndex: roll equals rebuild, re-roll is a no-op, " +
       "re-ingested docs replace their rows") {
    import spark.implicits._
    val base = Seq((1L, "alpha beta gamma"), (2L, "beta beta alpha"),
                   (3L, "gamma alpha")).toDF("doc_id", "text")
    val delta = Seq((3L, "beta gamma beta"), (4L, "alpha alpha"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("token"), col("doc_id"),
                col("positions").cast("string"))
        .collect().map(_.toSeq).toSet
    val baseIdx = Relevance.positionalIndex(base, "doc_id", "text")
    val merged = Relevance.mergePositionalIndex(baseIdx, delta,
                                                "doc_id", "text")
    val rebuilt = Relevance.positionalIndex(
      base.filter(col("doc_id") =!= 3L).unionByName(delta),
      "doc_id", "text")
    assert(rows(merged) == rows(rebuilt), "merged must equal rebuilt")
    val reRolled = Relevance.mergePositionalIndex(merged, delta,
                                                  "doc_id", "text")
    assert(rows(reRolled) == rows(merged), "re-roll must be a no-op")
  }

  test("proximityMatches: maxGap=1 equals the exact phrase, matches are " +
       "a superset of phrase matches, and chains respect the gap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"),              // adjacent
      (2L, "alpha x beta"),            // gap 2
      (3L, "alpha x y z beta"),        // gap 4 — outside ~3
      (4L, "beta alpha"),              // wrong order
      (5L, "alpha x beta alpha beta")) // two chains at ~3
      .toDF("doc_id", "text")
    val idx = Relevance.positionalIndex(docs, "doc_id", "text")
    val phrase = Seq("alpha", "beta")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = toMap(Relevance.phraseMatches(idx, phrase))
    val gap1 = toMap(Relevance.proximityMatches(idx, phrase, maxGap = 1))
    assert(gap1 == exact, s"maxGap=1 must equal exact phrase: $gap1 vs $exact")
    val gap3 = toMap(Relevance.proximityMatches(idx, phrase, maxGap = 3))
    assert(gap3 == Map(1L -> 1L, 2L -> 1L, 5L -> 2L), s"got $gap3")
    // superset: every phrase-matching doc matches at any gap
    exact.keySet.foreach(id => assert(gap3.contains(id)))
    // 3-term chain: each STEP's gap is bounded, not the total span
    val tri = Seq((10L, "a x b y c"), (11L, "a b x c"),
                  (12L, "a x x b c")).toDF("doc_id", "text")
    val triIdx = Relevance.positionalIndex(tri, "doc_id", "text")
    val got = toMap(Relevance.proximityMatches(
      triIdx, Seq("a", "b", "c"), maxGap = 2))
    assert(got == Map(10L -> 1L, 11L -> 1L), s"got $got")
  }

  test("changelog-driven selective re-index equals a full rebuild of " +
       "the changelog-applied corpus: competing revisions, deletes, " +
       "and inserts all land through the roll") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha beta"), (2L, "beta gamma"),
                 (3L, "gamma delta"), (4L, "delta alpha"),
                 (5L, "epsilon zeta")).toDF("doc_id", "text")
    // doc 2: two competing revisions (v3 wins); doc 5 deleted;
    // doc 6 inserted; doc 3 upserted AND deleted at the same version
    // (upsert wins the lexicographic op tie, per applyChangelog)
    val changes = Seq(
      (2L, 2L, "upsert", "beta gamma EDITED"),
      (2L, 3L, "upsert", "beta gamma FINAL"),
      (5L, 2L, "delete", ""),
      (6L, 1L, "upsert", "eta theta"),
      (3L, 2L, "upsert", "gamma delta kept"),
      (3L, 2L, "delete", ""))
      .toDF("doc_id", "version", "op", "text")
    val latest = Versioning.latestChanges(changes, "doc_id", "version",
                                          "op", "text")
    val rolled = Relevance.mergePositionalIndex(
        Relevance.positionalIndex(v1, "doc_id", "text"),
        latest.filter(col("op") =!= "delete").select("doc_id", "text"),
        "doc_id", "text")
      .join(broadcast(latest.filter(col("op") === "delete")
                        .select("doc_id")),
            Seq("doc_id"), "left_anti")
    val v2 = Versioning.applyChangelog(v1, changes, "doc_id", "version",
                                       "op", "text")
    val rebuilt = Relevance.positionalIndex(v2, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("token"), col("doc_id"),
                col("positions").cast("string"))
        .collect().map(_.toSeq).toSet
    assert(rows(rolled) == rows(rebuilt),
           "changelog roll must equal the full rebuild exactly")
    // sanity on the semantics the tie-break encodes
    assert(rows(rolled).exists(_.toString.contains("final")),
           "doc 2's v3 revision must win")
  }

  test("serving-path plans read ONLY the persisted indexes — no " +
       "corpus-scale scan node (q143/q181/q183/q191 ad-hoc shape)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    IndexStore.saveBm25Index(
      Relevance.bm25Index(docs, "doc_id", "text"), "graft_srv_bm")
    IndexStore.savePositionalIndex(
      Relevance.positionalIndex(docs, "doc_id", "text"), "graft_srv_pos")
    try {
      val bm = IndexStore.loadBm25Index(spark, "graft_srv_bm")
      val pos = IndexStore.loadPositionalIndex(spark, "graft_srv_pos")
      val bmTop = Relevance
        .bm25ScoresWithIndex(bm, Seq("vector", "stream", "merge"))
        .orderBy(desc("bm25"), asc("doc_id")).limit(100)
        .withColumn("rank",
                    row_number().over(Window.orderBy(desc("bm25"),
                                                     asc("doc_id")))
                      .cast("long"))
        .select("doc_id", "rank")
      val phTop = Relevance.phraseMatches(pos, Seq("table", "hash"))
        .orderBy(desc("phrase_tf"), asc("doc_id")).limit(100)
        .withColumn("rank",
                    row_number().over(Window.orderBy(desc("phrase_tf"),
                                                     asc("doc_id")))
                      .cast("long"))
        .select("doc_id", "rank")
      val serving = Seq(
        "bm25"  -> Relevance.bm25ScoresWithIndex(bm, Seq("vector")),
        "phrase" -> Relevance.phraseMatches(pos, Seq("table", "hash")),
        "prox"  -> Relevance.proximityMatches(pos, Seq("table", "hash"),
                                              maxGap = 3),
        "rrf"   -> Relevance.rrfFuse(bmTop, phTop, "bm25", "phrase",
                                     k = 60, topN = 20))
      serving.foreach { case (name, df) =>
        df.collect() // force AQE-final plan
        val plan = df.queryExecution.executedPlan.toString
        // every FileScan must read index tables, never the corpus dir
        assert(!plan.contains(sf0001),
               s"$name serving plan scans the corpus directory:\n$plan")
      }
    } finally {
      IndexStore.drop(spark, "graft_srv_bm")
      IndexStore.drop(spark, "graft_srv_pos")
    }
  }

  test("phrase search over the persisted index prunes postings by token") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    IndexStore.savePositionalIndex(
      Relevance.positionalIndex(docs, "doc_id", "text"), "graft_pos_spec")
    try {
      val idx = IndexStore.loadPositionalIndex(spark, "graft_pos_spec")
      val out = Relevance.phraseMatches(idx, Seq("table", "hash"))
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("table"),
             s"token equality must reach the parquet scan:\n$plan")
      // parity with an index built in-flight (no persistence drift)
      val fresh = Relevance.phraseMatches(
        Relevance.positionalIndex(docs, "doc_id", "text"),
        Seq("table", "hash"))
      assert(out.orderBy("doc_id").collect().toSeq ==
             fresh.orderBy("doc_id").collect().toSeq)
      assert(out.count() > 0, "expected at least one phrase match")
    } finally IndexStore.drop(spark, "graft_pos_spec")
  }
}
