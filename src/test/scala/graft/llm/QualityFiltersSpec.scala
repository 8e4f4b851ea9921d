package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityFiltersSpec extends SparkSpec {

  test("repetition profile: duplicate lines and top-2-gram fractions on planted docs") {
    import spark.implicits._
    val docs = Seq(
      // 4 lines, "same line" 3× → dup_line_frac = 1 - 2/4 = 0.5
      (1L, "same line\nsame line\nsame line\nunique tail"),
      // no repetition at all
      (2L, "alpha beta\ngamma delta"),
      // "spam spam" 2-gram repeated heavily
      (3L, "spam spam spam spam spam spam"),
      (4L, ""),
      (5L, "one line only")).toDF("doc_id", "text")
    val out = QualityFilters.repetitionProfile(docs, "text")
      .select("doc_id", "dup_line_frac", "dup_line_char_frac",
              "top_2gram_char_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

    assert(out(1L)._1 == 0.5)
    // duplicate-line chars: 3 × len("same line")=9 → 27 of 27+11=38
    assert(math.abs(out(1L)._2 - 27.0 / 38.0) < 1e-3)
    assert(out(2L)._1 == 0.0 && out(2L)._2 == 0.0)
    // "spam spam" occurs 5× as a 2-gram, len 9, text len 29 → capped ≤ 1
    assert(out(3L)._3 == 1.0)
    assert(out(4L) == ((0.0, 0.0, 0.0)))
    assert(out(5L)._1 == 0.0)
  }

  test("PII masking replaces emails, URLs, IPs; counts match") {
    import spark.implicits._
    val df = Seq(
      "write to alice.smith+tag@sub.example.co.uk today",
      "docs at https://spark.apache.org/docs/latest?x=1 and http://a.b/c",
      "server 10.0.0.1 and 192.168.255.254 up",
      "no pii here at all").toDF("t")
    val masked = df.select(QualityFilters.maskPii(col("t")).as("m"))
      .collect().map(_.getString(0))
    assert(masked(0) == "write to <EMAIL> today")
    assert(masked(1) == "docs at <URL> and <URL>")
    assert(masked(2) == "server <IP> and <IP> up")
    assert(masked(3) == "no pii here at all")
    val (em, ur, ip) = QualityFilters.piiCounts(col("t"))
    val counts = df.select(em, ur, ip).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(counts.toSeq == Seq((1, 0, 0), (0, 2, 0), (0, 0, 2), (0, 0, 0)))
  }

  test("hash sampling is deterministic, content-stable, and near the target rate") {
    import spark.implicits._
    val df = (0L until 10000L).toDF("id")
    val kept = df.filter(QualityFilters.hashSampleFlag(col("id"), "3333"))
      .collect().map(_.getLong(0)).toSet
    // 0x3333/0x10000 ≈ 20%: binomial(10000, .2) stays well inside ±3%
    assert(kept.size > 1700 && kept.size < 2300, s"rate ${kept.size / 10000.0}")
    val kept2 = df.filter(QualityFilters.hashSampleFlag(col("id"), "3333"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == kept2)
    // membership is per-key content, not per-run: a disjoint frame keeps
    // exactly the overlapping keys
    val sub = (5000L until 15000L).toDF("id")
      .filter(QualityFilters.hashSampleFlag(col("id"), "3333"))
      .collect().map(_.getLong(0)).toSet
    assert((sub.filter(_ < 10000L)) == kept.filter(_ >= 5000L))
  }

  test("weightedMix: per-stratum rates, nesting as weights grow, default rate") {
    import spark.implicits._
    val df = (0L until 9000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    def keptIds(w: Map[String, String]) =
      QualityFilters.weightedMix(df, "src", "id", w, "0800")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val k1 = keptIds(Map("s0" -> "8000", "s1" -> "2000"))
    val bySrc = k1.groupBy(_._2).view.mapValues(_.size).toMap
    // 3000 per stratum: s0 ≈ 50%, s1 ≈ 12.5%, s2 (default) ≈ 3%
    assert(bySrc("s0") > 1350 && bySrc("s0") < 1650, bySrc.toString)
    assert(bySrc("s1") > 280 && bySrc("s1") < 470, bySrc.toString)
    assert(bySrc.getOrElse("s2", 0) > 40 && bySrc("s2") < 160, bySrc.toString)
    // raising one stratum's weight only ADDS members there (nesting), and
    // never changes other strata
    val k2 = keptIds(Map("s0" -> "c000", "s1" -> "2000"))
    assert(k1.filter(_._2 == "s0").subsetOf(k2.filter(_._2 == "s0")))
    assert(k1.filter(_._2 != "s0") == k2.filter(_._2 != "s0"))
  }

  test("stratifiedTopN: exactly n per stratum, deterministic, content-stable") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val s1 = QualityFilters.stratifiedTopN(df, "lang", "id", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.length == 30)
    assert(s1.groupBy(_._2).forall(_._2.length == 10))
    val s2 = QualityFilters.stratifiedTopN(df, "lang", "id", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.toSet == s2.toSet)
    // content-stable: adding rows to OTHER strata never changes a
    // stratum's selection; adding rows to the same stratum only replaces
    // members whose md5 sorts later
    val bigger = ((0L until 300L) ++ (1000L until 1100L))
      .map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val s3 = QualityFilters.stratifiedTopN(bigger, "lang", "id", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // every survivor from the bigger run that existed before must have
    // been selected before (md5 order is global, so prefixes nest)
    assert(s3.filter(_._1 < 300L).toSet.subsetOf(s1.toSet))
  }

  test("gopherStats: planted violations trip the right rules") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "it runs back home with that same steady pace we have come to expect"
    val docs = Seq(
      (1L, good),                                       // passes
      (2L, "one two"),                                  // too few words
      (3L, ("- bullet item\n" * 10) + "the end of that with be"), // bullets
      (4L, good + " ### ## # # # # # # # # # # # # #"), // symbol soup
      (5L, "a1 b2 c3 44 55 66 77 88 99 00 " * 3 + "the of and with")) // non-alpha
      .toDF("doc_id", "text")
    val out = QualityFilters.gopherStats(docs, "text")
      .select("doc_id", "keep", "n_words", "bullet_line_frac",
              "symbol_ratio", "alpha_word_frac", "stopword_hits")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
         r.getDouble(5), r.getLong(6))).toMap
    assert(out(1L)._1, s"good doc rejected: ${out(1L)}")
    assert(!out(2L)._1 && out(2L)._2 < 5)
    assert(!out(3L)._1 && out(3L)._3 > 0.9)
    assert(!out(4L)._1 && out(4L)._4 > 0.1)
    assert(!out(5L)._1 && out(5L)._5 < 0.8)
  }

  test("contamination report: planted leak is flagged, clean docs are not") {
    import spark.implicits._
    val leaked = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima"
    val train = Seq(
      (1L, s"prefix words here $leaked suffix words trail"),
      (2L, "completely clean document with its own fresh content words " +
           "never seen in any benchmark at all"),
      (3L, leaked)) // exact eval doc text
      .toDF("doc_id", "text")
    val eval = Seq((100L, leaked)).toDF("doc_id", "text")
    val out = Contamination.contaminationReport(train, eval,
                                                "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1L)._2 && out(1L)._1 >= 1)
    assert(!out(2L)._2 && out(2L)._1 == 0)
    assert(out(3L)._2)
    // short-doc branch: fewer than n tokens → whole doc is the gram
    val shortEval  = Seq((200L, "tiny doc")).toDF("doc_id", "text")
    val shortTrain = Seq((4L, "tiny doc"), (5L, "other thing"))
      .toDF("doc_id", "text")
    val shortOut = Contamination.contaminationReport(
      shortTrain, shortEval, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(shortOut(4L) && !shortOut(5L))
  }

  test("contamination spans: leaked region localized and merged; " +
       "separated leaks stay separate spans") {
    import spark.implicits._
    // doc 1: tokens 0-1 clean, 2-13 leaked (12 eval tokens), 14-16 clean
    // → consecutive 8-gram hits at starts 2..6 merge into ONE span [2,13]
    val leaked = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima"
    val eval = Seq((100L, leaked),
                   (101L, "zulu yankee xray whiskey victor uniform " +
                          "tango sierra")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"prefix words $leaked and a tail"),
      // doc 2: TWO leaks separated by clean middle tokens → two spans
      (2L, s"$leaked middle clean words between leaks zulu yankee xray " +
           "whiskey victor uniform tango sierra"),
      (3L, "entirely clean content nothing shared with benchmarks at " +
           "all in any way whatsoever today")).toDF("doc_id", "text")
    val spans = Contamination
      .contaminationSpans(train, eval, "doc_id", "text", n = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val byDoc = spans.groupBy(_._1)
    // doc 1: one merged span covering exactly the leaked tokens 2..13
    assert(byDoc(1L).toSeq == Seq((1L, 2L, 13L, 5L)),
           s"doc1 spans: ${byDoc(1L).toSeq}")
    // doc 2: two disjoint spans (leak at the head, leak at the tail)
    assert(byDoc(2L).length == 2, s"doc2 spans: ${byDoc(2L).toSeq}")
    val Seq(s1, s2) = byDoc(2L).toSeq.sortBy(_._2)
    assert(s1._2 == 0L && s1._3 == 11L, s"head leak: $s1")
    assert(s2._3 > s2._2 && s1._3 < s2._2 - 1, s"disjoint: $s1 $s2")
    // doc 3: clean → absent
    assert(!byDoc.contains(3L))
  }

  test("exciseContamination removes EXACTLY the leaked tokens, keeps the " +
       "rest in order; clean docs pass through with zero removals") {
    import spark.implicits._
    val leaked = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima"
    val eval = Seq((100L, leaked)).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"prefix words $leaked and a tail"),
      (2L, "entirely clean content nothing shared with benchmarks"),
      (3L, leaked) // fully leaked doc → empty cleaned text
    ).toDF("doc_id", "text")
    val out = Contamination
      .exciseContamination(train, eval, "doc_id", "text", n = 8)
      .collect()
      .map(r => r.getLong(0) ->
             ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("prefix words and a tail", 5L, 12L)),
           s"doc1: ${out(1L)}")
    assert(out(2L) ==
             (("entirely clean content nothing shared with benchmarks",
               7L, 0L)))
    assert(out(3L) == (("", 0L, 12L)), s"fully leaked: ${out(3L)}")
  }

  test("bloom-prefiltered contamination is byte-identical to the exact path") {
    import graft.sources.Tables
    val docs  = Tables.documents(spark, sf0001)
    val train = docs.filter(col("doc_id") % 10 =!= 3)
    val eval  = docs.filter(col("doc_id") % 10 === 3)
    val exact = Contamination.contaminationReport(
      train, eval, "doc_id", "text", n = 6)
      .orderBy("doc_id").collect().toSeq
    val bloom = Contamination.contaminationReportBloom(
      train, eval, "doc_id", "text", n = 6, fpp = 0.01)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact,
           "bloom path must equal exact path after the verify join")
    assert(exact.exists(_.getBoolean(2)) && exact.exists(!_.getBoolean(2)),
           "fixture should exercise both outcomes")
  }

  test("mixtureTokenBudget: floored per-source budgets from integer " +
       "weights, greedy fill, id ties, empty-source selections") {
    import spark.implicits._
    // 9 identical 10-token docs → equal quality, ties broken by id.
    // T=90, fraction 0.5 → 45 tokens to split over w: A=3, B=1, C=1
    // (default) → Σw=5. Budgets: A floor(45·3/5)=27, B=C floor(45/5)=9.
    // A fits 2 docs (20 ≤ 27 < 30); B and C fit none (10 > 9).
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, "A", text), (2L, "A", text), (3L, "A", text), (4L, "A", text),
      (5L, "B", text), (6L, "B", text), (7L, "B", text), (8L, "B", text),
      (9L, "C", text))
      .toDF("doc_id", "source", "text")
    val out = QualityFilters.mixtureTokenBudget(
      docs, "doc_id", "text", "source", budgetFraction = 0.5,
      weights = Map("A" -> 3L, "B" -> 1L), defaultWeight = 1L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L),
           s"selection: ${out.map(_.getLong(0)).toSeq}")
    assert(out.map(r => (r.getLong(2), r.getLong(4), r.getLong(5))).toSeq
             == Seq((10L, 10L, 27L), (10L, 20L, 27L)))
    // full budget spend: raising B's weight to dominate flips selection
    val out2 = QualityFilters.mixtureTokenBudget(
      docs, "doc_id", "text", "source", budgetFraction = 1.0,
      weights = Map("A" -> 1L, "B" -> 1L), defaultWeight = 1L)
      .collect()
    // fraction 1, equal weights → each source budget = floor(90/3)=30:
    // A and B fit 3 docs each, C fits its single doc
    assert(out2.map(_.getLong(0)).sorted.toSeq ==
             Seq(1L, 2L, 3L, 5L, 6L, 7L, 9L))
  }

  test("mixtureTokenBudgetApprox brackets the exact per-source fill " +
       "on the sf0.001 corpus and never keeps below its cutoff") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf0001)
    val weights = Map("src0" -> 3L, "src1" -> 0L) // skew + a zero weight
    val exact = QualityFilters.mixtureTokenBudget(
      docs, "doc_id", "text", "source", budgetFraction = 0.5, weights)
      .groupBy("source")
      .agg(sum("toks").as("kept"), first("src_budget").as("budget"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val approx = QualityFilters.mixtureTokenBudgetApprox(
      docs, "doc_id", "text", "source", budgetFraction = 0.5, weights)
    // every kept row respects its source's cutoff and budget columns
    assert(approx.filter(col("q") < col("q_cut")).count() == 0)
    val apx = approx.groupBy("source")
      .agg(sum("toks").as("kept"), first("src_budget").as("budget"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // the zero-weight source is selected by NEITHER form
    assert(!exact.contains("src1") && !apx.contains("src1"))
    for ((src, (_, budget)) <- exact) {
      val (keptA, budgetA) = apx.getOrElse(src, (0L, -1L))
      assert(budgetA == budget, s"$src budgets disagree")
      // token-weighted histogram cutoff: spend can NEVER overshoot the
      // budget, and under-fills by at most one quality bin's tokens
      assert(keptA <= budget, s"$src: approx overspent $keptA > $budget")
      assert(keptA > budget * 0.6,
             s"$src: approx kept $keptA vs budget $budget")
    }
  }

  test("mixtureTokenBudgetApprox empty-selection edge: a source whose " +
       "top quality bin alone exceeds its budget drops entirely " +
       "(documented under-fill-bound exception) while the exact form " +
       "keeps leading docs that fit") {
    import spark.implicits._
    // 4 identical docs → one quality bin holding all 40 tokens; at
    // budgetFraction 0.4 the source budget is floor(40·0.4)=16 < 40, so
    // no histogram bin satisfies spend <= budget
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (1L to 4L).map(i => (i, "X", txt))
      .toDF("doc_id", "source", "text")
    val exact = QualityFilters.mixtureTokenBudget(
      docs, "doc_id", "text", "source", budgetFraction = 0.4,
      weights = Map.empty[String, Long])
    // exact form: cum sort keeps the leading doc (10 <= 16)
    assert(exact.count() == 1)
    val approx = QualityFilters.mixtureTokenBudgetApprox(
      docs, "doc_id", "text", "source", budgetFraction = 0.4,
      weights = Map.empty[String, Long])
    // approx form: the documented edge — source vanishes rather than
    // overspending its budget by keeping the whole top bin
    assert(approx.count() == 0)
  }

  test("per-source gopher yield (q120): rules counted independently, " +
       "kept = composite gate") {
    import spark.implicits._
    val dir = tmpDir("gopheryield")
    val good = "the quick brown fox jumps over a lazy dog near the barn"
    val docs = Seq(
      (1L, "A", good),                  // passes everything
      (2L, "A", "too few"),             // v_words (2 < 5), no stopword hit
      (3L, "B", good),
      (4L, "B", "zz qq ## ## ## ## ##")) // symbol soup: wordTokens drops
                                         // the '#' runs → 2 words →
                                         // v_words + v_symbol + v_stopword
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.LlmQueries
      .queries("q120_gopher_yield")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(7),
         r.getLong(8), r.getLong(9))).toMap
    // columns: source, n_docs, v_words, v_word_len, v_symbol, v_bullet,
    //          v_ellipsis, v_alpha, v_stopword, n_kept
    assert(out("A") == ((2L, 1L, 0L, 0L, 1L, 1L)), s"A: $out")
    assert(out("B") == ((2L, 1L, 1L, 0L, 1L, 1L)), s"B: $out")
  }

  test("temperatureSample: T=2 lifts the low-resource stratum to full " +
       "keep and downsamples the high-resource one; T=1 is proportional") {
    import spark.implicits._
    // A = 1600 rows, B = 100 rows → Σ = 1700, budget 850.
    // T=2: wA=40, wB=10 → rateA = 850·40/50/1600 = 0.425,
    //      rateB = 850·10/50/100 = 1.7 → clamped to 1.
    val df = ((0 until 1600).map(i => (i.toLong, "A")) ++
              (0 until 100).map(i => (10000L + i, "B")))
      .toDF("doc_id", "source")
    val t2 = QualityFilters.temperatureSample(df, "source", "doc_id",
                                              budgetFrac = 0.5,
                                              temperature = 2)
    val rep = t2.groupBy("source")
      .agg(first("thresh_ppm").as("t"),
           sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rep("A")._1 == 425000L, s"A threshold: $rep")
    assert(rep("B")._1 == 1000000L && rep("B")._2 == 100L,
           s"B must be fully kept: $rep")
    // md5 membership is ~binomial(1600, 0.425): wide bracket, zero noise
    assert(rep("A")._2 > 560 && rep("A")._2 < 800, s"A kept: $rep")
    // T=1 degenerates to plain proportional sampling: every stratum
    // gets exactly the budget rate (850/1700 = 0.5 → 500000 ppm).
    val t1 = QualityFilters.temperatureSample(df, "source", "doc_id",
                                              budgetFrac = 0.5,
                                              temperature = 1)
      .select("source", "thresh_ppm").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t1 == Map("A" -> 500000L, "B" -> 500000L), s"T=1: $t1")
  }

  test("gramNovelty: exact copies score 0 ppm, unique docs 1e6 ppm, " +
       "partial overlap in between") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, shared),                              // copy of 2 → 0 novel
      (2L, shared),
      (3L, "one two three four five six seven"), // fully unique
      // 9 tokens: 4 grams; the first gram == doc 1/2's first gram
      (4L, "alpha beta gamma delta epsilon zeta nine ten eleven"))
      .toDF("doc_id", "text")
    val out = graft.llm.Contamination
      .gramNovelty(docs, "doc_id", "text", n = 6)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L)._3 == 0L && out(2L)._3 == 0L)
    assert(out(3L) == (2L, 2L, 1000000L)) // 7 tokens → 2 grams, both novel
    // doc 4: 4 grams, 1 shared with docs 1/2 → 3 novel → 750000 ppm
    assert(out(4L) == (4L, 3L, 750000L))
  }

  test("epoch schedule: hand-computed plan, caps, and invariants") {
    import spark.implicits._
    // big: 1 doc × 100 tokens; small: 1 doc × 4 tokens. T=2 weights:
    // wq_big = 10_000_000, wq_small = 2_000_000, w_sum = 12_000_000.
    // budget = floor(104 · 2.0) = 208.
    // target_big   = floor(1e7 · 208 / 1.2e7)  = 173  (1.73 epochs)
    // target_small = floor(2e6 · 208 / 1.2e7)  = 34 → cap 4·4 = 16
    val docs = Seq(
      ("big", (1 to 100).map(i => s"t$i").mkString(" ")),
      ("small", "just four tokens here")).toDF("source", "text")
    val out = QualityFilters.epochSchedule(docs, "source", "text",
                                           budgetMult = 2.0)
      .collect().map(r => r.getString(0) -> r).toMap
    val big = out("big")
    assert(big.getAs[Long]("n_toks") == 100L)
    assert(big.getAs[Long]("weight_ppm") == 833333L)
    assert(big.getAs[Long]("target_toks") == 173L)
    assert(big.getAs[Long]("effective_toks") == 173L)
    assert(big.getAs[Long]("epochs_x1000") == 1730L)
    assert(!big.getAs[Boolean]("capped"))
    val small = out("small")
    assert(small.getAs[Long]("n_toks") == 4L)
    assert(small.getAs[Long]("weight_ppm") == 166666L)
    assert(small.getAs[Long]("target_toks") == 34L)
    assert(small.getAs[Long]("effective_toks") == 16L)
    assert(small.getAs[Long]("epochs_x1000") == 4000L)
    assert(small.getAs[Boolean]("capped"))
  }

  test("epoch schedule: temperature upweights small sources, never " +
       "exceeds the cap, and weights sum to ≤ 1e6 ppm") {
    import spark.implicits._
    val docs = (0 until 300).map { i =>
      val src = s"src${i % 10}"
      // source sizes spread over ~1 order of magnitude
      val words = 5 + (i % 10) * 10
      (src, (1 to words).map(j => s"w$j").mkString(" "))
    }.toDF("source", "text")
    val out = QualityFilters.epochSchedule(docs, "source", "text",
                                           budgetMult = 1.0,
                                           maxEpochs = 3)
      .collect()
    assert(out.map(_.getAs[Long]("weight_ppm")).sum <= 1000000L)
    out.foreach { r =>
      assert(r.getAs[Long]("effective_toks") <=
               r.getAs[Long]("n_toks") * 3)
      assert(r.getAs[Long]("epochs_x1000") <= 3000L)
      assert(r.getAs[Long]("effective_toks") <=
               r.getAs[Long]("target_toks"))
    }
    // sqrt temperature: smallest source gets MORE epochs than largest
    val bySize = out.sortBy(_.getAs[Long]("n_toks"))
    assert(bySize.head.getAs[Long]("epochs_x1000") >=
             bySize.last.getAs[Long]("epochs_x1000"))
    // uniform-weight sanity at T=1: epochs ≈ budgetMult for every source
    val flat = QualityFilters.epochSchedule(docs, "source", "text",
                                            budgetMult = 1.0,
                                            maxEpochs = 3,
                                            temperature = 1).collect()
    flat.foreach { r =>
      val e = r.getAs[Long]("epochs_x1000")
      assert(e >= 990L && e <= 1000L, s"T=1 epochs drifted: $r")
    }
  }

  test("domainCap keeps the top-cap docs per domain, quality desc, ties by id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 0.9), (2L, "a", 0.9), (3L, "a", 0.5), (4L, "a", 0.7),
      (5L, "b", 0.1), (6L, "b", 0.2),
      (7L, "c", 0.3)
    ).toDF("doc_id", "source", "q")
    val kept = QualityFilters.domainCap(docs, "source", "doc_id", "q", cap = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSeq
    // a: 0.9/0.9 tie broken by id (1 then 2); 0.7 and 0.5 cut
    // b: both survive (under cap); c: singleton
    assert(kept == Seq((1L, "a", 1), (2L, "a", 2), (5L, "b", 2),
                       (6L, "b", 1), (7L, "c", 1)))
  }

  test("domainCap plan: rank bound pushes below the sort (WindowGroupLimit)") {
    val docs = graft.sources.Tables.documents(spark, sf0001).select(
      col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    val plan = QualityFilters.domainCap(docs, "source", "doc_id", "q", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
           s"expected WindowGroupLimit in:\n$plan")
  }

  test("c4LineFilter: planted lines — terminal punct, min words, bullets") {
    import spark.implicits._
    val text = Seq(
      "This is a good sentence.",          // kept
      "short.",                            // < 3 words
      "- a bullet item here.",             // bullet marker
      "2) numbered list item stays out.",  // numbered marker
      "no terminal punctuation here",      // no terminal punct
      "",                                  // blank: not a line at all
      "Another proper sentence ends here!" // kept
    ).mkString("\n")
    val out = QualityFilters.c4LineFilter(
      Seq((1L, text), (2L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 6L && r1.getLong(2) == 2L) // 6 non-blank, 2 kept
    assert(r1.getDouble(3) == 0.333333)
    // md5 of the reassembled kept text, engine-portable
    assert(r1.getString(4) == "90b1122478a15a1bfb17408c352f5c94")
    val r2 = out(1) // empty doc: nothing to judge
    assert(r2.getLong(1) == 0L && r2.getDouble(3) == 0.0 &&
             r2.getString(4) == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("q141 epoch expansion materializes the schedule: copies bracket the budget") {
    import graft.sources.Tables
    val docs  = Tables.documents(spark, sf0001)
    val out   = graft.operators.LlmQueries
      .q141EpochExpand(spark, sf0001)
    // every doc appears floor(epochs) or floor(epochs)+1 times
    val sched = QualityFilters.epochSchedule(docs, "source", "text",
                                             budgetMult = 2.0,
                                             maxEpochs = 4, temperature = 2)
      .select("source", "epochs_x1000").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n")).collect()
    perDoc.foreach { r =>
      val e = sched(r.getString(1))
      val n = r.getLong(2)
      assert(n == e / 1000 || n == e / 1000 + 1,
             s"doc ${r.getLong(0)}: $n copies for epochs $e")
    }
    // per-source expanded token mass lands near effective_toks: the
    // fractional copies are hash-sampled, so allow a ±15% band
    val toks = docs.select(col("doc_id"),
                           TextAnalysis.wsTokenCount(col("text"))
                             .cast("long").as("t"))
    val expanded = out.join(toks, Seq("doc_id"))
      .groupBy("source").agg(sum("t").as("got")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val eff = QualityFilters.epochSchedule(docs, "source", "text",
                                           budgetMult = 2.0,
                                           maxEpochs = 4, temperature = 2)
      .select("source", "effective_toks").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    eff.foreach { case (s, want) =>
      val got = expanded(s).toDouble
      assert(got > want * 0.85 && got < want * 1.15,
             s"source $s expanded to $got vs target $want")
    }
    // copy_idx is dense 0..n-1 per doc
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("mx"),
           min("copy_idx").as("mn"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0)
    assert(bad.count() == 0)
  }

  test("funnel v2: stage counts are monotone non-increasing and deterministic") {
    val out = graft.operators.LlmQueries.q145FunnelV2(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out.map(_._1) == Seq("0_all", "1_blocklist",
                                "2_script_hygiene", "3_domain_cap",
                                "4_deduped"))
    assert(out.map(_._2) == out.map(_._2).sorted.reverse,
           s"stage counts must not increase: $out")
    assert(out.head._2 > 0 && out.last._2 > 0)
    assert(out == graft.operators.LlmQueries.q145FunnelV2(spark, sf0001)
             .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("weightedPrioritySample: exactly k per stratum, deterministic, " +
       "and the sample NESTS as k grows") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "n_chars")
    val k10 = QualityFilters.weightedPrioritySample(
      docs, "source", "doc_id", "n_chars", k = 10)
    val k20 = QualityFilters.weightedPrioritySample(
      docs, "source", "doc_id", "n_chars", k = 20)
    val per = k10.groupBy("source").agg(count(lit(1)).as("n")).collect()
    assert(per.nonEmpty && per.forall(_.getLong(1) == 10L))
    // nesting: every k=10 winner survives at k=20 with the SAME rank
    val j = k10.select(col("source"), col("doc_id"), col("rank").as("r10"))
      .join(k20.select(col("doc_id"), col("rank").as("r20")), Seq("doc_id"))
    assert(j.count() == k10.count())
    assert(j.filter(col("r10") =!= col("r20")).count() == 0)
    assert(k10.orderBy("source", "rank").collect().toSeq ==
           QualityFilters.weightedPrioritySample(
             docs, "source", "doc_id", "n_chars", k = 10)
             .orderBy("source", "rank").collect().toSeq)
  }

  test("weightedPrioritySample pulls toward heavy rows: 10x-weight rows " +
       "dominate the winners, and the salt reshuffles membership") {
    import spark.implicits._
    // one stratum, 200 light rows (w=1) and 200 heavy rows (w=10)
    val rows = ((0L until 200L).map(i => (i, "s", 1L)) ++
                (200L until 400L).map(i => (i, "s", 10L)))
      .toDF("id", "st", "w")
    val win = QualityFilters.weightedPrioritySample(
      rows, "st", "id", "w", k = 50)
    val heavy = win.filter(col("id") >= 200L).count()
    // E[heavy share] ≈ 10/11; even a loose bound rules out uniform draw
    assert(heavy >= 35, s"expected heavy-row dominance, got $heavy/50")
    val other = QualityFilters.weightedPrioritySample(
      rows, "st", "id", "w", k = 50, salt = "other")
    val a = win.select("id").collect().map(_.getLong(0)).toSet
    val b = other.select("id").collect().map(_.getLong(0)).toSet
    assert(a != b, "a different salt must draw a different sample")
  }

  test("perplexityDomainWeights: the calmest domain keeps full " +
       "multiplier, surprising domains decay, and ppm weights conserve " +
       "mass") {
    import spark.implicits._
    // three domains: equal token mass, char-LM-scaled ppl 2.0/2.5/3.0
    val scored = Seq(
      ("a", 2.0d, 50L), ("a", 2.0d, 50L),
      ("b", 2.5d, 50L), ("b", 2.5d, 50L),
      ("c", 3.0d, 50L), ("c", 3.0d, 50L)
    ).toDF("source", "ppl", "n_grams")
    val w = QualityFilters.perplexityDomainWeights(
      scored, "source", "ppl", "n_grams", etaE2 = 100)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4),
                 r.getLong(5)))
    val byD = w.map(x => x._1 -> x).toMap
    assert(byD("a")._3 == 1000000L, s"min-ppl domain keeps e^0: $w")
    // u decays monotonically with excess ppl and is exactly
    // e^(-η·excess) in ppm
    assert(byD("b")._3 ==
             math.floor(math.exp(-0.5) * 1e6 + 0.5).toLong)
    assert(byD("c")._3 ==
             math.floor(math.exp(-1.0) * 1e6 + 0.5).toLong)
    assert(byD("a")._4 > byD("b")._4 && byD("b")._4 > byD("c")._4)
    val mass = w.map(_._4).sum
    assert(mass >= 1000000L - w.length && mass <= 1000000L,
           s"floor-division ppm weights must conserve mass: $mass")
  }
}
