package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("token counts: whitespace and BPE-ish") {
    import spark.implicits._
    val df = Seq("hello world", "it's a test, really!", "one").toDF("t")
    val out = df.select(
      TextAnalysis.wsTokenCount(col("t")).as("ws"),
      TextAnalysis.bpeishTokenCount(col("t")).as("bpe")).collect()
    assert(out(0).getInt(0) == 2)
    assert(out(2).getInt(0) == 1)
    // it | 's | a | test | , | really | !  → 7
    assert(out(1).get(1).toString.toInt == 7)
  }

  test("quality score is in [0,1]; prose beats punctuation soup") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the hills " * 3,
      "@@@ ### !!! *** %%% ^^^ &&& $$$").toDF("t")
    val q = df.select(TextAnalysis.qualityScore(col("t")).as("q"))
      .collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1) + 0.3)
  }

  test("langId votes correctly on clear-cut sentences, und on no hits") {
    import spark.implicits._
    val df = Seq(
      "the cat is in the house and it was good",   // en
      "le chat est dans la maison pour les amis",  // fr
      "el gato es que los perros una casa",        // es
      "der hund ist nicht ein tier und das",       // de
      "zzz qqq xxx").toDF("t")
    val out = df.select(TextAnalysis.langId(col("t")).as("l"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "fr", "es", "de", "und"))
  }

  test("langIdNgram: trigram profiles vote correctly; und on no overlap") {
    import spark.implicits._
    val df = Seq(
      "the thing and another that went for nothing",     // en trigrams
      "les entreprises pour une question des jours",     // fr
      "los cuentos que una parte con cierto adorno",     // es
      "ich durchschaue die ordnung der entscheidung",    // de
      "zzzz qqqq xxxx").toDF("t")
    val out = df.select(TextAnalysis.langIdNgram(col("t")).as("l"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "fr", "es", "de", "und"))
  }

  test("fingerprint: whitespace/case-normalized equality, md5 format") {
    import spark.implicits._
    val df = Seq("Hello   World", "hello world ", "different").toDF("t")
    val fp = df.select(TextAnalysis.fingerprint(col("t")).as("f"))
      .collect().map(_.getString(0))
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
    assert(fp(0).matches("[0-9a-f]{32}"))
  }

  test("rollingHash: deterministic, order-sensitive, empty-safe") {
    import spark.implicits._
    val df = Seq("abc", "acb", "abc", "").toDF("t")
    val h = df.select(TextAnalysis.rollingHash(col("t")).as("h"))
      .collect().map(_.getLong(0))
    assert(h(0) == h(2))
    assert(h(0) != h(1))
    assert(h(3) == 0L)
    // closed form for "abc": ((97*31+98)*31+99) mod 1e9+7
    assert(h(0) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("approx_count_distinct vocabulary within 5% of exact (sketch path)") {
    import graft.sources.Tables
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(lower(trim(col("text"))), "\\W+")).as("t"))
      .filter(length(col("t")) > 0)
    val row = toks.agg(
      countDistinct("t").as("exact"),
      approx_count_distinct("t", 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
           s"approx $approx vs exact $exact")
  }

  test("profile attaches all analysis columns") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox")).toDF("id", "text")
    val out = TextAnalysis.profile(df, "text")
    val cols = out.columns.toSet
    assert(Set("ws_tokens", "bpeish_tokens", "punct_ratio", "stopword_ratio",
               "quality", "lang_pred", "fingerprint").subsetOf(cols))
    assert(out.count() == 1)
  }

  test("mixed-language detection (q119): per-chunk votes, majority share, " +
       "alphabetical majority tie-break") {
    import spark.implicits._
    val dir = tmpDir("mixedlang")
    def rep(s: String, n: Int) = Seq.fill(n)(s).mkString(" ")
    // doc 1: 32 en-marker tokens + 32 de-marker tokens → 2 chunks, one
    //        voting en and one de → mixed, tie → 'de' (alphabetical)
    // doc 2: 40 en tokens → 2 chunks (32 + 8), both en → not mixed
    // doc 3: 10 gibberish tokens → 1 'und' chunk
    val docs = Seq(
      (1L, rep("the", 32) + " " + rep("der", 32)),
      (2L, rep("the", 40)),
      (3L, rep("zzz", 10)))
      .toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("x"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.LlmQueries
      .queries("q119_mixed_language")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
         r.getBoolean(5))).toMap
    assert(out(1L) == ((2L, 2L, "de", 500000L, true)), s"doc1: $out")
    assert(out(2L) == ((2L, 1L, "en", 1000000L, false)), s"doc2: $out")
    assert(out(3L) == ((1L, 1L, "und", 1000000L, false)), s"doc3: $out")
  }

  /** Pure-Scala winnowing reference: same md5-prefix hash, rightmost-min
    * per window, distinct (1-based pos, fp) picks.
    */
  private def refWinnow(s: String, k: Int, w: Int): Set[(Int, Long)] = {
    def h60(g: String): Long = {
      val out = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      var v = 0L
      for (i <- 0 until 8) v = (v << 8) | (out(i) & 0xFFL)
      v >>> 4
    }
    if (s.length < k + w - 1) return Set.empty
    val hs = (0 to s.length - k).map(i => h60(s.substring(i, i + k)))
    (0 to hs.length - w).map { i =>
      val win = hs.slice(i, i + w)
      val m = win.min
      (i + win.lastIndexOf(m) + 1, m)
    }.toSet
  }

  test("winnowing picks match the reference algorithm exactly") {
    import spark.implicits._
    // already-normalized strings, incl. heavy repetition (hash ties) and
    // sub-window shorts that must yield nothing
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "abababababababababababab", // max tie stress
      "aaaaaaaaaaaaaaaaaaaaa",    // single repeated gram
      "mixed 1234 with numbers and text strings 5678 interleaved ok",
      "short doc",                // < k+w-1 chars → no fingerprints
      "exactly13char"             // == w+k-1 → exactly one window
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("hs", TextAnalysis.gramHashes(col("text"), k = 5))
      .select(col("doc_id"),
              TextAnalysis.winnowPicks(col("hs"), w = 9).as("picks"))
    val got = df.collect().map { r =>
      r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getInt(0), p.getLong(1))).toSet
    }.toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refWinnow(t, 5, 9),
             s"doc $i mismatch vs reference: '$t'")
    }
    assert(got(4L).isEmpty)
    assert(got(5L).size == 1)
  }

  test("winnowing guarantee: shared substrings ≥ w+k-1 chars share a " +
       "fingerprint; density stays ~2/(w+1)") {
    import spark.implicits._
    val shared = "common plagiarized fragment that both docs contain"
    val a = s"first document preamble text then $shared and an ending"
    val b = s"totally different opening words here $shared closing words"
    val c = "unrelated content with no overlap whatsoever present here ok"
    val rows = Seq((1L, a), (2L, b), (3L, c))
      .toDF("doc_id", "text")
      .withColumn("hs", TextAnalysis.gramHashes(col("text"), k = 5))
      .select(col("doc_id"),
              explode(TextAnalysis.winnowPicks(col("hs"), w = 9)).as("p"))
      .select(col("doc_id"), col("p.fp").as("fp"))
    val fps = rows.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
           "docs sharing a 50-char substring must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty)
    // density: expected 2/(w+1) = 0.2 of windows; allow a wide band
    val nWindows = a.length - 5 + 1 - 9 + 1
    assert(fps(1L).size <= nWindows / 2 && fps(1L).size >= nWindows / 10,
           s"density off: ${fps(1L).size} picks over $nWindows windows")
  }

  test("cdcChunks tile the normalized text exactly (contiguous, " +
       "disjoint, covering) and re-key only edited chunks") {
    import spark.implicits._
    val text = (1 to 60).map(i => s"word$i token$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.normalizeText(col("text")).as("n"))
      .withColumn("hs", TextAnalysis.gramHashes(col("n"), k = 8))
      .select(col("n"), explode(
        TextAnalysis.cdcChunks(col("n"), col("hs"), k = 8, modulus = 64))
        .as("c"))
    val rows = df.select(col("n"), col("c.chunk_idx"), col("c.start"),
                         col("c.chunk_len"), col("c.chunk_md5"))
      .collect().sortBy(_.getInt(1))
    val norm = rows.head.getString(0)
    assert(rows.length > 3, "fixture must produce several chunks")
    // contiguous + covering: starts chain exactly, lengths sum to |norm|
    var expectStart = 1
    rows.foreach { r =>
      assert(r.getInt(2) == expectStart, s"gap/overlap at chunk $r")
      expectStart += r.getInt(3)
    }
    assert(expectStart == norm.length + 1)
    // fingerprints really are the chunk substrings' md5s
    rows.foreach { r =>
      val sub = norm.substring(r.getInt(2) - 1,
                               r.getInt(2) - 1 + r.getInt(3))
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(4) == md)
    }
  }

  test("cdc shift-resilience: a prefix edit re-keys only the chunks up " +
       "to the first re-synced boundary, while fixed-stride chunking " +
       "loses every match") {
    import spark.implicits._
    val text = (1 to 80).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    def chunkFps(t: String): Set[String] =
      Seq((1L, t)).toDF("doc_id", "text")
        .select(Dedup.normalizeText(col("text")).as("n"))
        .withColumn("hs", TextAnalysis.gramHashes(col("n"), k = 8))
        .select(explode(TextAnalysis.cdcChunks(col("n"), col("hs"),
                                               k = 8, modulus = 64))
                  .as("c"))
        .select("c.chunk_md5").collect().map(_.getString(0)).toSet
    def fixedFps(t: String): Set[String] = {
      val n = t.toLowerCase.trim.replaceAll("\\s+", " ")
      n.grouped(64).map { s =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.toSet
    }
    val edited = "intro insertion shim " + text
    val cdcA = chunkFps(text); val cdcB = chunkFps(edited)
    val cdcShared = (cdcA & cdcB).size
    val fixedShared = (fixedFps(text) & fixedFps(edited)).size
    assert(cdcA.size > 5, "fixture must produce several chunks")
    // CDC loses at most the chunks overlapping the edit + the one it
    // re-syncs into; everything after is bit-identical
    assert(cdcShared >= cdcA.size - 2,
           s"cdc must re-sync: shared $cdcShared of ${cdcA.size}")
    // the 21-char shift misaligns EVERY fixed window
    assert(fixedShared == 0, s"fixed-stride should lose all matches")
    assert(cdcShared > fixedShared)
  }

  test("blocklistHits counts spam markers over word tokens, case-folded") {
    import spark.implicits._
    val df = Seq(
      (1L, "Subscribe now to win the LOTTERY jackpot"),
      (2L, "a perfectly ordinary sentence about mathematics"),
      (3L, "promo PROMO Promo discount")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.wordTokens(col("text")).as("t"))
      .select(col("doc_id"), TextAnalysis.blocklistHits(col("t")).as("hits"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    // doc 1: subscribe + lottery + jackpot (win is not on the list)
    assert(df.toSeq == Seq((1L, 3), (2L, 0), (3L, 4)))
  }

  test("scriptAnomalyFrames flags mojibake, control chars, and mixed scripts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain english text"),
      (2L, "broken \uFFFD twice \uFFFD here"),
      (3L, "control\u0001chars\u001Fhere"),
      (4L, "latin and \u043A\u0438\u0440\u0438\u043B\u043B\u0438\u0446\u0430 mixed"),
      (5L, "\u4E2D\u6587\u6587\u672C only"),
      (6L, "ascii with \u4E2D\u6587 inside")
    ).toDF("doc_id", "text")
    val out = graft.operators.LlmQueries.scriptAnomalyFrames(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
                 r.getBoolean(6)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, true, false, false, false),
      (2L, 2L, 0L, true, false, false, false),
      (3L, 0L, 2L, true, false, false, false),
      (4L, 0L, 0L, true, true, false, true),
      (5L, 0L, 0L, true, false, true, true),
      (6L, 0L, 0L, true, false, true, true)))
  }

  test("deflateRatios orders boilerplate < prose < noise and is " +
       "deterministic across partitionings; empty text is safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = Seq(
      (1L, Seq.fill(80)("the same boilerplate line repeats forever")
             .mkString(" ")),
      (2L, "the quick brown fox jumps over the lazy dog and then " +
           "wanders through a long meadow describing many distinct " +
           "things it sees along the winding path toward the river " +
           "bank where several other animals gather in the evening"),
      (3L, Seq.fill(400)(rnd.nextPrintableChar()).mkString),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.deflateRatios(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) < out(2L) && out(2L) < out(3L),
           s"ratio must order boilerplate < prose < noise: $out")
    assert(out(4L) >= 0L, "empty text must not divide by zero")
    val again = TextAnalysis
      .deflateRatios(docs.repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == out, "row-local compression must not depend on " +
                         "partitioning")
  }

  test("langVotesOfToks factoring: langIdOfVotes / langIdMarginOfVotes " +
       "over the shared named vote vector equal the one-shot forms") {
    import spark.implicits._
    val df = Seq(
      "the cat and the dog and the house",
      "der hund the cat und das la maison",
      "le la est the and is",
      "el la de que los it was",
      "zzz qqq", "", "   ").toDF("t")
    val fused = df
      .withColumn("__toks", TextAnalysis.langTokens(col("t")))
      .withColumn("__v", TextAnalysis.langVotesOfToks(col("__toks")))
      .select(TextAnalysis.langIdOfVotes(col("__v")).as("l"),
              TextAnalysis.langIdMarginOfVotes(col("__v")).as("m"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val oneShot = df
      .select(TextAnalysis.langId(col("t")).as("l"),
              TextAnalysis.langIdMargin(col("t")).as("m"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(fused == oneShot, s"fused $fused vs one-shot $oneShot")
  }

  test("langIdMargin: counts the top-1 vs top-2 vote gap, 0 on ties " +
       "and no-hit rows, and q242's calibration buckets reconcile") {
    import spark.implicits._
    val df = Seq(
      "the cat and the dog and the house",     // en 5 hits (the ×3 +
                                               //   and ×2, per token),
                                               //   others 0 → margin 5
      "der hund the cat und das la maison",    // de 3 (der/und/das) vs
                                               //   en 1, fr 1 → 3-1=2
      "le la est the and is",                  // fr 3 vs en 3 → tie, 0
      "zzz qqq").toDF("t")                     // no hits → all 0 → 0
    val m = df.select(TextAnalysis.langIdMargin(col("t")).as("m"))
      .collect().map(_.getInt(0))
    assert(m.toSeq == Seq(5, 2, 0, 0), s"got ${m.toSeq}")
    // q242 on the corpus: ALL row sums its buckets exactly, and
    // nonzero-margin predictions beat the zero-margin bucket (the
    // abstain-cost the router reads off this table)
    val rows = graft.operators.LlmQueries
      .queries("q242_langid_calibration")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3)))
    val all = rows.find(_._1 == -1L).get
    val buckets = rows.filter(_._1 >= 0L)
    assert(buckets.map(_._2).sum == all._2 &&
             buckets.map(_._3).sum == all._3)
    assert(rows.forall(r => r._4 == r._3 * 1000000L / r._2))
    val zero = buckets.find(_._1 == 0L).get
    val nzN = buckets.filter(_._1 > 0L).map(_._2).sum
    val nzC = buckets.filter(_._1 > 0L).map(_._3).sum
    assert(nzC * 1000000L / nzN > zero._4,
           "confident predictions must beat the zero-margin bucket")
  }
}
