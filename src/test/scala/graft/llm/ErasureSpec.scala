package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Estate-wide right-to-be-forgotten ([[Erasure]]): the one-sweep erase
  * across all eight persisted families, the survivor audit's
  * non-tautology (a family the sweep misses FIRES), the fingerprint
  * min-owner rebuild gap, KMV reduced-k validity, and the positional
  * family's exact erased ≡ rebuilt equivalence.
  */
class ErasureSpec extends SparkSpec {

  /** 24 docs; doc 0 and doc 31 share a text (the min-owner corner:
    * erasing 0 drops the shared fp row even though 31 survives).
    */
  private def docs: DataFrame = {
    import spark.implicits._
    val base = (0 until 23).map { i =>
      (i.toLong,
       s"estate doc $i speaks of matter ${i % 5} with marker " +
         s"ax$i bx$i cx$i dx$i ex$i fx$i gx$i")
    }
    (base :+ (31L, base(0)._2)).toDF("doc_id", "text")
  }

  private def emb: DataFrame = {
    import spark.implicits._
    (0 until 24).map { i =>
      (i.toLong,
       Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def events: DataFrame = {
    import spark.implicits._
    (for (day <- 0 until 3; u <- 0 until 30) yield
      (java.sql.Timestamp.valueOf(s"2024-01-0${day + 1} 12:00:00"),
       u.toLong)).toDF("ts", "user_id")
  }

  // erase doc/vec ids ≡ 0 mod 5; users ≡ 0 mod 5
  private def eraseDocs =
    docs.filter(col("doc_id") % 5 === 0).select(col("doc_id").as("corpus_id"))
  private def eraseVecs =
    emb.filter(col("vec_id") % 5 === 0).select(col("vec_id").as("corpus_id"))
  private def eraseHs =
    events.select("user_id").distinct().filter(col("user_id") % 5 === 0)
      .select(Erasure.kmvUserHash(col("user_id")).as("h"))

  private def buildEstate(tag: String): Erasure.EstateNames = {
    val nm = Erasure.EstateNames(
      s"est_spec_fp_$tag", s"est_spec_mh_$tag", s"est_spec_bm_$tag",
      s"est_spec_pos_$tag", s"est_spec_lsh_$tag", s"est_spec_ivf_$tag",
      s"est_spec_pq_$tag", s"est_spec_kmv_$tag")
    IndexStore.saveFingerprintIndex(
      Dedup.fingerprintIndex(docs, "doc_id", "text"), nm.fingerprint)
    IndexStore.saveMinhashIndex(
      Dedup.minhashIndexPortable(docs, "doc_id", "text",
                                 k = 5, numHashes = 16, bands = 4,
                                 maxBucket = 100), nm.minhash)
    IndexStore.saveBm25Index(
      Relevance.bm25Index(docs, "doc_id", "text"), nm.bm25)
    IndexStore.savePositionalIndex(
      Relevance.positionalIndex(docs, "doc_id", "text"), nm.positional)
    IndexStore.saveLshIndex(
      Similarity.lshIndex(emb, dim = 8, nBits = 4), nm.lsh)
    IndexStore.saveIvfIndex(
      Similarity.ivfIndex(emb, nCells = 2, seed = 7L), nm.ivf)
    IndexStore.savePqIndex(
      Similarity.pqIndex(emb, nSub = 2, nCodes = 2, seed = 7L), nm.pq)
    IndexStore.savePlainArtifact(Erasure.kmvDailySketch(events, k = 8),
                                 nm.kmv)
    nm
  }

  private def dropEstate(nm: Erasure.EstateNames): Unit =
    Seq(nm.fingerprint, nm.minhash, nm.bm25, nm.positional, nm.lsh,
        nm.ivf, nm.pq, nm.kmv).foreach(IndexStore.drop(spark, _))

  /** Per-family survivor counts against the given erase sets, measured
    * from the RELOADED current versions — the q283 audit column.
    */
  private def survivors(nm: Erasure.EstateNames): Map[String, Long] = {
    val dAsDoc = eraseDocs.select(col("corpus_id").as("doc_id"))
    Map(
      "fingerprint" -> IndexStore.loadFingerprintIndex(spark, nm.fingerprint)
        .join(eraseDocs, Seq("corpus_id"), "left_semi").count(),
      "minhash_buckets" -> IndexStore.loadMinhashIndex(spark, nm.minhash)
        .buckets.join(eraseDocs, Seq("corpus_id"), "left_semi").count(),
      "minhash_shingles" -> IndexStore.loadMinhashIndex(spark, nm.minhash)
        .shingles.join(eraseDocs, Seq("corpus_id"), "left_semi").count(),
      "bm25_postings" -> IndexStore.loadBm25Index(spark, nm.bm25)
        .postings.join(dAsDoc, Seq("doc_id"), "left_semi").count(),
      "positional" -> IndexStore.loadPositionalIndex(spark, nm.positional)
        .join(dAsDoc, Seq("doc_id"), "left_semi").count(),
      "lsh" -> IndexStore.loadLshIndex(spark, nm.lsh)
        .join(eraseVecs, Seq("corpus_id"), "left_semi").count(),
      "ivf" -> IndexStore.loadIvfIndex(spark, nm.ivf)
        .assigned.join(eraseVecs, Seq("corpus_id"), "left_semi").count(),
      "pq" -> IndexStore.loadPqIndex(spark, nm.pq)
        .codes.join(eraseVecs, Seq("corpus_id"), "left_semi").count(),
      "kmv_daily" -> IndexStore.loadPlainArtifact(spark, nm.kmv)
        .join(eraseHs, Seq("h"), "left_semi").count())
  }

  test("eraseEstate scrubs every family; survivors audit reads zero " +
       "from the published next versions") {
    val nm = buildEstate("full")
    try {
      val before = survivors(nm)
      assert(before.values.forall(_ > 0),
             s"fixture must plant erased rows in every family: $before")
      Erasure.eraseEstate(spark, nm, eraseDocs, eraseVecs, eraseHs)
      val after = survivors(nm)
      assert(after.values.forall(_ == 0L),
             s"post-sweep survivors must all be zero: $after")
      // and surviving subjects keep their rows (erase-proportional,
      // not a wipe): doc 1's postings survive
      assert(IndexStore.loadBm25Index(spark, nm.bm25).postings
               .filter(col("doc_id") === 1L).count() > 0)
    } finally dropEstate(nm)
  }

  test("re-running the sweep is idempotent: a second eraseEstate " +
       "changes no family's row count (the crash-recovery contract — " +
       "a job that died mid-sweep just runs again)") {
    val nm = buildEstate("idem")
    try {
      Erasure.eraseEstate(spark, nm, eraseDocs, eraseVecs, eraseHs)
      def counts(): Seq[Long] = Seq(
        IndexStore.loadFingerprintIndex(spark, nm.fingerprint).count(),
        IndexStore.loadMinhashIndex(spark, nm.minhash).buckets.count(),
        IndexStore.loadMinhashIndex(spark, nm.minhash).shingles.count(),
        IndexStore.loadBm25Index(spark, nm.bm25).postings.count(),
        IndexStore.loadPositionalIndex(spark, nm.positional).count(),
        IndexStore.loadLshIndex(spark, nm.lsh).count(),
        IndexStore.loadIvfIndex(spark, nm.ivf).assigned.count(),
        IndexStore.loadPqIndex(spark, nm.pq).codes.count(),
        IndexStore.loadPlainArtifact(spark, nm.kmv).count())
      val first = counts()
      Erasure.eraseEstate(spark, nm, eraseDocs, eraseVecs, eraseHs)
      assert(counts() == first,
             "the second sweep must be a row-for-row no-op")
      // and the BM25 sufficient statistics must not double-subtract
      val stats = IndexStore.loadBm25Index(spark, nm.bm25).stats.head()
      val netDocs = docs.filter(col("doc_id") % 5 =!= 0).count()
      assert(stats.getLong(0) == netDocs,
             s"n_docs must equal the net corpus after re-running: " +
               s"${stats.getLong(0)} vs $netDocs")
    } finally dropEstate(nm)
  }

  test("a family the sweep misses FIRES the survivor audit " +
       "(non-tautology: the check is measured, not structural)") {
    val nm = buildEstate("miss")
    try {
      // partial sweep: every family EXCEPT positional
      IndexStore.saveFingerprintIndex(
        Dedup.eraseFromFingerprintIndex(
          IndexStore.loadFingerprintIndex(spark, nm.fingerprint),
          eraseDocs), nm.fingerprint)
      IndexStore.saveMinhashIndex(
        Dedup.eraseFromMinhashIndex(
          IndexStore.loadMinhashIndex(spark, nm.minhash), eraseDocs),
        nm.minhash)
      IndexStore.saveBm25Index(
        Relevance.deleteFromBm25Index(
          IndexStore.loadBm25Index(spark, nm.bm25), eraseDocs), nm.bm25)
      IndexStore.saveLshIndex(
        Similarity.eraseFromLshIndex(
          IndexStore.loadLshIndex(spark, nm.lsh), eraseVecs), nm.lsh)
      IndexStore.saveIvfIndex(
        Similarity.eraseFromIvfIndex(
          IndexStore.loadIvfIndex(spark, nm.ivf), eraseVecs), nm.ivf)
      IndexStore.savePqIndex(
        Similarity.eraseFromPqIndex(
          IndexStore.loadPqIndex(spark, nm.pq), eraseVecs), nm.pq)
      IndexStore.savePlainArtifact(
        Erasure.eraseFromKmvSketch(
          IndexStore.loadPlainArtifact(spark, nm.kmv), eraseHs), nm.kmv)
      val after = survivors(nm)
      assert(after("positional") > 0L,
             "the missed family must show nonzero survivors")
      assert(after.filterNot(_._1 == "positional").values.forall(_ == 0L))
    } finally dropEstate(nm)
  }

  test("erasure horizon (q285's loophole made visible): after the " +
       "erasure publish the PRE-ERASURE version is still retained and " +
       "still holds subject rows; the next roll's GC closes it") {
    val n = "est_spec_hz"
    try {
      IndexStore.saveMinhashIndex(
        Dedup.minhashIndexPortable(docs, "doc_id", "text",
                                   k = 5, numHashes = 16, bands = 4,
                                   maxBucket = 100), n)
      IndexStore.saveMinhashIndex(
        Dedup.eraseFromMinhashIndex(
          IndexStore.loadMinhashIndex(spark, n), eraseDocs), n)
      val tbl = s"${n}_buckets"
      def survivorsByVersion(): Seq[(Int, Long)] =
        IndexStore.retainedVersionNumbers(spark, tbl).map { v =>
          v -> IndexStore.loadTableVersion(spark, tbl, v)
            .join(eraseDocs, Seq("corpus_id"), "left_semi").count()
        }
      val afterErase = survivorsByVersion()
      assert(afterErase.size == 2, s"keepVersions=2: $afterErase")
      assert(afterErase.head._2 > 0,
             "the RETAINED pre-erasure version must still hold " +
               s"subject rows — that is the horizon: $afterErase")
      assert(afterErase.last._2 == 0, s"current is clean: $afterErase")
      // one roll later the pre-erasure version is GC'd
      val delta = docs.filter(col("doc_id") === 1L)
        .select((col("doc_id") + 500L).as("doc_id"),
                concat(col("text"), lit(" hz")).as("text"))
      IndexStore.saveMinhashIndex(
        Dedup.mergeMinhashIndex(
          IndexStore.loadMinhashIndex(spark, n), delta, "doc_id",
          "text", k = 5, numHashes = 16, bands = 4, maxBucket = 100),
        n)
      val afterRoll = survivorsByVersion()
      assert(afterRoll.size == 2 &&
               afterRoll.forall(_._2 == 0L),
             s"post-roll estate must be survivor-free everywhere: " +
               s"$afterRoll")
      assert(!afterRoll.map(_._1).contains(afterErase.head._1),
             "the pre-erasure version number must be GONE")
    } finally IndexStore.drop(spark, n)
  }

  test("estate-wide horizon (q286's composition): after the erasure " +
       "sweep plus one compaction roll per family, EVERY retained " +
       "version of every subject-keyed table in all eight families is " +
       "survivor-free and retention is exactly keepVersions") {
    val nm = buildEstate("hzall")
    try {
      Erasure.eraseEstate(spark, nm, eraseDocs, eraseVecs, eraseHs)
      // horizon roll: content-identical re-publish per family — GC
      // drops the pre-erasure build everywhere
      IndexStore.saveFingerprintIndex(
        IndexStore.loadFingerprintIndex(spark, nm.fingerprint),
        nm.fingerprint)
      IndexStore.saveMinhashIndex(
        IndexStore.loadMinhashIndex(spark, nm.minhash), nm.minhash)
      IndexStore.saveBm25Index(
        IndexStore.loadBm25Index(spark, nm.bm25), nm.bm25)
      IndexStore.savePositionalIndex(
        IndexStore.loadPositionalIndex(spark, nm.positional),
        nm.positional)
      IndexStore.saveLshIndex(
        IndexStore.loadLshIndex(spark, nm.lsh), nm.lsh)
      IndexStore.saveIvfIndex(
        IndexStore.loadIvfIndex(spark, nm.ivf), nm.ivf)
      IndexStore.savePqIndex(
        IndexStore.loadPqIndex(spark, nm.pq), nm.pq)
      IndexStore.savePlainArtifact(
        IndexStore.loadPlainArtifact(spark, nm.kmv), nm.kmv)
      val dAsDoc = eraseDocs.select(col("corpus_id").as("doc_id"))
      val surfaces: Seq[(String, DataFrame, String)] = Seq(
        (nm.fingerprint, eraseDocs, "corpus_id"),
        (s"${nm.minhash}_buckets", eraseDocs, "corpus_id"),
        (s"${nm.minhash}_shingles", eraseDocs, "corpus_id"),
        (s"${nm.bm25}_postings", dAsDoc, "doc_id"),
        (s"${nm.positional}_positions", dAsDoc, "doc_id"),
        (nm.lsh, eraseVecs, "corpus_id"),
        (s"${nm.ivf}_assigned", eraseVecs, "corpus_id"),
        (s"${nm.pq}_codes", eraseVecs, "corpus_id"),
        (nm.kmv, eraseHs, "h"))
      surfaces.foreach { case (tbl, keys, kc) =>
        val vs = IndexStore.retainedVersionNumbers(spark, tbl)
        assert(vs.size == 2, s"$tbl must retain exactly 2 versions: $vs")
        vs.foreach { v =>
          val n = IndexStore.loadTableVersion(spark, tbl, v)
            .join(keys, Seq(kc), "left_semi").count()
          assert(n == 0L,
                 s"$tbl v$v holds $n subject rows past the horizon")
        }
      }
    } finally dropEstate(nm)
  }

  test("fingerprint min-owner corner: erased index drops the shared fp " +
       "row; net rebuild re-keys it under the survivor (measured gap)") {
    val erased = Dedup.eraseFromFingerprintIndex(
      Dedup.fingerprintIndex(docs, "doc_id", "text"), eraseDocs)
    val rebuilt = Dedup.fingerprintIndex(
      docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
    // doc 0 (erased) owns the fp it shares with doc 31: gone from the
    // erased index, present in the rebuild keyed to 31
    assert(erased.filter(col("corpus_id") === 31L).count() == 0L)
    assert(rebuilt.filter(col("corpus_id") === 31L).count() == 1L)
    val gap = rebuilt.count() - erased.count()
    assert(gap == 1L, s"exactly the one shared-text fp resurrects: $gap")
    // conservative direction: every erased-index row is in the rebuild
    assert(erased.join(rebuilt, Seq("fp", "corpus_id"), "left_anti")
             .count() == 0L)
  }

  test("positional erase ≡ net-corpus rebuild exactly") {
    // collected-set compare (exceptAll over two plans sharing the same
    // base lineage misbinds the rewritten attribute ids)
    def rows(df: DataFrame): Set[String] = df.select(
        concat_ws("|", col("token"), col("doc_id").cast("string"),
                  array_join(transform(col("positions"),
                                       p => p.cast("string")), ",")))
      .collect().map(_.getString(0)).toSet
    val erased = rows(Relevance.eraseFromPositionalIndex(
      Relevance.positionalIndex(docs, "doc_id", "text"), eraseDocs))
    val rebuilt = rows(Relevance.positionalIndex(
      docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text"))
    assert(erased == rebuilt)
    assert(erased.nonEmpty)
  }

  test("KMV erased sketch = per-day prefix of the net rebuild " +
       "(reduced effective k — precision pays, never validity)") {
    val full = Erasure.kmvDailySketch(events, k = 8)
    val erased = Erasure.eraseFromKmvSketch(full, eraseHs)
    val rebuilt = Erasure.kmvDailySketch(
      events.filter(col("user_id") % 5 =!= 0), k = 8)
    // every surviving row is in the rebuild (subset) …
    assert(erased.join(rebuilt, Seq("day", "h"), "left_anti").count() == 0)
    // … and is exactly the rebuild's SMALLEST hashes per day: no
    // rebuild hash below the erased sketch's max is missing
    val mx = erased.groupBy("day").agg(max("h").as("mx"), count(lit(1)).as("n"))
    val prefix = rebuilt.join(mx, Seq("day"))
      .filter(col("h") <= col("mx"))
      .groupBy("day").agg(count(lit(1)).as("np"))
    val bad = mx.join(prefix, Seq("day"))
      .filter(col("np") =!= col("n")).count()
    assert(bad == 0L, "erased rows must be the per-day bottom prefix")
    // the fixture really exercises replacement: rebuild has more rows
    assert(rebuilt.count() > erased.count())
  }

  test("full-estate attestation (q289): one answer over all 28 " +
       "surfaces — 18 index version-surfaces plus the four stateful " +
       "streaming families' checkpoints and erased sinks — with " +
       "subject survivors AND past-retention rows zero everywhere") {
    assumeData(sf0001)
    val rows = graft.operators.LlmQueries
      .queries("q289_full_estate_horizon")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4)))
    assert(rows.length == 41, s"41 attestation rows expected: " +
      s"${rows.length}")
    // the headline: nothing subject-keyed and nothing past retention
    // survives ANYWHERE a reader can still resolve
    val dirty = rows.filter(r => r._4 > 0 || r._5 > 0)
    assert(dirty.isEmpty, s"dirty surfaces: ${dirty.toSeq}")
    // every family contributes: all four streaming state surfaces are
    // PRESENT and non-empty (an empty checkpoint readout would make
    // the zero-survivor claim vacuous) …
    Seq("stream_dedup_state", "stream_fmgws_state",
        "stream_tws_state_session", "stream_tws_state_timer",
        "stream_join_left", "stream_join_right").foreach { a =>
      val r = rows.find(_._1 == a)
      assert(r.exists(_._3 > 0), s"$a must audit a non-empty state: $r")
    }
    // … and so are the erased sinks and every index version row
    Seq("stream_dedup_sink", "stream_fmgws_sink", "stream_tws_sink",
        "stream_join_sink").foreach { a =>
      assert(rows.exists(r => r._1 == a && r._3 > 0), s"$a missing")
    }
    assert(rows.count(_._2 > 0) == 18,
           "18 index version-surfaces expected")
    val estate = rows.find(_._1 == "ESTATE").get
    assert(estate._3 == 28L && estate._4 == 0L && estate._5 == 0L)
    // the sessions twins agree at the surface level: FMGWS and TWS
    // state/sink counts are identical on the same staged feed
    def n(a: String) = rows.find(_._1 == a).get._3
    assert(n("stream_fmgws_state") == n("stream_tws_state_session"))
    assert(n("stream_fmgws_sink") == n("stream_tws_sink"))
  }

  test("round-17 composition (q292): the attestation covers the TWS " +
       "funnel and in-stream near-dedup families too — erase-then-" +
       "attest drives both new checkpoints and their erased sinks, " +
       "zeros everywhere, 34 surfaces, the two new RETENTION rows") {
    assumeData(sf0001)
    val rows = graft.operators.LlmQueries
      .queries("q292_estate_all_families")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4)))
    assert(rows.length == 49, s"49 attestation rows expected: " +
      s"${rows.length}")
    // the headline again: nothing subject-keyed, nothing past its
    // surface's own retention policy, anywhere — including the two
    // families round 16 added and round 16's attestation missed
    val dirty = rows.filter(r => r._4 > 0 || r._5 > 0)
    assert(dirty.isEmpty, s"dirty surfaces: ${dirty.toSeq}")
    def row(a: String) = rows.find(_._1 == a).get
    // funnel family: erased sink + BOTH named state variables, each
    // non-empty (tranche-2 sessions must still be open or the
    // zero-survivor claim is vacuous)
    assert(row("stream_funnel_sink")._3 > 0, "erased funnel sink empty")
    assert(row("stream_funnel_state")._3 > 0 &&
             row("stream_funnel_state")._3 ==
               row("stream_funnel_state_timer")._3,
           "funnel/timer variables must hold the open tranche-2 users")
    // near-dedup family: content-derived list state non-empty (8
    // banded entries per live doc), bucket timers bounded by entries
    val ent = row("stream_nndup_state")._3
    val tmr = row("stream_nndup_state_timer")._3
    assert(ent > 0 && ent % 8 == 0,
           s"live tranche-2 docs buffer once per band: $ent")
    assert(tmr > 0 && tmr <= ent, s"one timer per live bucket: $tmr")
    // the funnel sink holds ONLY the tranche-1 sessions: subjects
    // (erased) and tranche-2 (still open) are both absent
    val users = graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(row("stream_funnel_sink")._3 < users,
           "erase + open sessions must leave a strict subset landed")
    assert(row("RETENTION_stream_funnel")._3 == 3L &&
             row("RETENTION_stream_nndup")._3 == 3L,
           "new families' RETENTION rows must audit 3 surfaces each")
    val estate = rows.find(_._1 == "ESTATE").get
    assert(estate._3 == 34L && estate._4 == 0L && estate._5 == 0L)
  }
}
