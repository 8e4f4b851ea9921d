package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}
import graft.sources.Tables

/** Scale probe (dev tool, not part of the driver contract): replicates the
  * driver's corpus N× with shifted ids inside the query and times the
  * scale-critical LLM operators, to measure how cost grows with corpus
  * size — the "would this hold at 100×?" experiment, run at local[32].
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
                               "graft-scaleprobe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    // SPARK_GRAFT_PROBE_ONLY=substr[,substr...] runs just the matching
    // measurements (dev loop: probe one operator without paying for the
    // whole sweep)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
    // a whole block (incl. its untimed setup — replication counts, index
    // builds) runs only when one of its measurement labels is selected
    def section(tags: String)(body: => Unit): Unit =
      if (only.forall(_.exists(tags.contains))) body
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(
        f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // Evaluate through the noop sink, NOT count(): count lets Catalyst
    // prune cardinality-preserving operators (incl. left joins against
    // key-grouped aggregates), timing a plan that skips the real work —
    // see the Bench scaladoc.
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def docsX(n: Int) = {
      val d = Tables.documents(spark, dir)
      (0 until n).map(i =>
        d.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
          .withColumn("text",
            if (i % 4 == 0) col("text") // every 4th replica = exact dup
            else concat(col("text"), lit(s" v$i")))
      ).reduce(_ union _)
    }
    def embX(n: Int) = {
      val e = Tables.embeddings(spark, dir)
      (0 until n).map(i =>
        e.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_ union _)
    }

    section("minhash_dedup minhash_port exact_dedup") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"minhash_dedup  n=$n ($rows)") {
          noop(Dedup.minhash(d, "doc_id", "text"))
        }
        time(s"minhash_port   n=$n ($rows)") {
          noop(Dedup.minhashPortable(d, "doc_id", "text"))
        }
        time(s"exact_dedup    n=$n ($rows)") {
          noop(Dedup.exact(d, "doc_id", "text"))
        }
      }
    }
    // In-stream near-dedup (round-16, q291's operator): full streamed
    // drive over the replicated corpus staged as 3 micro-batches.
    // Expectations at scale: state entries grow linearly with docs
    // inside the horizon (×bands), and since the round-17 min-fold the
    // LANDED volume is ≤1 best-match row per arriving doc per batch —
    // linear in docs, no longer quadratic in dup-cluster size (the
    // VERIFY work per bucket is still occupancy-bounded, which the
    // maxBucket cap clamps on the worst bucket). The probe prints sink
    // rows + buffered state entries next to wall time so the growth
    // attributes to emission volume, not per-row cost.
    section("instream_dedup") {
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n)
        val rows = d.count()
        val b = java.nio.file.Files
          .createTempDirectory(s"graft_probe_instream_$n").toString
        graft.streaming.EventStreams.stageMicroBatchFiles(
          d.select(col("doc_id"),
                   timestamp_seconds(lit(1700000000L) +
                     (col("doc_id") % 3) * 600L).as("ts"),
                   col("text")),
          col("doc_id") % 3, nBatches = 3, inDir = s"$b/in")
        time(s"instream_dedup n=$n ($rows)") {
          val stream = spark.readStream
            .schema("doc_id BIGINT, ts TIMESTAMP, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$b/in")
          val q = graft.streaming.EventStreams.inStreamNearDedupSink(
            stream, "doc_id", "text", "ts", s"$b/out", s"$b/ckpt")
          try q.processAllAvailable() finally q.stop()
        }
        val pairs = spark.read.parquet(s"$b/out").count()
        val state = spark.read.format("statestore")
          .option("path", s"$b/ckpt")
          .option("stateVarName", "entries").load().count()
        println(f"[probe] instream_dedup n=$n pairs=$pairs " +
          f"state_entries=$state")
      }
    }

    section("ann_brute ann_lsh ann_int8") {
    for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val rows = e.count()
        val q = Tables.embeddings(spark, dir).filter(col("vec_id") < 5)
        time(s"ann_brute      n=$n ($rows)") {
          noop(Similarity.bruteForceTopK(e, q, 10))
        }
        time(s"ann_lsh        n=$n ($rows)") {
          noop(Similarity.lshTopK(e, q, 10, dim = 64,
            nBits = 6 + (32 - Integer.numberOfLeadingZeros(n))))
        }
        time(s"ann_int8       n=$n ($rows)") {
          noop(Similarity.bruteForceTopKInt8(e, q, 10))
        }
      }
    }
    // Incremental dedup: the INDEX grows with the corpus (replicated N×),
    // the ingest batch stays fixed — the probe measures that per-batch
    // classification cost is driven by the batch, not the corpus. Two
    // index transports: in-memory (localCheckpoint, the in-session
    // shape) and DISK-LOADED via IndexStore (the daily-rotation steady
    // state: a fresh session reads yesterday's bucketed tables).
    section("inc_minhash inc_mh_save inc_mh_loaded") {
    for (n <- Seq(1, 5, 20)) {
        val corpus = docsX(n); val rows = corpus.count()
        val batch = Tables.documents(spark, dir)
          .withColumn("doc_id", col("doc_id") + lit(900000000L))
          .limit(2000)
        val index = Dedup.minhashIndexPortable(corpus, "doc_id", "text")
        val bucketsC = index.buckets.localCheckpoint(true)
        val shinglesC = index.shingles.localCheckpoint(true)
        time(s"inc_minhash    n=$n ($rows corpus, 2000 batch)") {
          noop(Dedup.minhashIncrementalPortable(
            batch, Dedup.MinhashIndex(bucketsC, shinglesC),
            "doc_id", "text"))
        }
        val name = s"graft_probe_idx_$n"
        time(s"inc_mh_save    n=$n (index build+save)") {
          graft.llm.IndexStore.saveMinhashIndex(
            Dedup.MinhashIndex(bucketsC, shinglesC), name)
        }
        val loaded = graft.llm.IndexStore.loadMinhashIndex(spark, name)
        time(s"inc_mh_loaded  n=$n ($rows corpus, 2000 batch)") {
          noop(Dedup.minhashIncrementalPortable(batch, loaded,
                                                "doc_id", "text"))
        }
        graft.llm.IndexStore.drop(spark, name)
      }
    }
    // Round-6 heavy operators. semantic_dedup scales nCells with the
    // corpus (the SemDeDup deployment rule: cell size ≈ corpus/nCells
    // stays constant, so within-cell pair work stays bounded).
    // shared_substrings on the replicated corpus is the designed WORST
    // case: every 4th replica shares its full text with the base, so
    // pair volume grows ~replica²×bases exactly like the minhash clique
    // note — the maxGramDocs guard (not corpus size) is what bounds it.
    section("semantic_dedup") {
    for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val rows = e.count()
        time(s"semantic_dedup n=$n ($rows)") {
          noop(Dedup.semanticDedup(e, nCells = 8 * n, threshold = 0.9))
        }
      }
    }
    section("shared_substr") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"shared_substr  n=$n ($rows)") {
          noop(Dedup.sharedSubstringSpans(d, "doc_id", "text"))
        }
      }
    }
    // CMS vs exact token counting: the sketch's shuffle is bounded by
    // the d×w counter grid while the exact path shuffles one row per
    // DISTINCT token (replicas add " v$i" suffix tokens, so vocabulary
    // grows with n) — the probe measures the gap widening.
    section("exact_counts cms_sketch") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        val toks = d.select(explode(Dedup.wordTokens(col("text")))
          .as("token"))
        time(s"exact_counts   n=$n ($rows)") {
          noop(toks.groupBy("token").agg(count(lit(1)).as("n")))
        }
        time(s"cms_sketch     n=$n ($rows)") {
          noop(graft.llm.Sketches.cmsSketch(toks, "token", d = 4, w = 512))
        }
      }
    }
    // Exact vs approx budget allocators: the exact form pays a
    // per-source SORT of all scored docs (grows n·log n per source);
    // the approx twin's histogram agg + bounded window is one narrow
    // shuffle to #sources×201 rows at any n — the probe measures the
    // gap widening and checks the approx spend never overshoots.
    section("mix_exact mix_approx") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"mix_exact      n=$n ($rows)") {
          noop(graft.llm.QualityFilters.mixtureTokenBudget(
            d, "doc_id", "text", "source", 0.5, Map("src0" -> 3L)))
        }
        time(s"mix_approx     n=$n ($rows)") {
          noop(graft.llm.QualityFilters.mixtureTokenBudgetApprox(
            d, "doc_id", "text", "source", 0.5, Map("src0" -> 3L)))
        }
      }
    }
    // CCNet terciles: exact per-language ntile (a per-language sort)
    // vs percentile_approx cutoffs (one mergeable sketch agg).
    section("ccnet_exact ccnet_approx") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        val lm = graft.llm.NgramLm.fit(Tables.documents(spark, dir),
                                       "text", n = 3)
        time(s"ccnet_exact    n=$n ($rows)") {
          noop(graft.llm.NgramLm.perplexityBuckets(
            d, lm, "doc_id", "text", byCols = Seq("lang")))
        }
        time(s"ccnet_approx   n=$n ($rows)") {
          noop(graft.llm.NgramLm.perplexityBucketsApprox(
            d, lm, "doc_id", "text", byCols = Seq("lang")))
        }
      }
    }
    // Round-7 newcomers (q113 is covered above as mix_approx).
    // audio_decode is decode-bound row-local mapPartitions over small
    // blobs; temperature_mix is two tiny aggs + row-local membership;
    // mixed_language / gopher_yield are row-local expression pipelines
    // with narrow rollups; all four should track rows ~linearly.
    section("audio_decode temp_mix mixed_lang gopher_yield") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"audio_decode   n=$n ($rows)") {
          noop(graft.llm.Multimodal.decodeAudio(
            graft.llm.Multimodal.syntheticWavMedia(d), dims = 8))
        }
        time(s"temp_mix       n=$n ($rows)") {
          noop(graft.llm.QualityFilters.temperatureSample(
            d, "source", "doc_id", budgetFrac = 0.5, temperature = 2))
        }
        time(s"mixed_lang     n=$n ($rows)") {
          noop(graft.operators.LlmQueries.mixedLanguageFrames(d))
        }
        time(s"gopher_yield   n=$n ($rows)") {
          noop(graft.operators.LlmQueries.gopherYieldFrames(
            d.select("doc_id", "text", "source")))
        }
      }
    }
    // hard_negatives = the q38 broadcast-query per-partition top-k shape
    // (corpus never shuffles); source_similarity's one data-scale stage
    // is the per-(source,pos) quantized sum — the pairwise tail is
    // #sources², corpus-independent.
    section("hard_negatives src_similarity") {
    for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val rows = e.count()
        val q = Tables.embeddings(spark, dir).filter(col("vec_id") < 5)
        time(s"hard_negatives n=$n ($rows)") {
          noop(Similarity.hardNegatives(e, q, k = 5, dupThreshold = 0.25))
        }
        val d = docsX(n).select("doc_id", "source")
        time(s"src_similarity n=$n ($rows)") {
          noop(graft.operators.LlmQueries.sourceSimilarityFrames(d, e))
        }
      }
    }
    // Round-9 newcomers: domain_cap / line_quality / blocklist /
    // span_corrupt are row-local or group-limit shapes (expect linear);
    // length_batching is the q124 two-phase prefix-sum shape (expect
    // linear — the windows stay (band, bucket)-partitioned at any n).
    section("domain_cap blocklist line_quality span_corrupt length_batching") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"domain_cap     n=$n ($rows)") {
          noop(graft.llm.QualityFilters.domainCap(
            d.select(col("doc_id"), col("source"),
                     graft.llm.TextAnalysis.qualityScore(col("text"))
                       .as("q")),
            "source", "doc_id", "q", cap = 50))
        }
        time(s"blocklist      n=$n ($rows)") {
          noop(d.select(col("doc_id"), Dedup.wordTokens(col("text"))
                          .as("__t"))
            .select(col("doc_id"),
                    graft.llm.TextAnalysis.blocklistHits(col("__t"))
                      .as("hits")))
        }
        time(s"line_quality   n=$n ($rows)") {
          noop(graft.llm.QualityFilters.c4LineFilter(d, "doc_id", "text"))
        }
        time(s"span_corrupt   n=$n ($rows)") {
          noop(graft.llm.TextPacking.spanCorrupt(d, "doc_id", "text"))
        }
        time(s"length_batching n=$n ($rows)") {
          noop(graft.llm.Sharding.lengthBatching(
            d.select(col("doc_id"),
                     graft.llm.TextAnalysis.wsTokenCount(col("text"))
                       .cast("long").as("toks")),
            "doc_id", "toks"))
        }
      }
    }
    // epoch_expand is schedule-broadcast + row-local explode (expect
    // linear); bm25_indexed times ad-hoc scoring against a LOADED
    // index built per n (the build is the amortized offline job, timed
    // separately as bm25_build)
    section("epoch_expand bm25_build bm25_indexed") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"epoch_expand   n=$n ($rows)") {
          val sched = graft.llm.QualityFilters.epochSchedule(
            d, "source", "text", budgetMult = 2.0, maxEpochs = 4,
            temperature = 2).select("source", "epochs_x1000")
          noop(d.select(col("doc_id"), col("source"))
            .join(broadcast(sched), Seq("source"))
            .withColumn("__full", expr("epochs_x1000 div 1000L"))
            .withColumn("n_copies", col("__full").cast("int") + 1)
            .select(col("doc_id"),
                    explode(sequence(lit(0), col("n_copies") - 1))))
        }
        val name = s"graft_probe_bm25_$n"
        time(s"bm25_build     n=$n ($rows)") {
          graft.llm.IndexStore.saveBm25Index(
            graft.llm.Relevance.bm25Index(d, "doc_id", "text"), name)
        }
        val loaded = graft.llm.IndexStore.loadBm25Index(spark, name)
        time(s"bm25_indexed   n=$n ($rows)") {
          noop(graft.llm.Relevance.bm25ScoresWithIndex(
            loaded, Seq("vector", "stream", "merge")))
        }
        graft.llm.IndexStore.drop(spark, name)
      }
    }
    // PageRank: same replicated near-dup graph as the minhash probe;
    // the driver endgame handles every n here (the graph after banding
    // is pair-bounded) — the probe pins that rank cost tracks EDGES,
    // not corpus rows.
    section("graph_rank") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"graph_rank     n=$n ($rows)") {
          val pairs = Dedup.minhashCandidatePairsPortable(
            d, "doc_id", "text")
          noop(graft.llm.GraphRank.pageRankFixedPoint(
            pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))))
        }
      }
    }
    // round-10 probes for the round-9/10 newcomers.
    // script_anomaly is row-local regex counts (expect linear);
    // ann_recall and knn_eval are ranker-bound (the exact ranker is the
    // corpus-scale pass; the recall/vote joins touch k×queries rows).
    section("script_anomaly ann_recall knn_eval") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        val e = embX(n)
        val q = Tables.embeddings(spark, dir).filter(col("vec_id") < 5)
        time(s"script_anomaly n=$n ($rows)") {
          noop(graft.operators.LlmQueries.scriptAnomalyFrames(d))
        }
        time(s"ann_recall     n=$n ($rows)") {
          noop(graft.operators.LlmQueries.annRecallFrames(
            e, q, k = 10, dim = 64, nBits = 6))
        }
        time(s"knn_eval       n=$n ($rows)") {
          // q142's machinery with a FIXED query set and a growing corpus
          val corpus = e.filter(col("vec_id") >= 5)
          val labels = corpus.select(col("vec_id").as("corpus_id"),
                                     (col("vec_id") % 7).as("n_label"))
          val votes = Similarity.bruteForceTopK(corpus, q, k = 5)
            .join(labels, Seq("corpus_id"))
            .groupBy("query_id", "n_label")
            .agg(count(lit(1)).as("n"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("query_id").orderBy(desc("n"), asc("n_label"))
          noop(votes.withColumn("rk", row_number().over(w))
            .filter(col("rk") === 1))
        }
      }
    }
    // fertility encode: the q138 steady state — merges FIT ONCE on the
    // base corpus (the loaded-tokenizer artifact), the encode scan grows
    // with the corpus (expect linear; the agg is #sources rows)
    section("fertility_encode") {
      val merges = graft.llm.BpeTrainer.fitMerges(
        graft.llm.BpeTrainer.wordCounts(
          Tables.documents(spark, dir), "text"), numMerges = 40)
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"fertility_enc  n=$n ($rows)") {
          noop(graft.operators.LlmQueries.tokenizerFertilityFrames(
            d, merges))
        }
      }
    }
    // Index rolls vs rebuilds — THE q144/q147 claim: the roll reads the
    // narrow persisted index + tokenizes ONLY the fixed delta, while the
    // rebuild re-tokenizes the whole corpus. Roll cost should grow only
    // with index ROWS (md5/posting records), rebuild with corpus TEXT.
    section("fp_roll fp_rebuild bm25_roll bm25_rebuild") {
      val delta = Tables.documents(spark, dir)
        .withColumn("doc_id", col("doc_id") + lit(900000000L))
        .withColumn("text", concat(col("text"), lit(" probe-delta")))
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        val fpName = s"graft_probe_fpidx_$n"
        graft.llm.IndexStore.saveFingerprintIndex(
          Dedup.fingerprintIndex(d, "doc_id", "text"), fpName)
        val fpLoaded = graft.llm.IndexStore
          .loadFingerprintIndex(spark, fpName)
        time(s"fp_roll        n=$n ($rows)") {
          noop(Dedup.mergeFingerprintIndex(fpLoaded, delta,
                                           "doc_id", "text"))
        }
        time(s"fp_rebuild     n=$n ($rows)") {
          noop(Dedup.fingerprintIndex(d.unionByName(delta),
                                      "doc_id", "text"))
        }
        graft.llm.IndexStore.drop(spark, fpName)
        val bmName = s"graft_probe_bm25roll_$n"
        graft.llm.IndexStore.saveBm25Index(
          graft.llm.Relevance.bm25Index(d, "doc_id", "text"), bmName)
        val bmLoaded = graft.llm.IndexStore.loadBm25Index(spark, bmName)
        time(s"bm25_roll      n=$n ($rows)") {
          val rolled = graft.llm.Relevance.mergeBm25Index(
            bmLoaded, delta, "doc_id", "text")
          noop(rolled.postings); noop(rolled.stats)
        }
        time(s"bm25_rebuild   n=$n ($rows)") {
          val built = graft.llm.Relevance.bm25Index(
            d.unionByName(delta), "doc_id", "text")
          noop(built.postings); noop(built.stats)
        }
        graft.llm.IndexStore.drop(spark, bmName)
      }
    }
    // round-10 rolls for the remaining index families: MinHash (delta
    // signed row-locally + union-recounted guard), IVF (delta assigned
    // to FIXED centroids), LSH (delta hashed row-locally). Same
    // fixed-delta design as fp/bm25 above: cost should track index
    // ROWS, never corpus text.
    section("mh_roll ivf_roll lsh_roll pq_roll") {
      val docDelta = Tables.documents(spark, dir)
        .withColumn("doc_id", col("doc_id") + lit(900000000L))
        .withColumn("text", concat(col("text"), lit(" probe-delta")))
      val vecDelta = Tables.embeddings(spark, dir)
        .withColumn("vec_id", col("vec_id") + lit(900000000L))
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        val e = embX(n); val vrows = e.count()
        val mhName = s"graft_probe_mhidx_$n"
        graft.llm.IndexStore.saveMinhashIndex(
          Dedup.minhashIndexPortable(d, "doc_id", "text"), mhName)
        val mhLoaded = graft.llm.IndexStore.loadMinhashIndex(spark, mhName)
        time(s"mh_roll        n=$n ($rows)") {
          val rolled = Dedup.mergeMinhashIndex(mhLoaded, docDelta,
                                               "doc_id", "text")
          noop(rolled.buckets); noop(rolled.shingles)
        }
        graft.llm.IndexStore.drop(spark, mhName)
        val ivfName = s"graft_probe_ivfidx_$n"
        graft.llm.IndexStore.saveIvfIndex(
          Similarity.ivfIndex(e, nCells = 8 * n, seed = 42L), ivfName)
        val ivfLoaded = graft.llm.IndexStore.loadIvfIndex(spark, ivfName)
        time(s"ivf_roll       n=$n ($vrows)") {
          noop(Similarity.mergeIvfIndex(ivfLoaded, vecDelta).assigned)
        }
        graft.llm.IndexStore.drop(spark, ivfName)
        val lshName = s"graft_probe_lshidx_$n"
        graft.llm.IndexStore.saveLshIndex(
          Similarity.lshIndex(e, dim = 64, nBits = 6), lshName)
        val lshLoaded = graft.llm.IndexStore.loadLshIndex(spark, lshName)
        time(s"lsh_roll       n=$n ($vrows)") {
          noop(Similarity.mergeLshIndex(lshLoaded, vecDelta, dim = 64,
                                        nBits = 6))
        }
        graft.llm.IndexStore.drop(spark, lshName)
        val pqName = s"graft_probe_pqidx_$n"
        graft.llm.IndexStore.savePqIndex(
          Similarity.pqIndex(e, nSub = 4, nCodes = 16, seed = 42L),
          pqName)
        val pqLoaded = graft.llm.IndexStore.loadPqIndex(spark, pqName)
        time(s"pq_roll        n=$n ($vrows)") {
          noop(Similarity.mergePqIndex(pqLoaded, vecDelta).codes)
        }
        graft.llm.IndexStore.drop(spark, pqName)
      }
    }
    // funnel v2 / cluster stats / release build: compositions of audited
    // stages; the probe pins that composing them keeps the linear shape
    // (cluster_stats is timed off a PREBUILT cluster frame — the q146
    // steady state reads the persisted table, never re-dedups)
    section("funnel_v2 cluster_stats release_probe") {
    for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"funnel_v2      n=$n ($rows)") {
          val s1 = d
            .withColumn("__t", Dedup.wordTokens(col("text")))
            .withColumn("__n", size(col("__t")).cast("long"))
            .withColumn("__bh",
                        graft.llm.TextAnalysis.blocklistHits(col("__t"))
                          .cast("long"))
            .filter(col("__n") === 0 ||
                      floor(col("__bh").cast("double") / col("__n") * 1e6d +
                              0.5d) / 1e6d <= 0.02)
            .select("doc_id", "source", "text")
          val s2 = s1.join(
            graft.operators.LlmQueries.scriptAnomalyFrames(s1)
              .filter(col("repl_chars") === 0 && col("ctrl_chars") === 0 &&
                        !col("mixed_script"))
              .select("doc_id"),
            Seq("doc_id"))
          val s3 = graft.llm.QualityFilters.domainCap(
            s2.withColumn("__q",
                          graft.llm.TextAnalysis.qualityScore(col("text"))),
            "source", "doc_id", "__q", cap = 50)
          noop(s3
            .withColumn("__fp",
                        graft.llm.TextAnalysis.fingerprint(col("text")))
            .withColumn("__min",
                        min("doc_id").over(
                          org.apache.spark.sql.expressions.Window
                            .partitionBy("__fp")))
            .filter(col("doc_id") === col("__min"))
            .select("doc_id"))
        }
        val clusters = Dedup.minhashPortable(d, "doc_id", "text")
          .select("doc_id", "cluster_id")
          .transform(graft.Materialize(_))
        time(s"cluster_stats  n=$n ($rows)") {
          noop(clusters.groupBy("cluster_id")
            .agg(count(lit(1)).as("sz"))
            .groupBy("sz").agg(count(lit(1)).as("n_clusters")))
        }
      }
    }

    section("sem_decon wps_sample cell_sample") {
      // semantic decon: eval side FIXED (benchmarks don't grow with the
      // corpus) while train replicates — cost must be linear in train
      val evalE = Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 10 === 3)
      for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val rows = e.count()
        time(s"sem_decon      n=$n ($rows)") {
          noop(graft.llm.Contamination.semanticContamination(
            e, evalE, threshold = 0.3))
        }
        val idx = Similarity.ivfIndex(e, nCells = 8, seed = 42L)
        val idxM = idx.copy(assigned = graft.Materialize(idx.assigned))
        time(s"cell_sample    n=$n ($rows)") {
          noop(Similarity.cellBalancedSample(idxM, k = 20))
        }
      }
      // kernel-relevant regime: a BENCHMARK-sized eval (all 2k vectors)
      // against the 20× train side — 80M cosines; the fused native
      // kernel vs the interpreted HOF twin, same plan otherwise
      {
        val e20 = embX(20)
        val allEval = Tables.embeddings(spark, dir)
        val evs = allEval
          .select(struct(col("vec_id").cast("long").as("eid"),
                         col("embedding").as("ev")).as("__e"))
          .agg(collect_list("__e").as("evs"))
        val t = e20.select(col("vec_id"), col("embedding"))
          .crossJoin(broadcast(evs))
        time("sem_decon_2keval nat n=20") {
          noop(t.select(col("vec_id"),
            Similarity.cosineArgmax(col("embedding"), col("evs"), 0.3)))
        }
        time("sem_decon_2keval hof n=20") {
          noop(t.select(col("vec_id"),
            Similarity.cosineArgmaxHof(col("embedding"), col("evs"),
                                       0.3)))
        }
      }
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"wps_sample     n=$n ($rows)") {
          noop(graft.llm.QualityFilters.weightedPrioritySample(
            d.select("doc_id", "source", "n_chars"),
            "source", "doc_id", "n_chars", k = 25))
        }
      }
    }

    section("substr_scrub image_dedup quality_distill stream_dedup " +
            "unigram_segment pq_adc_scan") {
      // tokenizer fitted ONCE on the base corpus (the persisted-model
      // steady state); the probe times the APPLY path as corpus grows
      val uniVocab = graft.llm.UnigramTrainer.fitUnigram(
        graft.llm.BpeTrainer.wordCounts(Tables.documents(spark, dir),
                                        "text"),
        vocabSize = 300)
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"substr_scrub   n=$n ($rows)") {
          noop(Dedup.scrubSharedSubstrings(
            d, "doc_id", "text", n = 6, minTokens = 10,
            maxGramDocs = 50))
        }
        time(s"image_dedup    n=$n ($rows)") {
          val keyed = d.select(
            col("doc_id").as("media_id"),
            graft.llm.TextAnalysis.fingerprint(col("text")).as("fp"),
            lit(false).as("perturb"))
          noop(Dedup.hammingCandidatesPortable(
            graft.llm.Multimodal.imageAHash60(
              graft.llm.Multimodal.syntheticContentImages(keyed))
              .select(col("media_id").as("doc_id"),
                      col("ahash60").as("h60"))))
        }
        time(s"quality_distill n=$n ($rows)") {
          noop(graft.ml.QualityDistill.distillGopher(
            d, "doc_id", "text",
            trainFilter = col("doc_id") % 4 === 0, minStopwordHits = 1)
            .select("doc_id", "label", "prediction"))
        }
        time(s"unigram_segment n=$n ($rows)") {
          noop(graft.llm.UnigramTrainer.segmentDocs(
            d, "doc_id", "text", uniVocab))
        }
        // streaming dedup: staging is setup, the timer covers the full
        // 3-trigger run of the stateful gate over the landed files
        val base = java.nio.file.Files
          .createTempDirectory("probe_sd_").toString
        graft.streaming.EventStreams.stageMicroBatchFiles(
          d.select(col("doc_id"), col("text"),
                   expr("timestampadd(MINUTE, CAST(doc_id % 3 AS INT), " +
                        "timestamp'2024-01-01 00:00:00')").as("ts")),
          col("doc_id") % 3, nBatches = 3, inDir = s"$base/in")
        time(s"stream_dedup   n=$n ($rows)") {
          val stream = spark.readStream
            .schema("doc_id BIGINT, text STRING, ts TIMESTAMP")
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$base/in")
          val q = graft.streaming.EventStreams.streamingDedupSink(
            stream, "ts", "text", "1 hour", s"$base/out", s"$base/ckpt")
          try q.processAllAvailable() finally q.stop()
        }
      }
      // PQ ADC scan: index built per n outside the timer (the persisted
      // steady state); the timer covers the pure code-scan ranking
      val pqQueries = Tables.embeddings(spark, dir)
        .filter(col("vec_id") < 5)
      for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val vrows = e.count()
        val idx0 = Similarity.pqIndex(e, nSub = 4, nCodes = 16,
                                      seed = 42L)
        val idx = idx0.copy(codes = graft.Materialize(idx0.codes),
                            codebooks = graft.Materialize(idx0.codebooks))
        time(s"pq_adc_scan    n=$n ($vrows)") {
          noop(Similarity.pqTopK(idx, pqQueries, k = 10))
        }
      }
    }

    section("shard_diff triplet_mine") {
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        val v2 = d.filter(col("doc_id") % 11 =!= 5)
          .withColumn("text",
            when(col("doc_id") % 7 === 1,
                 concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text")))
        time(s"shard_diff     n=$n ($rows)") {
          noop(graft.llm.Versioning.shardDiff(
            d.select("doc_id", "text"), v2.select("doc_id", "text"),
            "doc_id", "text", buckets = 64))
        }
      }
      // triplet mining with a FIXED anchor batch (the production unit:
      // pairs arrive batch-wise from the dedup job) as the corpus grows
      val anchorBatch = Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 5 === 2)
      for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val vrows = e.count()
        time(s"triplet_mine   n=$n ($vrows)") {
          noop(Similarity.hardNegatives(e, anchorBatch, k = 1,
                                        dupThreshold = 0.25))
        }
      }
    }

    section("bitext_mine vector_qa compress_gate") {
      // bitext: the TARGET side is the broadcast batch unit — fix it,
      // grow the source side (the mining loop's actual shape)
      val tgtFixed = Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 7 === 3)
      for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val vrows = e.count()
        time(s"bitext_mine    n=$n ($vrows)") {
          noop(Similarity.bitextMarginMine(
            e.filter(col("vec_id") % 7 =!= 3), tgtFixed, k = 4,
            minMargin = 1.0))
        }
        time(s"vector_qa      n=$n ($vrows)") {
          noop(Similarity.vectorQuarantine(e))
        }
      }
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"compress_gate  n=$n ($rows)") {
          noop(graft.llm.TextAnalysis.deflateRatios(d, "doc_id", "text"))
        }
      }
    }
    // round-10 fourth wave: rendezvous assignment (row-local scan),
    // stats roll vs rebuild (counts-rows merge vs corpus re-scan),
    // phrase search from the persisted positional index (token-pruned
    // sliver reads — should be near-flat like bm25_indexed) and the
    // positional roll vs rebuild (same fixed-delta design as fp/bm25).
    section("rendezvous stats_roll stats_rebuild phrase_search " +
            "pos_build pos_roll pos_rebuild") {
      val delta = Tables.documents(spark, dir)
        .withColumn("doc_id", col("doc_id") + lit(900000000L))
        .withColumn("text", concat(col("text"), lit(" probe-delta")))
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"rendezvous     n=$n ($rows)") {
          noop(d.select(
            graft.llm.Sharding.rendezvousShard(col("doc_id"), 16)
              .as("s16"),
            graft.llm.Sharding.rendezvousShard(col("doc_id"), 17)
              .as("s17")))
        }
        val csName = s"graft_probe_counts_$n"
        graft.llm.CorpusStats.saveCounts(
          graft.llm.CorpusStats.tokenCounts(d, "text"), csName)
        time(s"stats_roll     n=$n ($rows)") {
          noop(graft.llm.CorpusStats.statsFromCounts(
            graft.llm.CorpusStats.mergeCounts(
              graft.llm.CorpusStats.loadCounts(spark, csName),
              graft.llm.CorpusStats.tokenCounts(delta, "text"))))
        }
        time(s"stats_rebuild  n=$n ($rows)") {
          noop(graft.llm.CorpusStats.corpusStats(
            d.unionByName(delta), "text"))
        }
        graft.llm.CorpusStats.dropCounts(spark, csName)
        val posName = s"graft_probe_pos_$n"
        time(s"pos_build      n=$n ($rows)") {
          graft.llm.IndexStore.savePositionalIndex(
            graft.llm.Relevance.positionalIndex(d, "doc_id", "text"),
            posName)
        }
        val posLoaded =
          graft.llm.IndexStore.loadPositionalIndex(spark, posName)
        time(s"phrase_search  n=$n ($rows)") {
          noop(graft.llm.Relevance.phraseMatches(
            posLoaded, Seq("table", "hash")))
          noop(graft.llm.Relevance.phraseMatches(
            posLoaded, Seq("slow", "hash", "batch")))
        }
        time(s"pos_roll       n=$n ($rows)") {
          noop(graft.llm.Relevance.mergePositionalIndex(
            posLoaded, delta, "doc_id", "text"))
        }
        time(s"pos_rebuild    n=$n ($rows)") {
          noop(graft.llm.Relevance.positionalIndex(
            d.unionByName(delta), "doc_id", "text"))
        }
        graft.llm.IndexStore.drop(spark, posName)
      }
    }
    // q192's shape: a FIXED changelog rolls into the persisted index —
    // cost must track changelog + index rows, never corpus text. (The
    // diff-ROUTED variant was probed and rejected: re-digesting v2 to
    // find the delta costs as much as re-tokenizing it; see PLANS.md.)
    section("chlog_reindex full_reindex") {
      val chBase = Tables.documents(spark, dir)
      val upserts = chBase.filter(col("doc_id") % 10 === 4)
        .select(col("doc_id"),
                concat(col("text"), lit(" [rev2]")).as("text"))
      val deletes = chBase.filter(col("doc_id") % 10 === 5)
        .select("doc_id")
      for (n <- Seq(1, 5, 20)) {
        val v1 = docsX(n); val rows = v1.count()
        val posName = s"graft_probe_selidx_$n"
        graft.llm.IndexStore.savePositionalIndex(
          graft.llm.Relevance.positionalIndex(v1, "doc_id", "text"),
          posName)
        val base = graft.llm.IndexStore
          .loadPositionalIndex(spark, posName)
        time(s"chlog_reindex  n=$n ($rows)") {
          noop(graft.llm.Relevance
            .mergePositionalIndex(base, upserts, "doc_id", "text")
            .join(broadcast(deletes), Seq("doc_id"), "left_anti"))
        }
        time(s"full_reindex   n=$n ($rows)") {
          noop(graft.llm.Relevance.positionalIndex(v1, "doc_id",
                                                   "text"))
        }
        graft.llm.IndexStore.drop(spark, posName)
      }
    }

    // round-10 fifth wave: OOV report, salted join, padding waste,
    // manifest digests, HLL distinct. All should be linear-in-scan or
    // better; the HLL row is the sketch story — the global union stays
    // a #groups-row agg at every n.
    section("vocab_oov salted_join padding_waste manifest_digest " +
            "hll_distinct") {
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"vocab_oov      n=$n ($rows)") {
          val vocab = graft.llm.CorpusStats
            .tokenCounts(d.filter(col("doc_id") % 10 =!= 3), "text")
            .orderBy(desc("n"), asc("token")).limit(20)
            .select(col("token"), lit(1).as("__known"))
          noop(d.filter(col("doc_id") % 10 === 3)
            .select(col("source"),
                    explode(Dedup.wordTokens(col("text"))).as("token"))
            .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
            .join(broadcast(vocab), Seq("token"), "left")
            .groupBy("source")
            .agg(sum("cnt").as("n_tokens"),
                 sum(when(col("__known").isNull, col("cnt"))
                       .otherwise(0L)).as("n_oov")))
        }
        time(s"padding_waste  n=$n ($rows)") {
          noop(graft.llm.Sharding.lengthBatching(
            d.select(col("doc_id"),
                     graft.llm.TextAnalysis.wsTokenCount(col("text"))
                       .cast("long").as("toks")),
            "doc_id", "toks", 64, 8, 2048L, "r9", 32)
            .groupBy("band", "batch_id")
            .agg(count(lit(1)).as("n"), sum("toks").as("s"),
                 max("toks").as("m")))
        }
        time(s"manifest_digest n=$n ($rows)") {
          noop(graft.llm.Versioning.frameDigest(
            d, concat_ws(":", col("doc_id").cast("string"),
                         col("text"))))
        }
        time(s"hll_distinct   n=$n ($rows)") {
          noop(d.select(col("source"), col("doc_id"),
                        explode(Dedup.wordTokens(col("text")))
                          .as("token"))
            .select(col("source"),
                    concat_ws(":", col("doc_id").cast("string"),
                              col("token")).as("item"))
            .groupBy("source")
            .agg(hll_sketch_agg(col("item")).as("sk"))
            .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
                   .as("est")))
        }
      }
      val events = Tables.table(spark, dir, "events")
      for (n <- Seq(1, 5, 20)) {
        val e = (0 until n).map(i =>
          events.withColumn("event_id", col("event_id") +
                              lit(i * 100000000L)))
          .reduce(_ union _)
        val rows = e.count()
        time(s"salted_join    n=$n ($rows)") {
          val ev = e.select(col("event_type"), col("value"),
                            col("event_id"))
          val dim = ev.select("event_type").distinct()
            .withColumn("weight",
                        (length(col("event_type")) * lit(1000L))
                          .cast("long"))
          noop(graft.operators.Skew
            .saltedJoin(ev, dim, "event_type", n = 8,
                        saltCols = Seq("event_id"))
            .groupBy("event_type")
            .agg(count(lit(1)).as("n_events"),
                 sum("weight").as("weight_mass")))
        }
      }
    }
    // Round-11: SERVING-latency pin for the indexed-retrieval family
    // (q143/q181/q183/q191). The claim on trial: a single ad-hoc query
    // against the PERSISTED indexes costs a token-pruned sliver read
    // plus fixed overheads — per-query latency stays ~flat as the
    // corpus scales ×1/×5/×20 while the full index rebuild grows
    // linearly. `_c` = first call in the session (includes file
    // listing), `_w` = repeat call (the steady-state serving shape).
    section("srv_build srv_bm25 srv_phrase srv_prox srv_rrf") {
      import org.apache.spark.sql.expressions.Window
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        val bmName = s"graft_probe_srvbm_$n"
        val posName = s"graft_probe_srvpos_$n"
        time(s"srv_build      n=$n ($rows)") {
          graft.llm.IndexStore.saveBm25Index(
            graft.llm.Relevance.bm25Index(d, "doc_id", "text"), bmName)
          graft.llm.IndexStore.savePositionalIndex(
            graft.llm.Relevance.positionalIndex(d, "doc_id", "text"),
            posName)
        }
        val bm = graft.llm.IndexStore.loadBm25Index(spark, bmName)
        val pos = graft.llm.IndexStore.loadPositionalIndex(spark, posName)
        for (r <- Seq("c", "w")) {
          time(s"srv_bm25_$r     n=$n ($rows)") {
            noop(graft.llm.Relevance.bm25ScoresWithIndex(
              bm, terms = Seq("vector", "stream", "merge")))
          }
          time(s"srv_phrase_$r   n=$n ($rows)") {
            noop(graft.llm.Relevance.phraseMatches(
              pos, Seq("table", "hash")))
          }
          time(s"srv_prox_$r     n=$n ($rows)") {
            noop(graft.llm.Relevance.proximityMatches(
              pos, Seq("table", "hash"), maxGap = 3))
          }
        }
        time(s"srv_rrf        n=$n ($rows)") {
          val bmTop = graft.llm.Relevance
            .bm25ScoresWithIndex(bm, Seq("vector", "stream", "merge"))
            .orderBy(desc("bm25"), asc("doc_id")).limit(100)
            .withColumn("rank",
                        row_number()
                          .over(Window.orderBy(desc("bm25"),
                                               asc("doc_id")))
                          .cast("long"))
            .select("doc_id", "rank")
          val phTop = graft.llm.Relevance
            .phraseMatches(pos, Seq("table", "hash"))
            .orderBy(desc("phrase_tf"), asc("doc_id")).limit(100)
            .withColumn("rank",
                        row_number()
                          .over(Window.orderBy(desc("phrase_tf"),
                                               asc("doc_id")))
                          .cast("long"))
            .select("doc_id", "rank")
          noop(graft.llm.Relevance.rrfFuse(bmTop, phTop, "bm25",
                                           "phrase", k = 60, topN = 20))
        }
        graft.llm.IndexStore.drop(spark, bmName)
        graft.llm.IndexStore.drop(spark, posName)
      }
    }

    // Round-11: q193's shape — a FIXED changelog (upserts + deletes)
    // rolls into the persisted BM25 index with exact stats give-back.
    // Roll cost may scan index ROWS (columnar, broadcast anti/semi
    // joins) but must never re-tokenize corpus TEXT; the rebuild pays
    // the full tokenize + agg at every scale.
    section("bm25_chlog_roll bm25_chlog_rebuild") {
      val chBase = Tables.documents(spark, dir)
      val upserts = chBase.filter(col("doc_id") % 10 === 4)
        .select(col("doc_id"),
                concat(col("text"), lit(" [rev2]")).as("text"))
      val deletes = chBase.filter(col("doc_id") % 10 === 5)
        .select("doc_id")
      for (n <- Seq(1, 5, 20)) {
        val v1 = docsX(n); val rows = v1.count()
        val name = s"graft_probe_chbm_$n"
        graft.llm.IndexStore.saveBm25Index(
          graft.llm.Relevance.bm25Index(v1, "doc_id", "text"), name)
        val base = graft.llm.IndexStore.loadBm25Index(spark, name)
        time(s"bm25_chlog_roll n=$n ($rows)") {
          val rolled = graft.llm.Relevance.deleteFromBm25Index(
            graft.llm.Relevance.mergeBm25Index(base, upserts,
                                               "doc_id", "text"),
            deletes)
          noop(rolled.postings); noop(rolled.stats)
        }
        time(s"bm25_chlog_rebld n=$n ($rows)") {
          val applied = v1
            .select("doc_id", "text")
            .join(broadcast(deletes.unionByName(
                    upserts.select("doc_id"))),
                  Seq("doc_id"), "left_anti")
            .unionByName(upserts)
          val rb = graft.llm.Relevance.bm25Index(applied, "doc_id",
                                                 "text")
          noop(rb.postings); noop(rb.stats)
        }
        graft.llm.IndexStore.drop(spark, name)
      }
    }

    // Round-11: q194's shape — the log-bin quantile sketch. One
    // corpus-scale (source, bin) agg with map-side combine; the rows
    // that cross the exchange are bounded by #sources × #bins at EVERY
    // scale (printed beside the time), and everything after the agg is
    // sketch-scale.
    section("sketch_quantiles") {
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        val binned = d.select(
          col("source"),
          graft.llm.Sketches.logBin(
            (size(Dedup.wordTokens(col("text"))) + 1).cast("long"))
            .as("bin"))
        val perSrc = binned.groupBy(col("source").as("scope"), col("bin"))
          .agg(count(lit(1)).as("cnt"))
        time(s"sketch_quant   n=$n ($rows)") {
          val merged = perSrc.groupBy("bin").agg(sum("cnt").as("cnt"))
            .select(lit("GLOBAL").as("scope"), col("bin"), col("cnt"))
          noop(graft.llm.Sketches
            .binQuantiles(perSrc.unionByName(merged), Seq(50, 90, 99)))
        }
        println(s"[probe] sketch_quant   n=$n exchange rows = " +
                perSrc.count())
      }
    }

    // Round-11: q185 adjudication — manual salting vs AQE's skew-join
    // split on the same 90%-hot-key corpus. Both sides run as
    // shuffle joins (broadcast disabled: the production premise is a
    // dim too big to broadcast); `skew_plain` is the straggler
    // baseline with the split disabled. AQE's split only exists for
    // shuffle-join stages — a broadcast-side or aggregated-upstream
    // skew has nothing for it to split, which is why the explicit
    // salt stays in the toolbox.
    section("skew_plain skew_aqe skew_salted") {
      val events = Tables.table(spark, dir, "events")
      def conf(k: String, v: String): String = {
        val old = spark.conf.get(k); spark.conf.set(k, v); old
      }
      for (n <- Seq(1, 5, 20)) {
        val e = (0 until n).map(i =>
          events.withColumn("event_id",
                            col("event_id") + lit(i * 100000000L)))
          .reduce(_ union _)
          // 90% of the fact table lands on ONE key
          .select(
            when(col("event_id") % 10 < 9, lit("hot"))
              .otherwise(concat(lit("k"), (col("event_id") % 50)
                                  .cast("string"))).as("key"),
            col("event_id"), col("value"))
        val rows = e.count()
        val dim = e.select("key").distinct()
          .withColumn("weight", (length(col("key")) * 1000L))
        val oldBc = conf("spark.sql.autoBroadcastJoinThreshold", "-1")
        val oldThr = conf(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "1m")
        val oldAdv = conf(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        val oldSkew = conf("spark.sql.adaptive.skewJoin.enabled", "false")
        time(s"skew_plain     n=$n ($rows)") {
          noop(e.join(dim, Seq("key")))
        }
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        time(s"skew_aqe       n=$n ($rows)") {
          noop(e.join(dim, Seq("key")))
        }
        time(s"skew_salted    n=$n ($rows)") {
          noop(graft.operators.Skew.saltedJoin(
            e, dim, "key", n = 8, saltCols = Seq("event_id")))
        }
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          oldThr)
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       oldAdv)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", oldSkew)
      }
    }
    // Round-11 second wave: the chat chain (q201 — pure row-local HOFs,
    // must scale linearly with ZERO shuffle growth), preference-pair
    // mining (q203 — scan grows, but WindowGroupLimit keeps the shuffle
    // at k·mappers·#sources rows), and binary ANN (q208 — an 8-byte/
    // vector hamming scan; the float fetch is rerank-sized).
    section("chat_assembly pref_pairs binary_ann") {
      import org.apache.spark.sql.expressions.Window
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"chat_assembly  n=$n ($rows)") {
          noop(graft.operators.LlmQueries.chatReport(
            graft.operators.LlmQueries.chatStagedOf(
              d.select("doc_id", "text"))))
        }
        time(s"pref_pairs     n=$n ($rows)") {
          val q = d.select(
            col("doc_id"), col("source"),
            floor(graft.llm.TextAnalysis.qualityScore(col("text"))
                    * 10000.0d + 0.5d).cast("long").as("qi"))
          val wHi = Window.partitionBy("source")
            .orderBy(desc("qi"), col("doc_id"))
          val wLo = Window.partitionBy("source")
            .orderBy(col("qi"), desc("doc_id"))
          val hi = q.withColumn("r", row_number().over(wHi))
            .filter(col("r") <= 8)
            .select(col("source"), col("r"),
                    col("doc_id").as("chosen_id"),
                    col("qi").as("chosen_q"))
          val lo = q.withColumn("r", row_number().over(wLo))
            .filter(col("r") <= 8)
            .select(col("source"), col("r"),
                    col("doc_id").as("rejected_id"),
                    col("qi").as("rejected_q"))
          noop(hi.join(lo, Seq("source", "r"))
            .filter(col("chosen_id") =!= col("rejected_id") &&
                    col("chosen_q") - col("rejected_q") >= 1000L))
        }
      }
      for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val rows = e.count()
        time(s"binary_ann     n=$n ($rows)") {
          noop(Similarity.binaryTopK(e, e.filter(col("vec_id") < 5),
                                     k = 10))
        }
      }
    }
    // Round-11: q198's CDC fingerprinting (row-local chunker + fp
    // joins — should be scan-linear) and q199's cluster roll vs the
    // full rebuild: the roll pays delta banding + star edges + a
    // near-contracted closure; the rebuild re-shingles, re-bands, and
    // re-verifies the WHOLE corpus.
    section("cdc_chunks cluster_roll cluster_rebuild") {
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"cdc_chunks     n=$n ($rows)") {
          noop(d
            .select(col("doc_id"),
                    Dedup.normalizeText(col("text")).as("__norm"))
            .withColumn("__hs",
                        graft.llm.TextAnalysis.gramHashes(col("__norm"),
                                                          k = 8))
            .select(col("doc_id"),
                    explode(graft.llm.TextAnalysis.cdcChunks(
                      col("__norm"), col("__hs"), k = 8, modulus = 64))
                      .as("__c"))
            .select(col("doc_id"), col("__c.chunk_md5").as("fp"))
            .groupBy("fp").agg(count(lit(1)).as("n")))
        }
        // base = replicated corpus, FIXED delta slice (the daily batch)
        val delta = Tables.documents(spark, dir)
          .withColumn("doc_id", col("doc_id") + lit(900000000L))
          .limit(2000)
        val index = Dedup.minhashIndexPortable(d, "doc_id", "text")
        val baseClusters = Dedup.clustersFromPairs(
            d, "doc_id", "text",
            Dedup.minhashCandidatePairsPortable(d, "doc_id", "text"))
          .select("doc_id", "cluster_id")
          .localCheckpoint(true)
        val bC = index.buckets.localCheckpoint(true)
        val sC = index.shingles.localCheckpoint(true)
        time(s"cluster_roll   n=$n ($rows corpus, 2000 delta)") {
          noop(Dedup.rollClusters(
            baseClusters, Dedup.MinhashIndex(bC, sC), delta,
            "doc_id", "text"))
        }
        time(s"cluster_rebuild n=$n ($rows corpus, 2000 delta)") {
          val u = d.select("doc_id", "text")
            .unionByName(delta.select("doc_id", "text"))
          noop(Dedup.clustersFromPairs(
            u, "doc_id", "text",
            Dedup.minhashCandidatePairsPortable(u, "doc_id", "text")))
        }
      }
    }

    // round-11 third wave: the corpus-scale cores of q218 (gate-mask
    // histogram), q219 (daily KMV sketch build), q221 (per-dim quantized
    // sums), q222 (5-level fingerprint distinct) — each should scale
    // linearly in the scan with a bounded (mask/sketch/label×dim) or
    // id+hash-only (canon) exchange
    section("gate_ablation kmv_sketch canon_levels centroid_drift") {
      import org.apache.spark.sql.expressions.Window
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"gate_ablation  n=$n ($rows)") {
          val stats = graft.llm.QualityFilters.gopherStats(
            d, "text", minStopwordHits = 1)
          val bits = Seq(
            col("n_words") < 5 || col("n_words") > 100000,
            col("mean_word_len") < 2.0 || col("mean_word_len") > 10.0,
            col("symbol_ratio") > 0.1, col("bullet_line_frac") > 0.9,
            col("ellipsis_line_frac") > 0.3,
            col("alpha_word_frac") < 0.8, col("stopword_hits") < 1)
          val mask = bits.zipWithIndex
            .map { case (c, i) => when(c, lit(1L << i)).otherwise(0L) }
            .reduce(_ + _)
          noop(stats.select(col("n_words"), mask.as("mask"))
            .groupBy("mask")
            .agg(count(lit(1)).as("n_docs"),
                 sum("n_words").as("n_tokens")))
        }
        time(s"canon_levels   n=$n ($rows)") {
          val staged = d
            .select(col("doc_id"), col("text"),
                    regexp_replace(trim(col("text")), "\\s+", " ")
                      .as("w"))
            .withColumn("lw", lower(col("w")))
            .withColumn("nf", expr("nfc_normalize(lw)"))
            .withColumn("an", trim(regexp_replace(
              regexp_replace(col("nf"), "[^a-z0-9 ]", ""), " +", " ")))
          val lv = staged.select(col("text"), explode(array(
              struct(lit(0L).as("lord"), col("text").as("canon")),
              struct(lit(1L).as("lord"), col("w").as("canon")),
              struct(lit(2L).as("lord"), col("lw").as("canon")),
              struct(lit(3L).as("lord"), col("nf").as("canon")),
              struct(lit(4L).as("lord"), col("an").as("canon"))))
              .as("s"))
            .select(col("s.lord").as("lord"),
                    md5(col("s.canon").cast("binary")).as("fp"))
          noop(lv.groupBy("lord")
            .agg(count(lit(1)).as("n_docs"), countDistinct("fp")
                   .as("n_fp")))
        }
      }
      for (n <- Seq(1, 5, 20)) {
        val ev0 = Tables.events(spark, dir)
        val e = (0 until n).map(i =>
          ev0.withColumn("user_id", col("user_id") + lit(i * 10000000L)))
          .reduce(_ union _)
        val rows = e.count()
        time(s"kmv_sketch     n=$n ($rows)") {
          noop(e.select(
              datediff(col("ts").cast("date"), lit("1970-01-01"))
                .cast("long").as("day"),
              conv(substring(md5(concat(lit("kmv11:"),
                col("user_id").cast("string")).cast("binary")), 1, 15),
                16, 10).cast("long").as("h"))
            .distinct()
            .withColumn("r", row_number().over(
              Window.partitionBy("day").orderBy("h")))
            .filter(col("r") <= 64).select("day", "h"))
        }
      }
      for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val rows = e.count()
        time(s"centroid_drift n=$n ($rows)") {
          noop(e.select(
              col("label").cast("long").as("label"), col("vec_id"),
              posexplode(col("embedding")).as(Seq("pos", "x")))
            .filter(col("vec_id") % 5 =!= 2)
            .select(col("label"), col("pos"),
                    floor(col("x").cast("double") * 1000.0d)
                      .cast("long").as("qv"))
            .groupBy("label", "pos").agg(sum("qv").as("sb")))
        }
      }
    }

    // round-11 fourth wave: bigram PMI (the heaviest new agg class —
    // (w1,w2) explode), passage MaxP (chunk explode + chunk-level
    // Okapi), filtered ANN (three arms over one LSH index)
    section("pmi_bigrams passage_maxp filtered_ann") {
      import org.apache.spark.sql.expressions.Window
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"pmi_bigrams    n=$n ($rows)") {
          val toks = d.select(Dedup.wordTokens(col("text")).as("t"))
          noop(toks.filter(size(col("t")) >= 2)
            .select(explode(expr(
              "transform(sequence(1, size(t) - 1), " +
              "i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
            .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
            .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
            .filter(col("c_xy") >= 5))
        }
        time(s"passage_maxp   n=$n ($rows)") {
          val chunks = graft.llm.TextPacking.chunkDocuments(
              d, "doc_id", "text", chunkTokens = 32, overlap = 8)
            .select(col("doc_id"), col("chunk_idx"),
                    filter(split(lower(col("chunk_text")), "\\W+"),
                           t => length(t) > 0).as("toks"))
            .withColumn("dl", size(col("toks")).cast("long"))
          noop(chunks
            .select(col("doc_id"), col("chunk_idx"), col("dl"),
                    explode(col("toks")).as("token"))
            .filter(col("token").isin("vector", "stream", "merge"))
            .groupBy("doc_id", "chunk_idx", "dl", "token")
            .agg(count(lit(1)).as("tf")))
        }
      }
      for (n <- Seq(1, 5, 20)) {
        val e = embX(n); val rows = e.count()
        time(s"filtered_ann   n=$n ($rows)") {
          val index = Similarity.lshIndex(e.filter(col("vec_id") >= 5),
                                          dim = 64, nBits = 6)
          noop(Similarity.lshTopKWithIndex(
            index, e.filter(col("vec_id") < 5), k = 10,
            dim = 64, nBits = 6))
        }
      }
    }

    // round-12 newcomers: SCD-2 build/roll, the watermark audit's
    // two-phase running max, and the rater-agreement self-join
    section("scd2_build scd2_roll wm_audit rater_pairs") {
      import graft.llm.{Annotation, Versioning}
      def changelogX(d: org.apache.spark.sql.DataFrame) = {
        val rev2 = d.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), lit(2L).as("version"),
                  lit("upsert").as("op"),
                  concat(col("text"), lit(" [rev2]")).as("text"))
        val rev3 = d.filter(col("doc_id") % 14 === 0)
          .select(col("doc_id"), lit(3L).as("version"),
                  lit("upsert").as("op"),
                  concat(col("text"), lit(" [rev3]")).as("text"))
        val dels = d.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id"), lit(2L).as("version"),
                  lit("delete").as("op"), lit("").as("text"))
        rev2.unionByName(rev3).unionByName(dels)
      }
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        val full = changelogX(d)
        time(s"scd2_build     n=$n ($rows)") {
          noop(Versioning.scd2History(d, full, "doc_id", "version",
                                      "op", "text"))
        }
        val hist1 = Materialize(Versioning.scd2History(
          d, full.filter(col("version") <= 2),
          "doc_id", "version", "op", "text"))
        time(s"scd2_roll      n=$n ($rows)") {
          noop(Versioning.scd2Roll(
            hist1, full.filter(col("version") === 3),
            "doc_id", "version", "op", "text"))
        }
        val arr = (0 until n).map { i =>
          graft.operators.TimeSeriesQueries.q241Arrivals(spark, dir)
            .withColumn("event_id", col("event_id") + lit(i * 100000000L))
        }.reduce(_ unionByName _)
        time(s"wm_audit       n=$n") {
          noop(graft.operators.TimeSeriesQueries
            .watermarkAudit(arr, wmLagS = 900L, winS = 3600L))
        }
        val ground = d.select(
          col("doc_id"),
          (graft.llm.TextAnalysis.wsTokenCount(col("text")) >= 56)
            .cast("long").as("ground"))
        time(s"rater_pairs    n=$n ($rows)") {
          noop(Annotation.agreement(
            Annotation.syntheticRaters(ground, "doc_id", "ground",
                                       Seq(1 -> 5, 2 -> 15, 3 -> 35),
                                       key = "rate12"),
            "item", "rater", "label"))
        }
      }
    }

    // round-12 late wave: the 0.3-floor threshold sweep (the heaviest
    // newcomer — how does the widened candidate set grow?) and the
    // broadcast-histogram percentile assignment
    section("thr_sweep src_pctile") {
      for (n <- Seq(1, 5, 20)) {
        val d = docsX(n); val rows = d.count()
        time(s"thr_sweep      n=$n ($rows)") {
          noop(Dedup.minhashCandidatePairsPortable(
              d, "doc_id", "text", k = 5, numHashes = 32, bands = 8,
              threshold = 0.3, maxBucket = 1000)
            .select(col("doc_a"), col("doc_b"), col("jaccard"),
                    explode(expr("sequence(30, 95, 5)")).as("t"))
            .filter(col("jaccard") >= col("t").cast("double") / 100.0d)
            .groupBy("t").agg(count(lit(1)).as("n_pairs")))
        }
        time(s"src_pctile     n=$n ($rows)") {
          import org.apache.spark.sql.expressions.Window
          val dd = d.select(col("doc_id"), col("source"),
            graft.llm.TextAnalysis.wsTokenCount(col("text"))
              .cast("long").as("toks"))
          val w = Window.partitionBy("source").orderBy("toks")
            .rowsBetween(Window.unboundedPreceding, -1)
          val hist = dd.groupBy("source", "toks")
            .agg(count(lit(1)).as("nn"))
            .withColumn("below", coalesce(sum("nn").over(w), lit(0L)))
            .withColumn("n_source",
              sum("nn").over(Window.partitionBy("source")))
          noop(dd.join(broadcast(hist.select("source", "toks", "below",
                                             "n_source")),
                       Seq("source", "toks"))
            .select(col("doc_id"),
                    expr("below * 1000000 DIV n_source")
                      .as("pct_ppm")))
        }
      }
    }

    // round-12 join-view maintenance: rebuild cost grows with the full
    // corpus (re-join + re-agg of every line); the roll onto a
    // MATERIALIZED standing view pays one merge pass over the view plus
    // the FIXED-size delta legs — the never-re-join-the-history claim,
    // measured. The retract roll adds the signed changelog on top.
    section("jv_rebuild jv_roll jv_retract") {
      import graft.operators.ViewMaintenance
      def ordersX(n: Int) = {
        val o = Tables.orders(spark, dir)
        (0 until n).map(i =>
          o.withColumn("o_orderkey",
                       col("o_orderkey") + lit(i * 10000000L)))
          .reduce(_ union _)
      }
      def linesX(n: Int) = {
        val l = Tables.lineitem(spark, dir)
        (0 until n).map(i =>
          l.withColumn("l_orderkey",
                       col("l_orderkey") + lit(i * 10000000L)))
          .reduce(_ union _)
      }
      for (n <- Seq(1, 5, 20)) {
        val o = ordersX(n); val l = linesX(n)
        val rows = l.count()
        time(s"jv_rebuild     n=$n ($rows)") {
          noop(ViewMaintenance.orderRevenueView(o, l))
        }
        // standing view over the N× day-1 slice, materialized so the
        // roll timings don't re-pay the build
        val standing = Materialize(ViewMaintenance.orderRevenueView(
          o, l.filter(col("l_orderkey") % 10 < 8 &&
                      col("l_linenumber") <= 4)))
        // the delta stays BASE-sized at every n (one day's arrivals
        // don't grow with history depth)
        val delta = Tables.lineitem(spark, dir)
          .filter(col("l_orderkey") % 10 >= 8 ||
                  col("l_linenumber") > 4)
        val deltaOrders = Tables.orders(spark, dir).join(
          delta.select(col("l_orderkey").as("o_orderkey")).distinct,
          Seq("o_orderkey"), "left_semi")
        time(s"jv_roll        n=$n ($rows)") {
          noop(ViewMaintenance.orderRevenueRoll(standing, deltaOrders,
                                                delta))
        }
        val changelog = Tables.lineitem(spark, dir)
          .filter(col("l_quantity") > 45).withColumn("op", lit(-1))
          .unionByName(Tables.lineitem(spark, dir)
            .filter(col("l_quantity") > 45 &&
                    col("l_orderkey") % 7 =!= 0)
            .withColumn("l_discount", lit(0.0))
            .withColumn("op", lit(1)))
        val chOrders = Tables.orders(spark, dir).join(
          changelog.select(col("l_orderkey").as("o_orderkey")).distinct,
          Seq("o_orderkey"), "left_semi")
        time(s"jv_retract     n=$n ($rows)") {
          noop(ViewMaintenance.orderRevenueRetractRoll(
            standing, chOrders, changelog))
        }
      }
    }
    // round-12 extension wave: the cascade build (its roll/stream legs
    // merge bounded grain tables — the build scan is the data-scale
    // cost) and the FK profiler's heaviest pair (value-set distinct +
    // key-only semi-join)
    section("cascade fk_profile") {
      import graft.operators.TimeSeriesQueries.{evDayFromHours, evHourly}
      def eventsX(n: Int) = {
        val e = Tables.events(spark, dir)
        (0 until n).map(i =>
          e.withColumn("event_id",
                       col("event_id") + lit(i * 100000000L)))
          .reduce(_ unionByName _)
      }
      def keyedX(name: String, key: String, n: Int) = {
        val t = Tables.table(spark, dir, name)
        (0 until n).map(i =>
          t.withColumn(key, col(key) + lit(i * 10000000L)))
          .reduce(_ union _)
      }
      for (n <- Seq(1, 5, 20)) {
        val e = eventsX(n); val rows = e.count()
        time(s"cascade        n=$n ($rows)") {
          noop(evDayFromHours(evHourly(e)))
        }
        val c = keyedX("lineitem", "l_orderkey", n)
          .select(col("l_orderkey").as("v")).distinct()
        val p = keyedX("orders", "o_orderkey", n)
          .select(col("o_orderkey").as("v"))
        time(s"fk_profile     n=$n") {
          noop(c.agg(count(lit(1)).as("ndv_child"))
            .crossJoin(c.join(p.distinct(), Seq("v"), "left_semi")
              .agg(count(lit(1)).as("n_contained")))
            .crossJoin(p.agg(count(lit(1)).as("n_parent"),
                             count_distinct(col("v")).as("ndv_parent"))))
        }
      }
    }
    // round-12 second extension wave: the layout-debt audit (three
    // two-phase rank passes) and the KMV join-cardinality estimator
    // (value-set sketches)
    section("layout_debt kmv_jc") {
      def eventsX2(n: Int) = {
        val e = Tables.events(spark, dir)
        (0 until n).map(i =>
          e.withColumn("event_id",
                       col("event_id") + lit(i * 100000000L))
            .withColumn("user_id",
                        col("user_id") + lit(i * 1000000L)))
          .reduce(_ unionByName _)
      }
      for (n <- Seq(1, 5, 20)) {
        val e = eventsX2(n); val rows = e.count()
        time(s"layout_debt    n=$n ($rows)") {
          noop(graft.operators.TimeSeriesQueries
            .layoutDebtOver(e))
        }
        time(s"kmv_jc         n=$n ($rows)") {
          noop(graft.operators.LlmQueries.kmvJoinCardOver(e))
        }
      }
    }
    // round-13: the erasure/statistics tail. FK-consistent N×
    // replication (custkeys shift on customer/orders/events together,
    // orderkeys on orders/lineitem together) so the cascade stays
    // real. The erase SET is held at the BASE corpus' % 97 customers
    // at every N — the audit's broadcast payload must stay constant
    // while the scans grow (the fixed q274 property); a second sweep
    // grows the erase fraction at fixed corpus. Volume counters print
    // the erase/dead key-set sizes so flat-vs-growing is in the log,
    // not inferred.
    section("erasure_audit erasure_sweep view_erasure cascade_retract " +
            "analyze_col") {
      import graft.operators.{RelationalQueries, TimeSeriesQueries,
        ViewMaintenance}
      def custX(n: Int) = {
        val c = Tables.table(spark, dir, "customer")
        (0 until n).map(i =>
          c.withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L)))
          .reduce(_ unionByName _)
      }
      def ordX(n: Int) = {
        val o = Tables.orders(spark, dir)
        (0 until n).map(i =>
          o.withColumn("o_orderkey",
                       col("o_orderkey") + lit(i * 10000000L))
            .withColumn("o_custkey",
                        col("o_custkey") + lit(i * 10000000L)))
          .reduce(_ unionByName _)
      }
      def liX(n: Int) = {
        val l = Tables.lineitem(spark, dir)
        (0 until n).map(i =>
          l.withColumn("l_orderkey",
                       col("l_orderkey") + lit(i * 10000000L)))
          .reduce(_ unionByName _)
      }
      def evX(n: Int) = {
        val e = Tables.events(spark, dir)
        (0 until n).map(i =>
          e.withColumn("event_id",
                       col("event_id") + lit(i * 100000000L))
            .withColumn("user_id", col("user_id") + lit(i * 10000000L)))
          .reduce(_ unionByName _)
      }
      val baseErase = Tables.table(spark, dir, "customer")
        .filter(col("c_custkey") % 97 === 0)
      for (n <- Seq(1, 5, 20)) {
        val (c, o, l, e) = (custX(n), ordX(n), liX(n), evX(n))
        val rows = l.count()
        // q274: fixed erase set, growing corpus — broadcasts constant
        time(s"erasure_audit  n=$n ($rows lines)") {
          noop(RelationalQueries.erasureAuditOver(
            c, o, l, e, baseErase.select(col("c_custkey").as("k"))))
        }
        println(s"[probe] erasure_audit  n=$n erase keys = " +
                baseErase.count())
        // q275: erasure overlay on a MATERIALIZED standing view — the
        // cascade derivation + retract roll, not the view rebuild
        val standing = Materialize(ViewMaintenance.orderRevenueView(o, l))
        time(s"view_erasure   n=$n ($rows lines)") {
          noop(RelationalQueries.viewErasureOver(
            o, l, standing,
            baseErase.select(col("c_custkey").as("o_custkey"))))
        }
        // q276: corrections-volume-proportional — standing grain
        // materialized (bounded: days × types cells at every N), the
        // changelog stays BASE-sized
        val grain = Materialize(TimeSeriesQueries.evDayFromHours(
          TimeSeriesQueries.evHourly(e)))
        val base = Tables.events(spark, dir)
        val del = col("event_id") % 103 === 0
        val upd = col("event_id") % 101 === 0 && !del
        val changelog = base.filter(del || upd)
          .withColumn("op", lit(-1))
          .unionByName(base.filter(upd)
            .withColumn("value", col("value") + 1)
            .withColumn("op", lit(1)))
        time(s"cascade_retract n=$n ($rows lines)") {
          noop(TimeSeriesQueries.mergeGrain(
            grain,
            TimeSeriesQueries.evDayFromHours(
              changelog.groupBy(col("event_type"),
                                date_trunc("hour", col("ts")).as("hour"))
                .agg(sum(col("op")).cast("long").as("n"),
                     sum(col("op") *
                         floor(col("value") * 1000).cast("long"))
                       .as("v_milli"))),
            Seq("event_type", "day")).filter(col("n") > 0))
        }
        println(s"[probe] cascade_retract n=$n changelog rows = " +
                changelog.count() + ", grain cells = " + grain.count())
        // q277: one partial-agg scan per column at every ×N
        time(s"analyze_col    n=$n ($rows)") {
          noop(RelationalQueries.analyzeOneOver(e, "events", "value",
                                                "milli")
            .unionByName(RelationalQueries.analyzeOneOver(
              e, "events", "user_id", "int")))
        }
      }
      // erase-set-size sweep at FIXED ×5 corpus: the audit cost must
      // track the erase fraction only through the (gated) broadcast
      // payload — the scans are identical across mods
      val (c5, o5, l5, e5) = (custX(5), ordX(5), liX(5), evX(5))
      for (m <- Seq(97, 19, 5)) {
        val erase = c5.filter(col("c_custkey") % m === 0)
        time(s"erasure_sweep  mod=$m") {
          noop(RelationalQueries.erasureAuditOver(
            c5, o5, l5, e5, erase.select(col("c_custkey").as("k"))))
        }
        println(s"[probe] erasure_sweep  mod=$m erase keys = " +
                erase.count())
      }
    }
    // Round-14 CBO-estate probes (q278/q280/q281/q284): each runs
    // END-TO-END — internal ANALYZE publishes, per-scenario plan
    // recompiles, the two-phase histogram binning — over an ×N copy
    // of its tables written to a temp dir. Expect sub-linear growth
    // (the collector is one partial-agg scan; plan compilation is
    // size-independent), and the q278 flip must HOLD at every ×N:
    // its threshold derives from the stats-blind estimate (half of
    // it), so both sides scale together by construction — the probe
    // checks the construction.
    // Round-14 estate-erasure probe (q283): the WHOLE job — eight
    // index builds, the erase sweep, and the attestation (survivor
    // semi-joins + content digests + memoized rebuild targets) — over
    // an ×N copy of documents/embeddings/events. Build + rebuild legs
    // are corpus-scan-bound (minhash signatures dominate); the sweep
    // itself is erase-proportional anti-joins; digests shuffle only
    // leaf md5s into ≤64 buckets per family. Expect scan-linear
    // growth, nothing super-linear.
    section("estate_erase") {
      import java.nio.file.Files
      import graft.operators.LlmQueries
      for (n <- Seq(1, 5, 20)) {
        val tmp = Files.createTempDirectory(s"graft_est_x${n}_")
          .toString
        val d = (0 until n).map { i =>
          Tables.documents(spark, dir)
            .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
            .withColumn("text",
              if (i == 0) col("text")
              else concat(col("text"), lit(s" e$i")))
        }.reduce(_ union _)
        d.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
        embX(n).write.mode("overwrite")
          .parquet(s"$tmp/embeddings.parquet")
        val e = (0 until n).map(i =>
          Tables.events(spark, dir)
            .withColumn("event_id", col("event_id") + lit(i * 10000000L))
            // same stride as the id columns: at sf0.1 the user space is
            // tiny (1,500 ids) so a 10k stride happened to work, but the
            // xN contract (disjoint per-copy user spaces) must hold at
            // ANY SF, so the stride matches the 10M id stride
            .withColumn("user_id", col("user_id") + lit(i * 10000000L)))
          .reduce(_ union _)
        e.write.mode("overwrite").parquet(s"$tmp/events.parquet")
        val rows = d.count()
        time(s"estate_erase   n=$n ($rows docs)") {
          noop(LlmQueries.q283EstateErasure(spark, tmp))
        }
        time(s"estate_attest  n=$n (re-read only)") {
          noop(LlmQueries.q283EstateErasure(spark, tmp))
        }
      }
    }
    section("cbo_flip cbo_reorder cbo_hist cbo_joinhist") {
      import java.nio.file.Files
      import graft.operators.RelationalQueries
      for (n <- Seq(1, 5, 20)) {
        val tmp = Files.createTempDirectory(s"graft_cbo_x${n}_")
          .toString
        def writeX(t: String, keyCols: Seq[String],
                   copies: Int): Long = {
          val base = if (t == "events") Tables.events(spark, dir)
                     else Tables.table(spark, dir, t)
          val x = (0 until copies).map { i =>
            keyCols.foldLeft(base)((d, c) =>
              d.withColumn(c, col(c) + lit(i * 10000000L)))
          }.reduce(_ union _)
          x.write.mode("overwrite").parquet(s"$tmp/$t.parquet")
          x.count()
        }
        val nc = writeX("customer", Seq("c_custkey"), n)
        writeX("orders", Seq("o_orderkey", "o_custkey"), n)
        writeX("nation", Seq(), 1) // dimensions don't replicate
        val ne = writeX("events", Seq("event_id"), n)
        time(s"cbo_flip       n=$n ($nc cust)") {
          val strat = RelationalQueries
            .q278CboBroadcastFlip(spark, tmp).collect()
            .map(r => r.getString(0) -> r.getString(1)).toMap
          require(strat("c_stats_cbo_on") == "BroadcastHashJoin" &&
                    strat("a_no_stats_cbo_on") == "SortMergeJoin",
                  s"q278 flip lost at x$n: ${strat.toSeq.sorted}")
        }
        time(s"cbo_reorder    n=$n") {
          val bottom = RelationalQueries
            .q280CboJoinReorder(spark, tmp).collect()
            .map(r => r.getString(0) -> r.getString(1)).toMap
          require(bottom("b_reordered") == "customer+nation",
                  s"q280 reorder lost at x$n: ${bottom.toSeq.sorted}")
        }
        time(s"cbo_hist       n=$n ($ne events)") {
          noop(RelationalQueries.q281HistogramEstimate(spark, tmp))
        }
        time(s"cbo_joinhist   n=$n ($ne events)") {
          noop(RelationalQueries.q284HistJoinEstimate(spark, tmp))
        }
      }
    }
    // Warehouse-hygiene probe: how the estate SWEEP itself scales with
    // the number of dead estates (round-14's measured symptom was
    // accumulated dead tables/version dirs inflating index-estate
    // queries; the closing bench now vacuums first). vac_sweep must
    // grow ~linearly in the estate count and the second sweep must be
    // a no-op at any N; the dirty/clean read pair measures whether a
    // SAME-SESSION read of a live estate even sees the pollution (the
    // cross-run symptom was catalog+listing growth over hundreds of
    // runs — recorded here honestly either way).
    section("vacuum") {
      import graft.llm.{IndexStore => IS}
      val small = Tables.documents(spark, dir).limit(500)
        .select("doc_id", "text")
      for (n <- Seq(8, 40, 160)) {
        val live = "graft_vacprobe_live"
        IS.saveFingerprintIndex(
          Dedup.fingerprintIndex(small, "doc_id", "text"), live,
          numBuckets = 4)
        time(s"vac_pollute    n=$n") {
          (0 until n).foreach { i =>
            IS.saveFingerprintIndex(
              Dedup.fingerprintIndex(small, "doc_id", "text"),
              s"graft_vacprobe_dead_$i", numBuckets = 4)
          }
        }
        time(s"vac_dirty_read n=$n") {
          noop(IS.loadFingerprintIndex(spark, live))
        }
        time(s"vac_sweep      n=$n") {
          val rep = IS.vacuum(spark, live = Seq(live),
                              scope = "graft_vacprobe_")
          require(rep.droppedEstates.size == n,
                  s"sweep must drop all $n dead estates: ${rep.summary}")
        }
        time(s"vac_clean_read n=$n") {
          noop(IS.loadFingerprintIndex(spark, live))
        }
        time(s"vac_second     n=$n") {
          val rep = IS.vacuum(spark, live = Seq(live),
                              scope = "graft_vacprobe_")
          require(rep.droppedEstates.isEmpty && rep.gcedVersionDirs == 0,
                  s"second sweep must be a no-op: ${rep.summary}")
        }
        IS.drop(spark, live)
      }
    }
    spark.stop()
  }
}
