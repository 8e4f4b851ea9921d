package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  /** Clustered corpus (the honest ANN workload): 20 centroids × 25 members,
    * members = centroid + small deterministic jitter. Dim 16.
    */
  private def clustered: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val centroids = Array.fill(20)(Array.fill(16)(rnd.nextGaussian()))
    (0 until 500).map { i =>
      val c = centroids(i % 20)
      val v = c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("cosine: exact values on known vectors") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(c(0) - 1.0) < 1e-12)
    assert(math.abs(c(1)) < 1e-12)
    assert(math.abs(c(2) - math.sqrt(0.5)) < 1e-12)
  }

  test("bruteForceTopK: neighbors of a clustered point are its cluster-mates") {
    val corpus = clustered
    val out = Similarity.bruteForceTopK(
      corpus, corpus.filter(col("vec_id") === 0), k = 10)
    val neighbors = out.collect().map(_.getLong(1)).toSeq
    assert(neighbors.size == 10)
    // cluster of id 0 = ids ≡ 0 (mod 20)
    assert(neighbors.forall(_ % 20 == 0),
           s"expected cluster-mates of 0, got $neighbors")
  }

  test("lshTopK: recall ≥ 0.9 vs exact top-k on the clustered corpus") {
    val corpus  = clustered
    val queries = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(corpus, queries, k = 5, dim = 16,
                                    nBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9")
  }

  test("persisted lshIndex returns identical results to one-shot lshTopK") {
    val corpus  = clustered
    val queries = corpus.filter(col("vec_id") < 10)
    val oneShot = Similarity.lshTopK(corpus, queries, k = 5, dim = 16,
                                     nBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = Similarity.lshIndex(corpus, dim = 16, nBits = 8).persist()
    try {
      val viaIndex = Similarity
        .lshTopKWithIndex(index, queries, k = 5, dim = 16, nBits = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaIndex == oneShot)
    } finally { index.unpersist(); () }
  }

  test("lshTopK plan is a bucket equi-join, not a cartesian scan") {
    val corpus = clustered
    val plan = Similarity.lshTopK(corpus, corpus.limit(3), k = 5, dim = 16,
                                  nBits = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("ivfTopK: recall ≥ 0.95 vs exact top-k with nProbe=3 of 8 cells") {
    val corpus  = clustered
    val queries = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5,
                                 nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.95, s"IVF recall $recall < 0.95")
  }

  test("persisted ivfIndex returns identical results to one-shot ivfTopK") {
    val corpus  = clustered
    val queries = corpus.filter(col("vec_id") < 10)
    val oneShot = Similarity.ivfTopK(corpus, queries, k = 5,
                                     nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Similarity.ivfIndex(corpus, nCells = 8)
    idx.assigned.persist()
    try {
      val viaIndex = Similarity
        .ivfTopKWithIndex(idx, queries, k = 5, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaIndex == oneShot)
    } finally { idx.assigned.unpersist(); () }
  }

  test("lshSimilarityJoin drops pathological hot buckets (maxBucket)") {
    import spark.implicits._
    // 40 identical vectors all land in one LSH bucket: with the guard at
    // 10 the hot bucket is dropped (0 pairs); raising the cap past the
    // bucket size re-admits all 40·39/2 pairs — candidate count is
    // bounded by the guard, not by luck
    val hot = (0 until 40)
      .map(i => (i.toLong, Seq(1.0f, 0.5f, -0.25f, 0.75f)))
      .toDF("vec_id", "embedding")
    val guarded = Similarity.lshSimilarityJoin(
      hot, hot, dim = 4, threshold = 0.9, nBits = 6, maxBucket = 10)
    assert(guarded.count() == 0)
    val open = Similarity.lshSimilarityJoin(
      hot, hot, dim = 4, threshold = 0.9, nBits = 6, maxBucket = 100)
    assert(open.count() == 40L * 39 / 2)
  }

  test("int8 quantization: values bounded, zero-safe, scale reconstructs") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))   // all-zero edge
      .toDF("vec_id", "embedding")
    val out = Similarity.withQuantizedInt8(df).orderBy("vec_id").collect()
    val q1 = out(0).getSeq[Byte](2)
    assert(q1 == Seq[Byte](64, -127, 32, 0), // floor(x*127/1.0 + 0.5)
           s"unexpected quantization: $q1")
    assert(math.abs(out(0).getDouble(3) - 1.0 / 127.0) < 1e-15)
    assert(out(1).getSeq[Byte](2).forall(_ == 0) && out(1).getDouble(3) == 0.0)
    // reconstruction: qvec * qscale ≈ original within half a grid step
    val err = q1.map(_ * out(0).getDouble(3))
      .zip(Seq(0.5, -1.0, 0.25, 0.0))
      .map { case (r, o) => math.abs(r - o) }.max
    assert(err <= 0.5 / 127.0 + 1e-12, s"reconstruction error $err")
  }

  test("int8 brute-force top-k: recall ≥ 0.9 vs float top-k") {
    val corpus  = clustered
    val queries = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val int8 = Similarity.bruteForceTopKInt8(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect int8).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall $recall < 0.9")
  }

  test("lshSimilarityJoin finds within-cluster pairs above threshold") {
    val corpus = clustered
    val pairs = Similarity.lshSimilarityJoin(
      corpus.filter(col("vec_id") < 100), corpus.filter(col("vec_id") < 100),
      dim = 16, threshold = 0.9, nBits = 6)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.forall { case (a, b) => a % 20 == b % 20 },
           "pairs above 0.9 cosine must be cluster-mates")
  }

  test("hardNegatives: near-duplicates excluded BEFORE ranking, so the " +
       "negatives are the closest sub-threshold neighbors") {
    val corpus = clustered
    val queries = corpus.filter(col("vec_id") < 3)
    val negs = Similarity.hardNegatives(corpus, queries, k = 5,
                                        dupThreshold = 0.95)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(negs.length == 15, s"3 queries × 5 negatives, got ${negs.length}")
    assert(negs.forall(_._3 < 0.95))
    // cluster-mates (cos ≈ 0.99+) are the positives — none may appear
    assert(negs.forall { case (q, c, _, _) => q % 20 != c % 20 },
           "cluster-mates must be excluded from the negative set")
    // equivalence: the negatives are exactly the first 5 sub-threshold
    // entries of the FULL brute-force ranking, re-ranked 1..5
    val full = Similarity.bruteForceTopK(corpus, queries, k = 499)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = full.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      rows.filter(_._3 < 0.95).take(5).zipWithIndex
        .map { case ((_, c, _), i) => (q, c, i + 1L) }.toSeq
    }.toSet
    assert(negs.map(n => (n._1, n._2, n._4)).toSet == want)
  }

  test("source-centroid similarity (q116): identical sources score 1, " +
       "orthogonal sources 0, on hand-built centroids") {
    import spark.implicits._
    val dir = tmpDir("srcsim")
    // Sources A and B share the same mean direction (axis 0), C is
    // orthogonal (axis 1). 64-dim vectors, two docs per source.
    def vec(axis: Int, scale: Float) =
      (0 until 64).map(d => if (d == axis) scale else 0.0f)
    Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B"), (4L, "C"), (5L, "C"))
      .toDF("doc_id", "source")
      .withColumn("text", lit("x")).withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((0L, vec(0, 1.0f), 0), (1L, vec(0, 3.0f), 0),
        (2L, vec(0, 2.0f), 0), (3L, vec(0, 4.0f), 0),
        (4L, vec(1, 1.0f), 0), (5L, vec(1, 2.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.operators.LlmQueries
      .queries("q116_source_similarity")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("A", "B")) == 1.0, s"collinear centroids: $out")
    assert(out(("A", "C")) == 0.0 && out(("B", "C")) == 0.0,
           s"orthogonal centroids: $out")
  }

  test("annRecallFrames: exact-integer recall@k — high on the clustered corpus, defined on the random one") {
    val corpus  = clustered
    val queries = corpus.filter(col("vec_id") < 20)
    val rows = graft.operators.LlmQueries
      .annRecallFrames(corpus, queries, k = 5, dim = 16, nBits = 8)
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 5L)
      val recall = r.getAs[Long]("recall_x1000")
      assert(recall == r.getAs[Long]("n_hit") * 1000 / 5)
    }
    // mean recall on the clustered corpus matches the ≥0.9 LSH pin
    val mean = rows.map(_.getAs[Long]("recall_x1000")).sum / rows.length
    assert(mean >= 900L, s"clustered-corpus mean recall $mean < 900")
  }

  test("PQ: codes are nSub small ints, encoding is deterministic across " +
       "partitionings, and ADC recall holds on the clustered corpus") {
    val corpus  = clustered
    val index = Similarity.pqIndex(corpus, nSub = 4, nCodes = 16,
                                   seed = 42L)
    val codes = index.codes.orderBy("corpus_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(codes.length == 500)
    assert(codes.forall(_._2.length == 4), "one code per subspace")
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 16)))
    // seeded refit on the same frame reproduces the codes exactly (like
    // the IVF index, k-means|| init is seed-deterministic per layout,
    // not across arbitrary repartitionings)
    val again = Similarity.pqIndex(corpus, nSub = 4, nCodes = 16,
                                   seed = 42L)
      .codes.orderBy("corpus_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(codes.toSeq == again.toSeq, "seeded refit must reproduce codes")
    // PQ preserves neighborhoods at the cluster granularity: mates of a
    // query's generator cell quantize to (nearly) the same codes, so the
    // ADC top-k must be cluster-mates. Fine-grained order INSIDE a
    // cluster is exactly what 4×16 quantization gives up (codes tie →
    // id tie-break), so rank-level recall@k vs the float ranker is the
    // wrong bar — membership is the right one.
    val queries = corpus.filter(col("vec_id") < 20)
    val approx = Similarity.pqTopK(index, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mates = approx.count { case (q, c) => (c - q) % 20 == 0 }
    assert(mates.toDouble / approx.length >= 0.9,
           s"ADC top-5 must be cluster-mates: $mates/${approx.length}")
  }

  test("vectorQuarantine: zero vectors and scale blowups flagged with " +
       "their reasons; a clean corpus passes whole") {
    import spark.implicits._
    val clean = Similarity.vectorQuarantine(clustered)
    assert(clean.filter(col("is_outlier")).count() == 0,
           "tightly clustered norms must all pass")
    val salted = clustered.unionByName(
      Seq((9001L, Seq.fill(16)(0.0f)),
          (9002L, Seq.fill(16)(900.0f))).toDF("vec_id", "embedding"))
    val out = Similarity.vectorQuarantine(salted)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out(9001L) == "zero_norm")
    assert(out(9002L) == "norm_outlier")
    assert(out.count(_._2 == "ok") == 500,
           "original rows must be untouched by the salt")
  }

  test("bitextMarginMine pairs cluster-mates across the pseudo-language " +
       "split and matches a local margin replay") {
    import spark.implicits._
    val corpus = clustered
    // block-parity split is independent of the id%20 cluster structure,
    // so every cluster has members on both sides
    val src = corpus.filter((col("vec_id") / 20).cast("long") % 2 === 0)
    val tgt = corpus.filter((col("vec_id") / 20).cast("long") % 2 === 1)
    val out = Similarity.bitextMarginMine(src, tgt, k = 4,
                                          minMargin = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.nonEmpty)
    // the mined counterpart sits in the same generator cell
    val mates = out.count { case (s, t, _) => (t - s) % 20 == 0 }
    assert(mates.toDouble / out.length >= 0.9,
           s"mined pairs must be cluster-mates: $mates/${out.length}")
    // local replay of one source's margin from raw vectors
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
             math.sqrt(b.map(x => x * x).sum))
    }
    val (s0, t0, m0) = out.minBy(_._1)
    val tgtIds = vecs.keys.filter(i => (i / 20) % 2 == 1).toSeq
    val srcIds = vecs.keys.filter(i => (i / 20) % 2 == 0).toSeq
    def avgK(ids: Seq[Long], v: Seq[Double]) =
      ids.map(i => cos(v, vecs(i))).sorted.reverse.take(4).sum / 4
    val expect = cos(vecs(s0), vecs(t0)) /
      ((avgK(tgtIds, vecs(s0)) + avgK(srcIds, vecs(t0))) / 2)
    assert(math.abs(m0 - expect) < 1e-4,
           s"margin $m0 must match local replay $expect")
  }

  test("ivfPqTopK composes pruning and compression: top-k are " +
       "cluster-mates, and ADC scores agree with the full PQ scan on " +
       "shared pairs") {
    val corpus = clustered
    val ivf = Similarity.ivfIndex(corpus, nCells = 8, seed = 42L)
    val pq  = Similarity.pqIndex(corpus, nSub = 4, nCodes = 16,
                                 seed = 42L)
    val queries = corpus.filter(col("vec_id") < 10)
    val out = Similarity.ivfPqTopK(ivf, pq, queries, k = 5, nProbe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val mates = out.count { case (q, c, _) => (c - q) % 20 == 0 }
    assert(mates.toDouble / out.length >= 0.9,
           s"probed-cell ADC top-5 must be cluster-mates: " +
             s"$mates/${out.length}")
    val full = Similarity.pqTopK(pq, queries, k = 500)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { case (q, c, adc) =>
      assert(full((q, c)) == adc,
             s"composition must not change the ADC score for ($q,$c)")
    }
  }

  test("mergePqIndex equals encode-over-union against the base " +
       "codebooks, and re-rolling the same delta is a no-op") {
    val base  = clustered.filter(col("vec_id") % 3 =!= 2)
    val delta = clustered.filter(col("vec_id") % 3 === 2)
    val idx = Similarity.pqIndex(base, nSub = 4, nCodes = 16, seed = 42L)
    def rows(i: Similarity.PqIndex) =
      i.codes.orderBy("corpus_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toSeq
    val rolled = Similarity.mergePqIndex(idx, delta)
    val rebuilt = idx.copy(codes = Similarity.pqAssignCodes(
      idx.codebooks,
      clustered.select(col("vec_id").as("corpus_id"),
                       col("embedding").as("cvec")),
      idx.subDim))
    assert(rows(rolled) == rows(rebuilt),
           "roll must equal encode-over-union on fixed codebooks")
    assert(rows(Similarity.mergePqIndex(rolled, delta)) == rows(rolled),
           "re-rolling the same delta must be idempotent")
  }

  test("pq index round-trips through the store with identical codes, " +
       "codebooks, and recovered subspace geometry") {
    val idx = Similarity.pqIndex(clustered, nSub = 4, nCodes = 16,
                                 seed = 42L)
    IndexStore.savePqIndex(idx, "graft_test_pq_rt")
    val back = IndexStore.loadPqIndex(spark, "graft_test_pq_rt")
    assert(back.nSub == 4 && back.subDim == 4)
    def rows(i: Similarity.PqIndex) =
      i.codes.orderBy("corpus_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toSeq
    assert(rows(back) == rows(idx))
    val cb = back.codebooks.orderBy("sub", "code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val cb0 = idx.codebooks.orderBy("sub", "code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    assert(cb.toSeq == cb0.toSeq)
  }

  test("assignToCells matches the fitted model's own assignment on the " +
       "clustered corpus; mergeIvfIndex equals assign-over-union and " +
       "re-rolls are no-ops") {
    val base  = clustered.filter(col("vec_id") % 3 =!= 2)
    val delta = clustered.filter(col("vec_id") % 3 === 2)
    val idx = Similarity.ivfIndex(base, nCells = 8, seed = 1L)
    def cells(df: DataFrame) = df.select("corpus_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // the KMeans-free argmin reproduces the model's own assignment
    assert(cells(Similarity.assignToCells(idx.centroids, base)) ==
             cells(idx.assigned))
    val merged = Similarity.mergeIvfIndex(idx, delta)
    assert(cells(merged.assigned) ==
             cells(Similarity.assignToCells(idx.centroids, clustered)),
           "rolled assignment must equal assigning the union corpus")
    val again = Similarity.mergeIvfIndex(merged, delta)
    assert(cells(again.assigned) == cells(merged.assigned),
           "re-rolling the same delta must be a no-op")
    // centroids pass through untouched
    assert(merged.centroids.collect().toSeq ==
             idx.centroids.collect().toSeq)
  }

  test("mergeLshIndex: roll equals a from-scratch rebuild, re-rolls are " +
       "no-ops, and a re-ingested vector is re-hashed") {
    import spark.implicits._
    val base  = clustered.filter(col("vec_id") % 3 =!= 2)
    val delta = clustered.filter(col("vec_id") % 3 === 2)
    def rows(df: DataFrame) = df.select("corpus_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val merged = Similarity.mergeLshIndex(
      Similarity.lshIndex(base, dim = 16, nBits = 8), delta, dim = 16,
      nBits = 8)
    val rebuilt = Similarity.lshIndex(clustered, dim = 16, nBits = 8)
    assert(rows(merged) == rows(rebuilt))
    assert(rows(Similarity.mergeLshIndex(merged, delta, dim = 16,
                                         nBits = 8)) == rows(rebuilt),
           "re-rolling the same delta must be a no-op")
    // a changed vector re-hashes: re-ingest vec 0 with vec 1's embedding
    val swapped = clustered.filter(col("vec_id") === 1L)
      .withColumn("vec_id", lit(0L))
    val reIngested = Similarity.mergeLshIndex(rebuilt, swapped, dim = 16,
                                              nBits = 8)
    val b = rows(rebuilt).toMap
    assert(rows(reIngested).toMap.apply(0L) == b(1L),
           "re-ingested vec 0 must land in vec 1's bucket")
  }

  test("annRecallReport: IVF and LSH side by side from the same exact " +
       "top-k; IVF ≥ LSH on the clustered corpus") {
    val corpus  = clustered
    val queries = corpus.filter(col("vec_id") < 20)
    val rows = graft.operators.LlmQueries.annRecallReport(
      corpus, queries, k = 5, Seq(
        "ivf" -> Similarity.ivfTopK(corpus, queries, k = 5, nCells = 16,
                                    nProbe = 3),
        "lsh" -> Similarity.lshTopK(corpus, queries, k = 5, dim = 16,
                                    nBits = 8)))
      .collect()
    assert(rows.length == 40, "one row per (ranker, query)")
    val byRanker = rows.groupBy(_.getAs[String]("ranker"))
      .view.mapValues(rs =>
        rs.map(_.getAs[Long]("recall_x1000")).sum / rs.length).toMap
    assert(byRanker.keySet == Set("ivf", "lsh"))
    assert(byRanker("ivf") >= byRanker("lsh"),
           s"IVF must not lose to LSH on the clustered corpus: $byRanker")
    assert(byRanker("ivf") >= 900L,
           s"clustered-corpus IVF mean recall ${byRanker("ivf")} < 900")
  }

  test("kNN label vote: perfect on cluster-labeled embeddings, majority/tie rules exact") {
    import spark.implicits._
    // label = cluster id on the clustered corpus -> 5-NN vote must be
    // perfect (cluster-mates dominate every neighborhood)
    val labeled = clustered.withColumn(
      "label", (col("vec_id") % 20).cast("int"))
    // mirror q142's split/vote inline. The held-out set must not swallow
    // a whole cluster (a %10 split would: clusters 0 and 10 sit entirely
    // on multiples of 10) — hold out the first 50 ids instead, leaving
    // ≥20 corpus mates per cluster
    val queries = labeled.filter(col("vec_id") < 50)
    val corpus  = labeled.filter(col("vec_id") >= 50)
    val votes = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .join(corpus.select(col("vec_id").as("corpus_id"),
                          col("label").as("n_label")), Seq("corpus_id"))
      .groupBy("query_id", "n_label").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("n"), asc("n_label"))
    val pred = votes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
    val joined = queries.select(col("vec_id").as("query_id"), col("label"))
      .join(pred, Seq("query_id"))
    assert(joined.filter(col("n_label") =!= col("label")).count() == 0,
           "cluster-labeled 5-NN vote must be perfect")
    // the real q142 runs end-to-end and stays deterministic
    val out = graft.operators.LlmQueries.q142KnnEval(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    assert(out.toSeq == graft.operators.LlmQueries
             .q142KnnEval(spark, sf0001).collect().toSeq)
  }

  test("cellBalancedSample: ≤k per cell, every populated cell represented, " +
       "ranks dense from 1, and the sample NESTS as k grows") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val index = Similarity.ivfIndex(emb, nCells = 8, seed = 42L)
    val s5  = Similarity.cellBalancedSample(index, k = 5)
    val s10 = Similarity.cellBalancedSample(index, k = 10)
    val per5 = s5.groupBy("cell").agg(count(lit(1)).as("n"),
                                      min("rank").as("mn"),
                                      max("rank").as("mx")).collect()
    val cellSizes = index.assigned.groupBy("cell")
      .agg(count(lit(1)).as("sz")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(per5.map(_.getInt(0)).toSet == cellSizes.keySet,
           "every populated cell must be represented")
    per5.foreach { r =>
      val want = math.min(5L, cellSizes(r.getInt(0)))
      assert(r.getLong(1) == want && r.getLong(2) == 1L &&
               r.getLong(3) == want,
             s"cell ${r.getInt(0)}: dense ranks 1..$want expected")
    }
    // nesting: the k=5 winners are exactly the rank≤5 slice of k=10
    val a = s5.select("cell", "corpus_id", "rank").orderBy("cell", "rank")
      .collect().toSeq
    val b = s10.filter(col("rank") <= 5)
      .select("cell", "corpus_id", "rank").orderBy("cell", "rank")
      .collect().toSeq
    assert(a == b)
  }

  test("cosineArgmax native kernel ≡ HOF twin on the corpus; empty " +
       "candidates yield (null, null, 0)") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val e = emb.filter(col("vec_id") % 10 === 3)
      .select(struct(col("vec_id").cast("long").as("eid"),
                     col("embedding").as("ev")).as("__e"))
      .agg(collect_list("__e").as("evs"))
    val t = emb.filter(col("vec_id") % 10 =!= 3)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(e))
    val native = t.select(
      col("vec_id"),
      Similarity.cosineArgmax(col("embedding"), col("evs"), 0.3).as("m"))
      .orderBy("vec_id").collect().toSeq
    val hof = t.select(
      col("vec_id"),
      Similarity.cosineArgmaxHof(col("embedding"), col("evs"), 0.3)
        .as("m"))
      .orderBy("vec_id").collect().toSeq
    assert(native == hof, "fused kernel must be bit-identical to the HOF chain")
    val empty = t.limit(1).select(
      Similarity.cosineArgmax(col("embedding"),
                              slice(col("evs"), 1, 0), 0.3).as("m"))
      .collect().head.getStruct(0)
    assert(empty.isNullAt(0) && empty.isNullAt(1) && empty.getLong(2) == 0L)
  }

  test("cell purity (q159): counts cover the corpus, majority is within " +
       "bounds, and the report is deterministic") {
    val out = graft.operators.LlmQueries.q159CellPurity(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    val nVecs = graft.sources.Tables.embeddings(spark, sf0001).count()
    assert(out.map(_.getLong(1)).sum == nVecs,
           "per-cell n_vecs must cover every vector exactly once")
    out.foreach { r =>
      val (n, nl, mn, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(mn >= 1 && mn <= n)
      assert(nl >= 1 && nl <= n)
      // majority share ≥ 1/n_labels by pigeonhole; ppm floor respects it
      assert(ppm >= 1000000L / (nl * n) && ppm <= 1000000L)
      assert(ppm == mn * 1000000L / n)
    }
    assert(out.toSeq == graft.operators.LlmQueries
             .q159CellPurity(spark, sf0001).collect().toSeq)
  }

  test("binary sign ANN (q208): signatures match a Scala bit replay " +
       "incl. bit 63, hamming pass plans as WindowGroupLimit, recall " +
       "vs exact is honest") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    // signature replay on a sample, incl. the sign-wrap bit 63
    val sigs = Similarity.withSignBits(emb.filter(col("vec_id") < 20))
      .select("vec_id", "sig", "embedding").collect()
    sigs.foreach { r =>
      val v = r.getSeq[Float](2)
      val expect = v.zipWithIndex.foldLeft(0L) {
        case (acc, (x, i)) => if (x > 0f) acc + (1L << i) else acc
      }
      assert(r.getLong(1) == expect, s"vec ${r.getLong(0)}")
    }
    assert(sigs.exists(_.getLong(1) < 0L),
           "bit 63 must be exercised (negative word) on 64-dim data")
    val df = graft.operators.LlmQueries.queries("q208_binary_ann")(
      spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
           s"hamming rank must group-limit map-side:\n$plan")
    // recall@10 vs the exact ranking — binary sketches are lossy on
    // near-random vectors; pin a floor, not a fantasy
    val exact = Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.3, f"recall@10 $recall%.2f below floor")
  }

  test("MRL truncation recall (q210): the full-width ranker is a " +
       "perfect sanity row and mean recall is monotone in prefix width") {
    val rows = graft.operators.LlmQueries
      .queries("q210_mrl_recall")(spark, sf0001).collect()
    val byDim = rows.groupBy(_.getString(0))
      .map { case (d, rs) =>
        d -> rs.map(_.getLong(3)).sum.toDouble / rs.map(_.getLong(2)).sum
      }
    assert(byDim("dim64") == 1.0,
           "full-width ranking must equal the exact reference")
    val order = Seq("dim08", "dim16", "dim32", "dim64").map(byDim)
    assert(order.sliding(2).forall(p => p.head <= p.last),
           s"recall must not decrease with width: $order")
    rows.foreach(r => assert(r.getLong(4) ==
      r.getLong(3) * 1000L / math.max(r.getLong(2), 1L)))
  }

  test("resultDiversity: a clustered corpus yields redundant result " +
       "pages (high mean pairwise cosine), the random driver corpus " +
       "low ones; pair counts are k(k-1)/2 and a driver recompute " +
       "matches exactly") {
    // clustered: top-10 of a member are its cluster-mates → redundant
    val clRows = Similarity.resultDiversity(
      clustered, clustered.filter(col("vec_id") < 3), k = 10)
      .collect()
    clRows.foreach { r =>
      assert(r.getLong(1) == 45L)
      assert(r.getDouble(2) > 0.9,
             s"cluster-mate pages must be redundant: ${r.getDouble(2)}")
    }
    // random 64-dim corpus: near-orthogonal results
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val rnd = graft.operators.LlmQueries
      .queries("q247_ann_diversity")(spark, sf0001).collect()
    assert(rnd.length == 5)
    rnd.foreach { r =>
      assert(r.getLong(1) == 45L)
      assert(math.abs(r.getDouble(2)) < 0.5, "random corpus pages " +
             s"must not be redundant: ${r.getDouble(2)}")
      assert(r.getDouble(3) >= r.getDouble(2) &&
               r.getDouble(2) >= r.getDouble(4))
    }
    // driver recompute of query 0's mean from the exact top-10
    val ids = Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 10)
      .collect().map(_.getLong(1))
    val vecs = emb.filter(col("vec_id").isin(ids: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val dx = x.map(_.toDouble); val dy = y.map(_.toDouble)
      val d = dx.zip(dy).map { case (p, q) => p * q }.sum
      d / (math.sqrt(dx.map(v => v * v).sum) *
             math.sqrt(dy.map(v => v * v).sum))
    }
    val pairs = for {
      i <- ids; j <- ids if i < j
    } yield BigDecimal(cos(vecs(i), vecs(j)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val mean = math.floor(
      pairs.sum.toDouble / pairs.length * 1000000.0 + 0.5) / 1000000.0
    assert(rnd.find(_.getLong(0) == 0L).get.getDouble(2) == mean)
  }

  test("q248 hubness audit: 20 HUB rows ranked by in-degree with id " +
       "tie-break, SUMMARY carries the max degree and a coverage ppm " +
       "≤ 1e6, and a driver recount from the exact top-10 matches") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.LlmQueries
      .queries("q248_hubness_audit")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3)))
    val hubs = rows.filter(_._1 == "HUB").sortBy(_._4)
    val sm = rows.find(_._1 == "SUMMARY").get
    assert(hubs.length == 20 && rows.length == 21)
    hubs.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
               s"rank order broken: $a then $b")
      case _ =>
    }
    assert(sm._3 == hubs.head._3, "SUMMARY max = top hub degree")
    assert(sm._4 > 0L && sm._4 <= 1000000L, "coverage ppm bounded")
    // driver recount over the same sampled exact top-10
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val deg = Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") % 50 === 0),
                      k = 10)
      .collect().groupBy(_.getLong(1)).map { case (c, rs) =>
        c -> rs.length.toLong }
    hubs.foreach { case (_, cid, d, _) => assert(deg(cid) == d) }
    assert(sm._3 == deg.values.max)
  }

  test("withSignBits enforces dims ≤ 64: an oversized vector raises " +
       "loudly (shiftleft would silently wrap bit i onto i−64 and " +
       "corrupt hamming rankings); conforming rows are unchanged") {
    import spark.implicits._
    // 64 positive components → all 64 bits set → the word is -1L
    val ok = Seq((1L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.withSignBits(ok).select("sig").head.getLong(0)
             == -1L)
    val bad = Seq((2L, Array.fill(65)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](Similarity.withSignBits(bad).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(msgs.exists(_.contains("withSignBits: dims must be <= 64")),
           s"expected the guard message in the cause chain, got: $msgs")
  }
}
