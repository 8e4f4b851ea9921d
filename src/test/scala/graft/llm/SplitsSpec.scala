package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {

  private val tvt = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("thresholds60 are exact cumulative fractions of the 60-bit space") {
    val ts = Splits.thresholds60(Seq(0.8, 0.1, 0.1))
    val space = BigDecimal(1L << 60)
    assert(ts.head == (BigDecimal("0.8") * space).toLong)
    assert(ts(1) == (BigDecimal("0.9") * space).toLong)
    assert(ts(2) == (1L << 60))
    intercept[IllegalArgumentException](Splits.thresholds60(Seq(0.5, 0.4)))
    intercept[IllegalArgumentException](Splits.thresholds60(Seq(1.2, -0.2)))
  }

  test("every member of a cluster gets the SAME split; leakage audit empty") {
    import spark.implicits._
    // 200 clusters of 5 members each
    val clusters = (0L until 1000L).map(d => (d, d / 5 * 5))
      .toDF("doc_id", "cluster_id")
    val assigned = Splits.clusterAwareSplit(clusters, tvt)
    assert(assigned.count() == 1000)
    assert(Splits.splitLeakage(assigned).count() == 0)
    val perCluster = assigned.groupBy("cluster_id")
      .agg(countDistinct("split").as("k")).agg(max("k")).head().getLong(0)
    assert(perCluster == 1L)
  }

  test("split proportions land near fractions over many clusters") {
    import spark.implicits._
    val clusters = (0L until 5000L).map(d => (d, d)).toDF("doc_id", "cluster_id")
    val byName = Splits.clusterAwareSplit(clusters, tvt)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byName("train") / 5000.0 - 0.8) < 0.03)
    assert(math.abs(byName("val") / 5000.0 - 0.1) < 0.02)
    assert(math.abs(byName("test") / 5000.0 - 0.1) < 0.02)
  }

  test("assignment is deterministic and seed-sensitive") {
    import spark.implicits._
    val clusters = (0L until 300L).map(d => (d, d)).toDF("doc_id", "cluster_id")
    val a = Splits.clusterAwareSplit(clusters, tvt).collect().toSet
    val b = Splits.clusterAwareSplit(clusters, tvt).collect().toSet
    assert(a == b)
    val c = Splits.clusterAwareSplit(clusters, tvt, seed = "other")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val base = Splits.clusterAwareSplit(clusters, tvt)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert((0L until 300L).exists(d => c(d) != base(d)))
  }

  test("near-duplicates never straddle the boundary end-to-end (minhash)") {
    import spark.implicits._
    // 30 templates × 3 near-identical variants — minhash clusters them
    val docs = (0 until 90).map { i =>
      val t = i / 3
      val body = s"shared template body number $t with plenty of common " +
        s"text reused across variants of the same underlying document $t " +
        "and enough length that five-gram shingles overlap heavily"
      (i.toLong, if (i % 3 == 0) body else body + s" tail${i % 3}")
    }.toDF("doc_id", "text")
    val clusters = Dedup.minhashPortable(docs, "doc_id", "text",
                                         k = 5, numHashes = 32, bands = 8,
                                         threshold = 0.5)
    val assigned = Splits.clusterAwareSplit(clusters, tvt)
    assert(Splits.splitLeakage(assigned).count() == 0)
    // sanity: clustering actually merged the variants
    assert(clusters.filter(col("is_duplicate")).count() > 0)
  }

  test("pairLeakage: flags exactly the pairs whose endpoints straddle " +
       "splits; empty when the split respects the pair graph") {
    import spark.implicits._
    val assigned = Seq((1L, 10L, "train"), (2L, 10L, "train"),
                       (3L, 30L, "test"), (4L, 30L, "test"))
      .toDF("doc_id", "cluster_id", "split")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val leaks = Splits.pairLeakage(assigned, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(leaks == Set((2L, 3L)),
           s"only the straddling pair must be flagged: $leaks")
    val aligned = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    assert(Splits.pairLeakage(assigned, aligned).count() == 0)
  }

  test("union-closure split (q150): BOTH the minhash and the semantic " +
       "pair audits are empty on the real corpus") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf0001)
    val emb  = Tables.embeddings(spark, sf0001)
    val assigned = graft.operators.LlmQueries
      .queries("q150_union_split")(spark, sf0001)
    assert(Splits.splitLeakage(assigned).count() == 0)
    val mhPairs = Dedup.minhashCandidatePairsPortable(
      docs, "doc_id", "text",
      k = 5, numHashes = 32, bands = 8, threshold = 0.5)
    assert(Splits.pairLeakage(assigned, mhPairs).count() == 0,
           "no verified minhash pair may straddle the union split")
    val semPairs = Dedup.semanticPairs(
      Similarity.ivfIndex(emb, nCells = 8, seed = 42L), threshold = 0.25)
    assert(Splits.pairLeakage(assigned, semPairs).count() == 0,
           "no semantic pair may straddle the union split")
  }
}
