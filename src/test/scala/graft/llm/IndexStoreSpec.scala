package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The daily-ingest contract: an index built yesterday must classify
  * today's batch FROM DISK — save → load → classify byte-identical to the
  * in-memory index, with the loaded (bucketed) side joining Exchange-free.
  */
class IndexStoreSpec extends SparkSpec {

  private def corpusBatch: (DataFrame, DataFrame) = {
    import spark.implicits._
    val corpusText = "the quick brown fox jumps over the lazy dog near " +
      "the quiet river bank while morning light settles on the water"
    val corpus = Seq(
      (10L, corpusText),
      (11L, "an entirely different corpus document about compilers and " +
            "register allocation strategies in modern optimizing backends"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, corpusText),
      (2L, corpusText.replace("morning", "evening")),
      (3L, "novel text about oceanic plate tectonics and subduction " +
           "zones forming volcanic island arcs over geologic time"))
      .toDF("doc_id", "text")
    (corpus, batch)
  }

  private def classified(out: DataFrame): Map[Long, (Boolean, Long, Double)] =
    out.collect().map { r =>
      r.getLong(0) -> ((r.getBoolean(1),
                        if (r.isNullAt(2)) -1L else r.getLong(2),
                        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    }.toMap

  test("minhash index save→load→classify is byte-identical to in-memory") {
    val (corpus, batch) = corpusBatch
    val index = Dedup.minhashIndexPortable(corpus, "doc_id", "text")
    val mem = classified(
      Dedup.minhashIncrementalPortable(batch, index, "doc_id", "text"))
    try {
      IndexStore.saveMinhashIndex(index, "idx_rt_mh", numBuckets = 4)
      val loaded = IndexStore.loadMinhashIndex(spark, "idx_rt_mh")
      val disk = classified(
        Dedup.minhashIncrementalPortable(batch, loaded, "doc_id", "text"))
      assert(disk == mem, s"disk=$disk mem=$mem")
      assert(mem(1L) == ((true, 10L, 1.0)))
    } finally IndexStore.drop(spark, "idx_rt_mh")
  }

  test("loaded minhash index joins without index-side Exchanges " +
       "(fewer shuffles than a plain-parquet round-trip)") {
    val (corpus, batch) = corpusBatch
    val index = Dedup.minhashIndexPortable(corpus, "doc_id", "text")
    val plainDir = tmpDir("idx_plain")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      IndexStore.saveMinhashIndex(index, "idx_ex_mh", numBuckets = 4)
      index.buckets.write.mode("overwrite").parquet(s"$plainDir/buckets")
      index.shingles.write.mode("overwrite").parquet(s"$plainDir/shingles")
      val plain = Dedup.MinhashIndex(
        spark.read.parquet(s"$plainDir/buckets"),
        spark.read.parquet(s"$plainDir/shingles"))
      def exchanges(idx: Dedup.MinhashIndex): Int = {
        val df = Dedup.minhashIncrementalPortable(batch, idx,
                                                  "doc_id", "text")
        df.collect()
        "Exchange".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      }
      val bucketed = exchanges(IndexStore.loadMinhashIndex(spark, "idx_ex_mh"))
      val unbucketed = exchanges(plain)
      assert(bucketed < unbucketed,
             s"bucketed index must shuffle less: $bucketed vs $unbucketed")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      IndexStore.drop(spark, "idx_ex_mh")
    }
  }

  test("cross-session load: a FRESH catalog re-registers the index from " +
       "its on-disk descriptor, bucketing intact, and re-save over stale " +
       "files is idempotent") {
    val (corpus, batch) = corpusBatch
    val index = Dedup.minhashIndexPortable(corpus, "doc_id", "text")
    val dir = Some(tmpDir("idx_cs"))
    val mem = classified(
      Dedup.minhashIncrementalPortable(batch, index, "doc_id", "text"))
    try {
      IndexStore.saveMinhashIndex(index, "idx_cs_mh", numBuckets = 4, dir)
      // simulate a fresh session: the per-session catalog forgets the
      // tables (external data stays on disk)
      spark.sql("DROP TABLE IF EXISTS idx_cs_mh_buckets")
      spark.sql("DROP TABLE IF EXISTS idx_cs_mh_shingles")
      val loaded = IndexStore.loadMinhashIndex(spark, "idx_cs_mh", dir)
      val disk = classified(
        Dedup.minhashIncrementalPortable(batch, loaded, "doc_id", "text"))
      assert(disk == mem, s"cross-session disk=$disk mem=$mem")
      // the re-registered table keeps its bucket spec
      val ddl = spark.sql("SHOW CREATE TABLE idx_cs_mh_buckets")
        .head().getString(0)
      assert(ddl.contains("CLUSTERED BY") && ddl.contains("4 BUCKETS"),
             s"bucket spec must survive re-registration:\n$ddl")
      // daily rotation: re-save under the same name from a catalog that
      // forgot the table but with stale files present — must not throw
      spark.sql("DROP TABLE IF EXISTS idx_cs_mh_buckets")
      spark.sql("DROP TABLE IF EXISTS idx_cs_mh_shingles")
      IndexStore.saveMinhashIndex(index, "idx_cs_mh", numBuckets = 4, dir)
      val disk2 = classified(Dedup.minhashIncrementalPortable(
        batch, IndexStore.loadMinhashIndex(spark, "idx_cs_mh", dir),
        "doc_id", "text"))
      assert(disk2 == mem)
    } finally IndexStore.drop(spark, "idx_cs_mh")
  }

  test("fingerprint index save→load→classify matches in-memory") {
    import spark.implicits._
    val corpus = Seq((10L, "alpha beta gamma"), (11L, "delta epsilon"))
      .toDF("doc_id", "text")
    val batch = Seq((1L, "Alpha   beta GAMMA"), (2L, "novel zeta"))
      .toDF("doc_id", "text")
    val index = Dedup.fingerprintIndex(corpus, "doc_id", "text")
    def run(idx: DataFrame) =
      Dedup.exactIncremental(batch, idx, "doc_id", "text")
        .collect().map(_.toSeq).toSet
    try {
      IndexStore.saveFingerprintIndex(index, "idx_rt_fp", numBuckets = 4)
      assert(run(IndexStore.loadFingerprintIndex(spark, "idx_rt_fp")) ==
               run(index))
    } finally IndexStore.drop(spark, "idx_rt_fp")
  }

  test("lsh and ivf ANN indexes round-trip through disk with identical " +
       "top-k results") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val dim = 8
    val vecs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(dim)(rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)

    val lsh = Similarity.lshIndex(vecs, dim, nBits = 4)
    val ivf = Similarity.ivfIndex(vecs, nCells = 4)
    def lshRun(idx: DataFrame) =
      Similarity.lshTopKWithIndex(idx, queries, k = 3, dim, nBits = 4)
        .collect().map(_.toSeq).toSeq
    def ivfRun(idx: Similarity.IvfIndex) =
      Similarity.ivfTopKWithIndex(idx, queries, k = 3)
        .collect().map(_.toSeq).toSeq
    try {
      IndexStore.saveLshIndex(lsh, "idx_rt_lsh", numBuckets = 4)
      IndexStore.saveIvfIndex(ivf, "idx_rt_ivf", numBuckets = 4)
      assert(lshRun(IndexStore.loadLshIndex(spark, "idx_rt_lsh")) ==
               lshRun(lsh))
      assert(ivfRun(IndexStore.loadIvfIndex(spark, "idx_rt_ivf")) ==
               ivfRun(ivf))
    } finally {
      IndexStore.drop(spark, "idx_rt_lsh")
      IndexStore.drop(spark, "idx_rt_ivf")
    }
  }
}
