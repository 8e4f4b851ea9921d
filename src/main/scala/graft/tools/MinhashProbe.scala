package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.Dedup
import graft.sources.Tables

/** Scratch profiler for the q35 minhash dedup stages (not part of the
  * driver contract; run via `runMain graft.tools.MinhashProbe`).
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32", "minhash-probe")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("scan")(noop(docs))

    // signature table alone (portable family, matching q35's params)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def md5Prefix60(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.Md5Prefix60Expr(
        ColumnBridge.expression(c)))
    def permSig(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.PermMinSigExpr(
        ColumnBridge.expression(c), 32))
    val sigsPlain = docs.select(
      col("doc_id"), Dedup.normalizeText(col("text")).as("norm"))
      .select(col("doc_id"), Dedup.shinglesOfNorm(col("norm"), 3).as("sh"))
      .withColumn("shh", md5Prefix60(col("sh")))
      .withColumn("sig", permSig(col("shh")))
      .select("doc_id", "sig", "shh")
    time("sigTable")(noop(sigsPlain))
    time("sigTable2")(noop(sigsPlain))

    time("candidatePairs")(noop(
      Dedup.minhashCandidatePairsPortable(docs, "doc_id", "text",
                                          k = 3, numHashes = 32, bands = 8,
                                          threshold = 0.5)))
    time("fullMinhash")(noop(
      Dedup.minhashPortable(docs, "doc_id", "text",
                            k = 3, numHashes = 32, bands = 8,
                            threshold = 0.5)))
    time("fullMinhash2")(noop(
      Dedup.minhashPortable(docs, "doc_id", "text",
                            k = 3, numHashes = 32, bands = 8,
                            threshold = 0.5)))
    // xxhash64 family for comparison
    time("fullMinhashXx")(noop(
      Dedup.minhash(docs, "doc_id", "text",
                    k = 3, numHashes = 32, bands = 8, threshold = 0.5)))
    val pairs = Dedup.minhashCandidatePairsPortable(
      docs, "doc_id", "text", k = 3, numHashes = 32, bands = 8,
      threshold = 0.5)
    println(s"[probe] verified pairs k=3: ${pairs.count()}")
    time("fullMinhashK5")(noop(
      Dedup.minhashPortable(docs, "doc_id", "text",
                            k = 5, numHashes = 32, bands = 8,
                            threshold = 0.5)))
    val pairs5 = Dedup.minhashCandidatePairsPortable(
      docs, "doc_id", "text", k = 5, numHashes = 32, bands = 8,
      threshold = 0.5)
    println(s"[probe] verified pairs k=5: ${pairs5.count()}")
    val dups5 = Dedup.minhashPortable(docs, "doc_id", "text", k = 5)
      .filter(col("is_duplicate")).count()
    println(s"[probe] k=5 duplicate docs: $dups5")
    // bucket-size profile → raw candidate volume before distinct/verify
    val P = graft.functions.PortableHash.P
    val M = graft.functions.PortableHash.M
    val bandArr = array((0 until 8).map { b =>
      (0 until 4).foldLeft(lit((b + 1).toLong)) { (acc, j) =>
        (acc * M + element_at(col("sig"), b * 4 + j + 1)) % P
      }
    }: _*)
    val banded = sigsPlain.select(col("doc_id"), posexplode(bandArr))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val prof = banded.groupBy("band", "bucket").count()
      .agg(count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
           sum(col("count") * (col("count") - 1) / 2).as("raw_cand_pairs"))
      .collect()(0)
    println(s"[probe] buckets=${prof.get(0)} maxBucket=${prof.get(1)} " +
            s"rawCandPairs=${prof.get(2)}")
    spark.stop()
  }
}
