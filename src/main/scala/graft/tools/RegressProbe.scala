package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.{BpeTrainer, Contamination, Dedup}
import graft.sources.Tables

/** Scratch profiler for the r7-flagged q101/q89 bench drifts (not part of
  * the driver contract; run via `runMain graft.tools.RegressProbe`).
  * Prints per-stage wall times AND the data-volume counters that would
  * move if the cost drifted for a real reason (vocab rows, merge count,
  * gram rows, rare-fp count, join hits, emitted spans).
  */
object RegressProbe {
  def main(args: Array[String]): Unit = {
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32", "regress-probe")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, dir)
    time("scan")(noop(docs))
    time("scan2")(noop(docs))

    // ---- q101 stages ----
    val wc = BpeTrainer.wordCounts(docs, "text")
    time("q101.wordCounts")(noop(wc))
    println(s"[probe] q101 vocab rows: ${wc.count()}")
    val merges = time("q101.fitMerges (driver loop)")(
      BpeTrainer.fitMerges(wc, numMerges = 40))
    println(s"[probe] q101 merges learned: ${merges.length}")
    val applied = docs.select(col("doc_id"),
        BpeTrainer.tokenStream(col("text"), merges).as("stream"))
      .select(col("doc_id"),
              size(filter(split(col("stream"), " "), t => length(t) > 0))
                .cast("long").as("n_bpe_tokens"),
              md5(col("stream").cast("binary")).as("tokens_md5"))
    time("q101.apply")(noop(applied))
    time("q101.apply2")(noop(applied))
    time("q101.apply+sort")(noop(applied.orderBy("doc_id")))

    // ---- q89 stages (params = the q89 query's) ----
    val g = Contamination.gramFingerprintsPos(docs, "doc_id", "text", 6)
    time("q89.gramFps")(noop(g))
    println(s"[probe] q89 gram rows: ${g.count()}")
    val rare = g.select("gram_fp", "doc_id").distinct()
      .groupBy("gram_fp").agg(count(lit(1)).as("nd"))
      .filter(col("nd") <= 50)
    println(s"[probe] q89 rare fps kept: ${rare.count()}")
    val spans = Dedup.sharedSubstringSpans(docs, "doc_id", "text",
                                           n = 6, minTokens = 10,
                                           maxGramDocs = 50)
    time("q89.full")(noop(spans))
    time("q89.full2")(noop(spans))
    println(s"[probe] q89 emitted spans: ${spans.count()}")
    spark.stop()
  }
}
