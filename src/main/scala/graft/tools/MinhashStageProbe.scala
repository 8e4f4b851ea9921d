package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, DedupProbeBridge}
import graft.sources.Tables

/** Round-17 stage decomposition of the portable MinHash pairs pipeline
  * (q35/q70/q82/q85/q149/q249 route through it): separate noop timings
  * for the banded explode, the bucket guard, the salted self-join +
  * distinct, and the shingle-join verify, plus candidate/verified row
  * counts and the executed plan of the verify stage. Measured round-17:
  * sig table 0.33 s, banded 0.05 s, +guard 0.43 s, +self-join/distinct
  * 0.92 s, +verify 2.6 s at sf0.1 — the verify's broadcast-hash shingle
  * joins and per-pair kernel dominate; the banded explode is cheap to
  * recompute (which is why pairsFromSigTable does NOT pin it).
  */
object MinhashStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-mh2")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    noop(docs)
    val sigs = DedupProbeBridge.sigTable(docs, "doc_id", "text", 5, 32)
    // rebuild pipeline stages inline (mirrors pairsFromSigTable)
    val numHashes = 32; val bands = 8; val S = 8
    val bob = DedupProbeBridge.bucketOfBand(numHashes, bands)
    val bandArr = array((0 until bands).map(bob): _*)
    val banded = sigs.select(col("doc_id"), posexplode(bandArr))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    import org.apache.spark.sql.expressions.Window
    val bucketW = Window.partitionBy("band", "bucket")
    val pruned = banded.withColumn("bsize", count(lit(1)).over(bucketW))
      .filter(col("bsize") <= 1000).drop("bsize")
    val a = pruned.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
      .withColumn("salt", pmod(xxhash64(col("doc_a")), lit(S)).cast("int"))
    val b = pruned.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
      .withColumn("salt", explode(array((0 until S).map(lit): _*)))
    val cand = a.join(b, Seq("band", "bucket", "salt"))
      .filter(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct()
    val shA = sigs.select(col("doc_id").as("doc_a"), col("shh").as("sh_a"))
    val shB = sigs.select(col("doc_id").as("doc_b"), col("shh").as("sh_b"))
    val verified = cand.join(shA, Seq("doc_a")).join(shB, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              Dedup.jaccardLong(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    // warmup all
    noop(verified)
    for (p <- 1 to 2) {
      println(s"-- pass $p")
      time("banded")(noop(banded))
      time("pruned(window)")(noop(pruned))
      time("cand(selfjoin+distinct)")(noop(cand))
      time("verified(pairs)")(noop(verified))
      println("cand rows: " + cand.count() + ", verified rows: " + verified.count())
    }
    println(verified.queryExecution.executedPlan.toString.take(9000))
    spark.stop()
  }
}
