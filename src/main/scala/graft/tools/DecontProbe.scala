package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.{Contamination, Dedup}
import graft.sources.Tables

/** Scratch profiler for q67 decontamination stages (not part of the
  * driver contract; run via `runMain graft.tools.DecontProbe`).
  */
object DecontProbe {
  def main(args: Array[String]): Unit = {
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32", "decont-probe")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs  = Tables.documents(spark, dir)
    val train = docs.filter(col("doc_id") % 10 =!= 7)
    val eval  = docs.filter(col("doc_id") % 10 === 7)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup scan
    time("scan")(noop(docs))
    val trainG = Contamination.gramFingerprints(train, "doc_id", "text", 8)
    time("trainGrams")(noop(trainG))
    time("trainGrams2")(noop(trainG))
    val evalG = Contamination.gramFingerprints(eval, "doc_id", "text", 8)
      .select("gram_fp").distinct()
    time("evalGramsDistinct")(noop(evalG))
    // tokens only / grams only, to separate tokenize vs gram-build vs md5
    val toks = train.select(col("doc_id"),
                            Dedup.wordTokens(col("text")).as("t"))
    time("tokens")(noop(toks))
    val grams = toks.select(col("doc_id"),
                            Dedup.wordNgrams(col("t"), 8).as("g"))
    time("grams")(noop(grams))
    val gramsExpl = grams.select(col("doc_id"), explode(col("g")).as("g"))
    time("gramsExplode")(noop(gramsExpl))
    val gramsMd5 = gramsExpl.select(col("doc_id"),
                                    md5(col("g").cast("binary")).as("fp"))
    time("gramsMd5")(noop(gramsMd5))
    time("fullReport")(noop(
      Contamination.contaminationReport(train, eval, "doc_id", "text", 8)))
    time("fullReport2")(noop(
      Contamination.contaminationReport(train, eval, "doc_id", "text", 8)))
    spark.stop()
  }
}
