package graft.tools

import java.nio.file.{Files, Paths}

/** Write `.explain("formatted")` of named queries to files — the
  * round-17 plan evidence (`plans/r17/<query>_{before,after}.txt`).
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <sfDir> q… q…
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1); val sfDir = args(2)
    val names = args.drop(3).toSeq
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-explain-dump")
    // bench regime: CBO on with published anchor stats
    val mapping = CboAnchors.ensureTables(spark, sfDir)
    CboAnchors.publishAll(spark, mapping)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    new java.io.File(outDir).mkdirs()
    for (q <- names) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${q}_$suffix.txt"), txt)
        println(s"[explain-dump] wrote ${q}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[explain-dump] $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
