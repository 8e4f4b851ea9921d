package graft.tools

import java.nio.file.{Files, Paths}

/** Dev loop: run a SUBSET of SparkEntry.queries against an sf dir and dump
  * result parquet + oracle SQL for a local DuckDB compare — the same
  * artifacts Verify produces, without paying for all ~90 queries while
  * iterating on one. Usage:
  *   runMain graft.tools.QuickVerify <sfDir> <outDir> <query> [<query> ...]
  */
object QuickVerify {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val names  = args.drop(2).toSeq
    val spark  = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-quick-verify")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(s"[quick-verify] wrote $name")
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
                      graft.Verify.oracleJson(names.contains))
    spark.stop()
  }
}
