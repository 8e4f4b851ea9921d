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
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
