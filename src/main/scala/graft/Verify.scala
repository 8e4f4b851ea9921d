package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** SparkEntry.oracleSql (keys passing `keep`) as a JSON object string —
    * the exact artifact the driver's DuckDB compare consumes. */
  private[graft] def oracleJson(keep: String => Boolean = _ => true): String =
    SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-verify")
    // Same standing optimizer posture as Bench (round-16): anchor-table
    // statistics published, cbo + joinReorder on — so the round's
    // correctness artifact itself proves every query hash-green UNDER
    // the operating regime, not beside it. SPARK_GRAFT_VERIFY_NOCBO=1
    // restores the stats-blind control.
    if (!sys.env.get("SPARK_GRAFT_VERIFY_NOCBO").exists(_ == "1")) {
      val mapping = graft.tools.CboAnchors.ensureTables(spark, sfDir)
      graft.tools.CboAnchors.publishAll(spark, mapping)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      System.err.println("[verify] cbo regime ON: statistics published " +
        s"on ${mapping.size} anchor catalog tables")
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson())
    spark.stop()
  }
}
