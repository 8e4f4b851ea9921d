package graft.tools

import graft.operators.LlmQueries

/** Scratch timing for the q70 funnel (dev tool). */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32", "funnel-probe")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("warmup")(noop(LlmQueries.q70CurationFunnel(spark, dir)))
    time("funnel")(noop(LlmQueries.q70CurationFunnel(spark, dir)))
    time("funnel2")(noop(LlmQueries.q70CurationFunnel(spark, dir)))
    spark.stop()
  }
}
