package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev tool: print the executed physical plan of named SparkEntry
  * queries (the `.explain`-and-iterate loop the scale brief
  * prescribes). Usage:
  *   runMain graft.tools.ExplainQuery [sfDir] q… q…
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-explain")
    val (dirs, names) = args.partition(_.startsWith("/"))
    val dir = dirs.headOption.getOrElse("/root/testdata/sf0.01")
    for (q <- names) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
