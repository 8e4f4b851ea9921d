package graft

/** Scratch plan auditor (not part of the driver contract): prints final
  * adaptive plans of scale-critical queries after execution.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
                               "graft-planaudit")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (name <- args.drop(1)) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
