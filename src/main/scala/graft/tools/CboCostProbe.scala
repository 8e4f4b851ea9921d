package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev probe (round-16): attribute the CBO-regime cost on a named
  * query — compile time (analysis→physical planning, where the
  * BasicStatsPlanVisitor runs) versus full execution (where AQE
  * re-optimizes per stage and pays the visitor again per re-plan),
  * under cbo off/on at identical host conditions. Usage:
  *   runMain graft.tools.CboCostProbe <sfDir> q… q…
  */
object CboCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-cbo-cost")
    val (dirs, names) = args.partition(_.startsWith("/"))
    val dir = dirs.headOption.getOrElse("/root/testdata/sf0.1")
    val mapping = CboAnchors.ensureTables(spark, dir)
    CboAnchors.publishAll(spark, mapping)
    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (q <- names; cbo <- Seq("false", "true")) {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo)
      // warmup
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val compile = (1 to 3).map { _ =>
        timed(SparkEntry.queries(q)(spark, dir)
          .queryExecution.executedPlan)
      }.min
      val full = (1 to 3).map { _ =>
        timed(SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save())
      }.min
      println(f"[cbocost] $q cbo=$cbo compile=$compile%.3f s " +
        f"full=$full%.3f s exec=${full - compile}%.3f s")
    }
    spark.stop()
  }
}
