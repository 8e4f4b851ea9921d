package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch profiler for the round-13 view_erasure ×20 anomaly (not part
  * of the driver contract): stage-by-stage wall times + volume counters
  * for the q275 cascade over a replicated corpus.
  */
object ErasureProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-erasureprobe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val o = (0 until n).map(i => Tables.orders(spark, dir)
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * 10000000L))
      .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val l = (0 until n).map(i => Tables.lineitem(spark, dir)
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val erase0 = Tables.table(spark, dir, "customer")
      .filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("o_custkey"))

    val standing = time("standing (materialize)") {
      graft.Materialize(
        graft.operators.ViewMaintenance.orderRevenueView(o, l))
    }
    println(s"[probe] standing rows = ${standing.count()}")

    val erase = time("gate(erase)") {
      graft.operators.RelationalQueries.gatedBroadcast(erase0)
    }
    val deadOrders0 = o.join(erase, Seq("o_custkey"), "left_semi")
      .select(col("o_orderkey").as("l_orderkey"))
    val deadOrders = time("gate(deadOrders)") {
      graft.operators.RelationalQueries.gatedBroadcast(deadOrders0)
    }
    val changelog = l.join(deadOrders, Seq("l_orderkey"), "left_semi")
      .withColumn("op", lit(-1))
    time("changelog noop")(noop(changelog))
    println(s"[probe] changelog rows = ${changelog.count()}")
    val deltaOrders = o.join(
      changelog.select(col("l_orderkey").as("o_orderkey")).distinct,
      Seq("o_orderkey"), "left_semi")
    time("deltaOrders noop")(noop(deltaOrders))
    val chC = changelog.localCheckpoint(true)
    val doC = deltaOrders.localCheckpoint(true)
    time("retract (ckpt inputs)") {
      noop(graft.operators.ViewMaintenance
        .orderRevenueRetractRoll(standing, doC, chC)
        .select(col("o_orderkey"), col("o_custkey"),
                col("o_orderpriority"), col("n_items"),
                col("revenue").cast("string").as("revenue"))
        .orderBy("o_orderkey"))
    }
    time("retract (live inputs)") {
      noop(graft.operators.ViewMaintenance
        .orderRevenueRetractRoll(standing, deltaOrders, changelog)
        .select(col("o_orderkey"), col("o_custkey"),
                col("o_orderpriority"), col("n_items"),
                col("revenue").cast("string").as("revenue"))
        .orderBy("o_orderkey"))
    }
    time("viewErasureOver (full)") {
      noop(graft.operators.RelationalQueries
        .viewErasureOver(o, l, standing, erase0))
    }
    spark.stop()
  }
}
