package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourcePercentileSpec extends SparkSpec {

  test("q254: percentiles are 0-based strict ranks in ppm (min 0 per " +
       "source, max < 1e6, monotone in score within a source), and " +
       "the corpus is never sorted — one broadcast histogram join") {
    val df = LlmQueries.queries("q254_source_percentile")(spark, sf0001)
    val rows = df.collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).values.foreach { src =>
      val sorted = src.sortBy(t => (t._2, t._3))
      assert(sorted.head._3 == 0L, "smallest doc sits at percentile 0")
      assert(sorted.last._3 < 1000000L, "strict rank keeps max < 1e6")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 <= b._3, s"percentile must be monotone: $a $b")
          if (a._2 == b._2)
            assert(a._3 == b._3, "ties share a percentile")
        case _ =>
      }
    }
    // driver recount for one source
    val s0 = rows.filter(_._1 == rows.head._1)
    s0.foreach { case (_, toks, ppm) =>
      val below = s0.count(_._2 < toks).toLong
      assert(ppm == below * 1000000L / s0.length)
    }
    // plan: corpus joins the broadcast histogram; no corpus-scale sort
    // feeds the join (the only Sorts allowed serve the bounded
    // histogram windows and the final presentation ORDER BY)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"histogram must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
           s"the corpus must not sort-merge:\n$plan")
  }
}
