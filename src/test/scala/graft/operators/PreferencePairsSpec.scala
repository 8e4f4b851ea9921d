package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q203 preference-pair mining: pairing correctness vs a collected
  * replay, injectivity, the margin gate, and the WindowGroupLimit plan
  * shape that makes the per-source top-k scale-safe.
  */
class PreferencePairsSpec extends SparkSpec {

  test("pairs match a collected top-k/bottom-k replay; no document " +
       "reused within a side; margin respected") {
    val pairs = LlmQueries.queries("q203_preference_pairs")(spark, sf0001)
      .collect()
    assert(pairs.nonEmpty)
    val q = graft.sources.Tables.documents(spark, sf0001).select(
        col("doc_id"), col("source"),
        floor(graft.llm.TextAnalysis.qualityScore(col("text")) * 10000.0d
                + 0.5d).cast("long").as("qi"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = q.groupBy(_._2)
    pairs.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val docs = bySource(src)
      val hi = docs.sortBy(d => (-d._3, d._1)).take(8)
      val lo = docs.sortBy(d => (d._3, -d._1)).take(8)
      val expect = (hi.zip(lo).zipWithIndex.collect {
        case (((cid, _, cq), (rid, _, rq)), i)
            if cid != rid && cq - rq >= 1000L =>
          (i + 1L, cid, cq, rid, rq)
      }).toSet
      val got = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
                               r.getLong(4), r.getLong(5))).toSet
      assert(got == expect, s"$src: $got != $expect")
    }
    // injectivity and the gate, globally
    val chosen = pairs.map(r => (r.getString(0), r.getLong(2)))
    val rejected = pairs.map(r => (r.getString(0), r.getLong(4)))
    assert(chosen.distinct.length == chosen.length)
    assert(rejected.distinct.length == rejected.length)
    assert(pairs.forall(_.getLong(6) >= 1000L))
  }

  test("q205 group advantage: per-group advantages sum to zero; sign " +
       "agrees with the mean comparison; broadcast join, no window") {
    val df = LlmQueries.queries("q205_group_advantage")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == 500)
    rows.groupBy(_.getString(1)).foreach { case (src, g) =>
      assert(g.map(_.getLong(4)).sum == 0L, s"$src advantages must sum to 0")
      g.foreach(r => assert(r.getBoolean(5) == (r.getLong(4) > 0L)))
      assert(g.map(_.getLong(3)).distinct.toSeq == Seq(g.length.toLong))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
             plan.contains("BroadcastExchange"),
           s"group stats must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"no window needed:\n$plan")
  }

  test("both top-k windows plan as WindowGroupLimit — map-side k rows " +
       "per source, never a per-source corpus sort") {
    val plan = LlmQueries.queries("q203_preference_pairs")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.sliding("WindowGroupLimit".length)
             .count(_ == "WindowGroupLimit") >= 2,
           s"expected WindowGroupLimit on both rank windows:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
