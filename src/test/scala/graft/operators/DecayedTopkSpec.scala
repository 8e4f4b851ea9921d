package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecayedTopkSpec extends SparkSpec {

  private def ev(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("event_type", "user_id", "day")
  }

  test("decayedScores hand fixture: 2^(30-age) weights, horizon cut " +
       "at 30 days, future events contribute 0") {
    val e = ev(
      ("click", 1L, 100L), ("click", 1L, 100L), // 2 today = 2·2^30
      ("click", 1L, 99L),                       // +2^29
      ("click", 2L, 70L),                       // age 30 → +1·2^0? no:
                                                //   2^(30-30)=1... in
                                                //   2^-30 units → 1
      ("click", 3L, 69L),                       // age 31 → 0
      ("click", 4L, 101L))                      // future → 0
    val out = TimeSeriesQueries
      .decayedScores(e, lit(100L))
      .collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(1L) == 2L * (1L << 30) + (1L << 29))
    assert(out(2L) == 1L)
    assert(out(3L) == 0L && out(4L) == 0L)
  }

  test("merge law: per-shard partial scores with a PINNED reference " +
       "day sum to the full-corpus score, and one day's roll-forward " +
       "is a halving") {
    val base = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id"),
              expr("unix_timestamp(ts) div 86400").as("day"))
    val ref = base.agg(max("day")).head.getLong(0)
    def scores(df: org.apache.spark.sql.DataFrame, r: Long) =
      TimeSeriesQueries.decayedScores(df, lit(r))
        .collect()
        .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    val full = scores(base, ref)
    val a = scores(base.filter(col("user_id") % 2 === 0), ref)
    val b = scores(base.filter(col("user_id") % 2 =!= 0), ref)
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == full, "shard partials must add to the full score")
    // rolling the reference one day forward halves every weight —
    // floors only where the horizon drops a day-30 contribution, so
    // score(ref+1) is within 1 of score(ref)/2 per key... exactly:
    // each 2^(30-age) halves to 2^(29-age); the age-30 term (weight 1)
    // drops. Verify the bound.
    val fwd = scores(base, ref + 1)
    full.foreach { case (k, s) =>
      val f = fwd.getOrElse(k, 0L)
      assert(f <= s / 2 && f >= s / 2 - 64L,
             s"roll-forward not a halving for $k: $s -> $f")
    }
  }

  test("q251 streamed partials re-merged equal q243's batch trending " +
       "table exactly (the merge law made operational)") {
    val streamed = TimeSeriesQueries
      .queries("q251_streaming_decay")(spark, sf0001).collect().toSeq
    val batch = TimeSeriesQueries
      .queries("q243_decayed_topk")(spark, sf0001).collect().toSeq
    assert(streamed == batch)
  }

  test("q255 rolled-store serving ≡ q243's rebuild from raw events, " +
       "and the horizon cut is a PUSHED literal predicate on the " +
       "store scan (day-partition pruning at scale)") {
    val rolled = TimeSeriesQueries
      .queries("q255_decay_roll")(spark, sf0001).collect().toSeq
    val batch = TimeSeriesQueries
      .queries("q243_decayed_topk")(spark, sf0001).collect().toSeq
    assert(rolled == batch, "store roll must serve the rebuild's table")
    val plan = TimeSeriesQueries.queries("q255_decay_roll")(
      spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(day"),
           s"horizon cut must reach PushedFilters:\n$plan")
  }

  test("q243 plan: the per-type rank cut plans as WindowGroupLimit " +
       "(map-side top-k), and ranks are dense 1..10 per type") {
    val df = TimeSeriesQueries.q243DecayedTopk(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
           s"rank filter must push map-side:\n$plan")
    val rows = df.collect()
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L).toSeq,
             s"type $t ranks")
      val scores = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }
}
