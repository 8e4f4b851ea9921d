package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Hand-built event sequences through the q106 funnel logic — the
  * ordering edge cases the synthetic table can't pin precisely.
  */
class FunnelSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("strict ordering: out-of-order stages do not convert") {
    import spark.implicits._
    val dir = tmpDir("funnel")
    // user 1: full ordered funnel  → counts at all 3 stages
    // user 2: view BEFORE signup   → stage 1 only
    // user 3: purchase before view → stages 1-2 only
    // user 4: no signup            → counts nowhere
    val events = Seq(
      (1L, ts(0), 1L, "signup", 0.0, "{}"),
      (2L, ts(10), 1L, "view", 0.0, "{}"),
      (3L, ts(20), 1L, "purchase", 0.0, "{}"),
      (4L, ts(5), 2L, "view", 0.0, "{}"),
      (5L, ts(10), 2L, "signup", 0.0, "{}"),
      (6L, ts(0), 3L, "signup", 0.0, "{}"),
      (7L, ts(1), 3L, "purchase", 0.0, "{}"),
      (8L, ts(2), 3L, "view", 0.0, "{}"),
      (9L, ts(0), 4L, "view", 0.0, "{}"),
      (10L, ts(1), 4L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    // satisfy the Tables reader layout with stub side tables
    val out = TimeSeriesQueries.q106EventFunnel(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // signups: users 1,2,3 → 3; views after signup: 1,3 → 2;
    // purchases after that view: 1 only → 1
    assert(out(1) == ((3L, 1000000L)))
    assert(out(2) == ((2L, 666666L)))
    assert(out(3) == ((1L, 333333L)))
  }

  test("retention cohorts: offsets count distinct users against their " +
       "own signup week") {
    import spark.implicits._
    val dir = tmpDir("cohort")
    val wk = 7 * 24 * 60 // minutes per week
    // Mon 1970-01-05 is the first Monday ≥ epoch — keep everything
    // inside clean week boundaries by offsetting 4 days
    val base = 4 * 24 * 60
    val events = Seq(
      // cohort A (week 0): users 1, 2 sign up; user 1 active week 1
      (1L, ts(base + 1), 1L, "signup", 0.0, "{}"),
      (2L, ts(base + 2), 2L, "signup", 0.0, "{}"),
      (3L, ts(base + wk + 5), 1L, "click", 0.0, "{}"),
      // cohort B (week 1): user 3 signs up, active weeks 1 and 2
      (4L, ts(base + wk + 1), 3L, "signup", 0.0, "{}"),
      (5L, ts(base + 2 * wk + 1), 3L, "view", 0.0, "{}"),
      // non-signup user: never a cohort member
      (6L, ts(base + 3), 9L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TimeSeriesQueries.q107RetentionCohorts(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // cohort A: 2 users at offset 0; only user 1 back at offset 1
    assert(out(("1970-01-05", 0L)) == ((2L, 2L, 1000000L)))
    assert(out(("1970-01-05", 1L)) == ((1L, 2L, 500000L)))
    // cohort B: 1 user, retained at offset 1
    assert(out(("1970-01-12", 0L)) == ((1L, 1L, 1000000L)))
    assert(out(("1970-01-12", 1L)) == ((1L, 1L, 1000000L)))
    assert(!out.contains(("1970-01-05", 2L))) // nobody from A in week 2
  }

  test("moving average RANGE frame shrinks across calendar gaps") {
    import spark.implicits._
    val dir = tmpDir("mavg")
    def day(d: Int, min: Int) = ts(d * 24 * 60 + min)
    // type a: days 0, 1, 4 (gap of two days) with totals 10, 20, 40
    val events = Seq(
      (1L, day(0, 1), 1L, "a", 10.0, "{}"),
      (2L, day(1, 1), 1L, "a", 20.0, "{}"),
      (3L, day(4, 1), 1L, "a", 40.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TimeSeriesQueries.q109MovingAvg(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(0L) == 10.0)
    assert(out(1L) == 15.0) // (10+20)/2
    // day 4: days 2..4 in range — only day 4 present → avg = 40, NOT
    // the rows-frame answer (10+20+40)/3
    assert(out(4L) == 40.0)
  }

  test("transition matrix counts ordered pairs per user; ppm rows " +
       "normalize by from-type") {
    import spark.implicits._
    val dir = tmpDir("trans")
    // user 1: a→b→a ; user 2: a→b — pairs: (a,b)×2, (b,a)×1
    val events = Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"),
      (2L, ts(1), 1L, "b", 0.0, "{}"),
      (3L, ts(2), 1L, "a", 0.0, "{}"),
      (4L, ts(0), 2L, "a", 0.0, "{}"),
      (5L, ts(1), 2L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TimeSeriesQueries.q110EventTransitions(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(4))).toMap
    assert(out == Map(("a", "b") -> ((2L, 1000000L)),
                      ("b", "a") -> ((1L, 1000000L))))
  }

  test("A/B z-test matches the closed form on hand-built conversions") {
    import spark.implicits._
    val dir = tmpDir("abtest")
    // variant A (even ids): users 0, 2 — user 0 converts (value > 180)
    // variant B (odd ids): users 1, 3 — none convert
    val events = Seq(
      (1L, ts(0), 0L, "purchase", 200.0, "{}"),
      (2L, ts(1), 2L, "purchase", 50.0, "{}"),
      (3L, ts(2), 1L, "purchase", 10.0, "{}"),
      (4L, ts(3), 3L, "click", 500.0, "{}")) // click ≠ conversion
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = TimeSeriesQueries.q111AbTest(spark, dir).head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("conv_a_ppm") == 500000L)
    assert(r.getAs[Long]("conv_b_ppm") == 0L)
    // z = (0.5 - 0) / sqrt(0.25 · 0.75 · (1/2 + 1/2))
    val expected = 0.5 / math.sqrt(0.25 * 0.75 * 1.0)
    assert(math.abs(r.getAs[Double]("z") - expected) < 1e-6)
    assert(!r.getAs[Boolean]("significant_95"))
  }

  test("A/B z-test: degenerate pooled rate (0 or 1) nulls z instead of " +
       "reporting NaN-driven significance") {
    import spark.implicits._
    val dir = tmpDir("abtestdgn")
    // Nobody converts → pooled = 0 → variance 0 → z would be 0/0 = NaN,
    // and Spark's NaN-is-greatest ordering would make abs(z) > 1.96 TRUE.
    val events = Seq(
      (1L, ts(0), 0L, "purchase", 50.0, "{}"),
      (2L, ts(1), 1L, "purchase", 50.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = TimeSeriesQueries.q111AbTest(spark, dir).head()
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.isNullAt(r.fieldIndex("significant_95")))
    // Everybody converts → pooled = 1 → same guard.
    val dir2 = tmpDir("abtestdgn2")
    val events2 = Seq(
      (1L, ts(0), 0L, "purchase", 200.0, "{}"),
      (2L, ts(1), 1L, "purchase", 200.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events2.write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val r2 = TimeSeriesQueries.q111AbTest(spark, dir2).head()
    assert(r2.isNullAt(r2.fieldIndex("z")))
    assert(r2.isNullAt(r2.fieldIndex("significant_95")))
  }

  test("equal timestamps do not satisfy the STRICT order") {
    import spark.implicits._
    val dir = tmpDir("funneleq")
    val events = Seq(
      (1L, ts(0), 1L, "signup", 0.0, "{}"),
      (2L, ts(0), 1L, "view", 0.0, "{}")) // same instant → not after
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TimeSeriesQueries.q106EventFunnel(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(1) == 1L && out(2) == 0L && out(3) == 0L)
  }
}
