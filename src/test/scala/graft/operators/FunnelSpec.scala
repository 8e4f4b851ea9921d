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
