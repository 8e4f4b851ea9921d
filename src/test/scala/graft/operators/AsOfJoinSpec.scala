package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(86400000L + m * 60000L)

  test("asofJoin picks latest right row at or before left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts(10)), (2L, 10L, ts(25)), (3L, 20L, ts(5)),
      (4L, 30L, ts(50))).toDF("id", "key", "t")
    val right = Seq(
      (10L, ts(0), "a"), (10L, ts(20), "b"), (10L, ts(30), "c"),
      (20L, ts(5), "tie")).toDF("key", "rt", "rv")
    val out = AsOfJoin
      .asofJoin(left, right, "key", "t", "rt", Seq("rv"))
      .select("id", "rv").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("a"))   // latest <= t(10) is t(0)
    assert(out(2L) == Some("b"))   // t(20) <= t(25), t(30) too late
    assert(out(3L) == Some("tie")) // equal timestamps match (>= semantics)
    assert(out(4L) == None)        // key 30 has no right rows → null
  }

  test("asofJoin plan has exactly one shuffle and no fanout join") {
    import spark.implicits._
    val left = (0 until 100).map(i => (i.toLong, (i % 5).toLong, ts(i)))
      .toDF("id", "key", "t")
    val right = (0 until 50).map(i => ((i % 5).toLong, ts(i), s"v$i"))
      .toDF("key", "rt", "rv")
    val df = AsOfJoin.asofJoin(left, right, "key", "t", "rt", Seq("rv"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"composition must not plan a join:\n$plan")
    assert(df.count() == 100, "no row fanout")
  }
}
