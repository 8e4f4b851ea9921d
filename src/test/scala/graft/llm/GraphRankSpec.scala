package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {

  /** The same integer recurrence, hand-run in plain Scala. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long = 1000000000000L,
                        damp: Int = 85): Map[Long, Long] = {
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = sym.map(_._1).distinct.sorted
    val n = nodes.size.toLong
    val base = (scale * (100 - damp) / 100) / n
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
      sym.foreach { case (x, y) =>
        in(y) = in.getOrElse(y, 0L) + r(x) / deg(x)
      }
      r = nodes.map(v => v -> (base + damp * in.getOrElse(v, 0L) / 100))
        .toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 10) = {
    import spark.implicits._
    GraphRank.pageRankFixedPoint(edges.toDF("a", "b"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star graph: center outranks leaves; ranks match the recurrence") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val got = run(edges)
    assert(got == reference(edges, 10))
    assert(got(0L) > got(1L))
    assert(got(1L) == got(2L) && got(2L) == got(3L)) // leaf symmetry
  }

  test("two disjoint components rank independently; mass ≈ scale") {
    val edges = Seq((1L, 2L), (10L, 11L), (11L, 12L), (12L, 10L))
    val got = run(edges)
    assert(got == reference(edges, 10))
    // regular components: every node keeps ~1/n mass (truncation only)
    val total = got.values.sum
    assert(total <= 1000000000000L && total > 999999000000L)
  }

  test("chain graph breaks symmetry: middle node wins") {
    val edges = Seq((1L, 2L), (2L, 3L))
    val got = run(edges)
    assert(got == reference(edges, 10))
    assert(got(2L) > got(1L) && got(1L) == got(3L))
  }

  test("empty edge list yields empty ranks, no failure") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphRank.pageRankFixedPoint(empty, 5).count() == 0)
  }

  test("driver endgame and distributed loop produce bit-identical ranks") {
    import spark.implicits._
    val edges = (0L until 150L).map(i => (i, (i * 11 + 3) % 150))
    val viaDriver = GraphRank.pageRankFixedPoint(
      edges.toDF("a", "b"), 10) // well under the default endgame bound
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCluster = GraphRank.pageRankFixedPoint(
      edges.toDF("a", "b"), 10, localFinishEdges = 0L) // force distributed
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaCluster)
  }

  test("distributed branch at real size: >1M symmetric edges take the " +
       "cluster path under the DEFAULT bound and match the recurrence") {
    // 600k directed edges → 1.2M symmetric rows: crosses the 1M
    // localFinishEdges default, so this exercises the genuine
    // symCount > localFinishEdges branch — no forced-small bound.
    val nNodes = 600000L
    val edges = (0L until nNodes).map(i => (i, (i * 11 + 3) % nNodes))
    val df = spark.range(nNodes)
      .select(col("id").as("a"),
              ((col("id") * 11 + 3) % nNodes).as("b"))
    val got = GraphRank.pageRankFixedPoint(df, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference(edges, 3)
    assert(got.size == want.size)
    assert(got == want, "distributed ranks diverged from the recurrence")
  }

  test("broadcast step plan: the edge list joins the rank vector with " +
       "NO exchange on the edge side") {
    import spark.implicits._
    val e = Seq((1L, 2L, 2L), (2L, 1L, 1L), (1L, 3L, 2L), (3L, 1L, 1L))
      .toDF("x", "y", "deg")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val r = nodes.withColumn("rank", lit(1000000L))
    val plan = GraphRank.prStep(e, nodes, r, base = 100L, dampingPct = 85,
                                broadcastRank = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"rank vector must broadcast into the edge join:\n$plan")
  }

  test("ranks are bit-identical across partitioning (integer arithmetic)") {
    import spark.implicits._
    val edges = (0L until 200L).map(i => (i, (i * 7 + 1) % 200))
    val a = GraphRank.pageRankFixedPoint(
      edges.toDF("a", "b").repartition(1), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphRank.pageRankFixedPoint(
      edges.toDF("a", "b").repartition(32), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
