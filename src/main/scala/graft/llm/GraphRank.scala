package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic PageRank over a document graph — centrality as a data-
  * selection signal: inside a large near-duplicate family the highest-
  * centrality member is the "canonical" copy (the one every variant is
  * closest to), and on citation/link graphs centrality is the classic
  * keep-priority signal.
  *
  * The twist that makes it engine-portable: FIXED-POINT arithmetic.
  * Ranks live as integer mass units (`scale` = one unit of total mass),
  * every step is integer division (`DIV`), so there is no float
  * summation order anywhere — two engines (or two cluster sizes) compute
  * bit-identical ranks, and the DuckDB oracle replays the iterations
  * exactly (q104). Truncation bleeds ~deg units of mass per node per
  * iteration — irrelevant at scale=10¹² and it is the price of exact
  * reproducibility.
  *
  * Scale shape: one degree aggregation, then per iteration ONE join of
  * the edge list with the rank vector (shuffle on node id) + one
  * aggregation — the standard distributed PR step; the rank vector is
  * materialized per iteration ([[graft.Materialize]], so the lineage
  * doesn't stack 10 joins deep). Iterations are fixed (no convergence
  * test — a driver-side `count` per iter would double the jobs; 10
  * iterations is the usual production choice).
  */
object GraphRank {

  /** PageRank over an UNDIRECTED edge list `(a, b)` (one row per edge;
    * both endpoints become nodes). Returns (node, rank) with rank in
    * integer `scale` units; Σ rank ≈ scale.
    *
    * Small graphs (≤ `localFinishEdges` symmetric edges — the near-dup
    * graph after banding is tiny even on huge corpora) iterate on the
    * DRIVER instead of paying `iters` Spark jobs of pure scheduling
    * overhead — the [[Dedup.clustersFromEdges]] endgame pattern, and
    * because every step is integer arithmetic the two paths produce
    * BIT-IDENTICAL ranks (GraphRankSpec pins it).
    */
  def pageRankFixedPoint(edges: DataFrame, iters: Int = 10,
                         dampingPct: Int = 85,
                         scale: Long = 1000000000000L,
                         localFinishEdges: Long = 1000000L): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100,
            "need iters >= 0 and dampingPct in [0, 100]")
    val sym = edges.select(col("a").as("x"), col("b").as("y"))
      .unionByName(edges.select(col("b").as("x"), col("a").as("y")))
      .distinct()
      .transform(graft.Materialize(_))
    val symCount = sym.count()
    if (symCount == 0)
      return sym.select(col("x").as("node"), lit(0L).as("rank"))

    if (symCount <= localFinishEdges &&
        sym.schema("x").dataType ==
          org.apache.spark.sql.types.LongType) {
      // driver endgame: ≤1M (x, y) longs ≈ 16 MB collected
      val local = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
      val deg = local.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val nodes = deg.keys.toArray.sorted
      val n = nodes.length.toLong
      val base = (scale * (100 - dampingPct) / 100) / n
      var r = nodes.iterator.map(_ -> scale / n).toMap
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.Map.empty[Long, Long]
        local.foreach { case (x, y) =>
          in(y) = in.getOrElse(y, 0L) + r(x) / deg(x)
        }
        r = nodes.iterator
          .map(v => v -> (base + dampingPct * in.getOrElse(v, 0L) / 100))
          .toMap
      }
      val spark = edges.sparkSession
      import spark.implicits._
      return nodes.map(v => (v, r(v))).toSeq.toDF("node", "rank")
    }

    val deg = sym.groupBy("x").agg(count(lit(1)).as("deg"))
    val e = sym.join(deg, Seq("x")).transform(graft.Materialize(_))
    val nodes = sym.select(col("x").as("node")).distinct()
      .transform(graft.Materialize(_))
    val n = nodes.count()
    val init = scale / n
    val base = (scale * (100 - dampingPct) / 100) / n
    // The rank vector is 16 bytes/node — broadcastable far beyond the
    // endgame bound. Broadcasting it into the edge join means the EDGE
    // LIST never shuffles: the only per-iteration exchange is the
    // map-side-combined contribution aggregate (≤ nodes rows). Above
    // `maxBroadcastNodes` fall back to the shuffled join (both sides
    // exchange on node id) — same integer results either way.
    val maxBroadcastNodes = 10000000L
    var r = nodes.withColumn("rank", lit(init))
    for (_ <- 1 to iters) {
      r = prStep(e, nodes, r, base, dampingPct,
                 broadcastRank = n <= maxBroadcastNodes)
        .transform(graft.Materialize(_))
    }
    r
  }

  /** One distributed power-iteration step — factored out so the spec can
    * pin the executed plan (broadcast rank vector ⇒ the edge list joins
    * without an Exchange) on the REAL production expression, not a copy.
    */
  private[graft] def prStep(e: DataFrame, nodes: DataFrame, r: DataFrame,
                            base: Long, dampingPct: Int,
                            broadcastRank: Boolean): DataFrame = {
    val rSide = if (broadcastRank) broadcast(r) else r
    val contrib = e.join(rSide, col("x") === col("node"))
      .groupBy("y")
      .agg(sum(expr("rank DIV deg")).as("s"))
    nodes.join(contrib, col("node") === col("y"), "left")
      .select(col("node"),
              (lit(base) +
                expr(s"($dampingPct * coalesce(s, 0)) DIV 100"))
                .as("rank"))
  }

  /** The DuckDB replay of [[pageRankFixedPoint]] as UNROLLED chained
    * CTEs (standard SQL forbids grouping over a recursive reference, so
    * the fixed iteration count becomes one contribution+rank CTE pair
    * per step). Expects upstream CTEs `grsym(x, y)` (symmetric distinct
    * edges); emits CTEs ending in `grr$iters(node, rank)`.
    */
  private[graft] def oracleCtes(iters: Int = 10, dampingPct: Int = 85,
                                scale: Long = 1000000000000L): String = {
    val head =
      s"""grdeg AS (SELECT x, count(*) AS deg FROM grsym GROUP BY x),
         |gre AS (SELECT grsym.x, grsym.y, grdeg.deg
         |        FROM grsym JOIN grdeg USING (x)),
         |grn AS (SELECT DISTINCT x AS node FROM grsym),
         |grcnt AS (SELECT count(*) AS n FROM grn),
         |grr0 AS (SELECT node, CAST($scale // n AS BIGINT) AS rank
         |         FROM grn, grcnt)"""
        .stripMargin
    val steps = (1 to iters).map { k =>
      s"""grc$k AS (
         |  SELECT gre.y AS node,
         |    CAST(sum(grr${k - 1}.rank // gre.deg) AS BIGINT) AS s
         |  FROM gre JOIN grr${k - 1} ON grr${k - 1}.node = gre.x
         |  GROUP BY gre.y),
         |grr$k AS (
         |  SELECT grn.node,
         |    CAST((($scale * ${100 - dampingPct} // 100) // grcnt.n)
         |      + ($dampingPct * coalesce(grc$k.s, 0)) // 100
         |      AS BIGINT) AS rank
         |  FROM grn LEFT JOIN grc$k USING (node), grcnt)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }
}
