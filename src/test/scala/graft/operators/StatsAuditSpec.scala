package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The engine-introspection audits: runtime bloom pruning (q262) and
  * histogram join-cardinality estimation (q263) — output invariants
  * recounted independently, plans pinned broadcast-only.
  */
class StatsAuditSpec extends SparkSpec {

  test("q262: no false negatives, exact true-match count, consistent " +
       "fp arithmetic, and the big side never sort-merges") {
    val df = RelationalQueries.queries("q262_bloom_prune_audit")(
      spark, sf0001)
    val r = df.collect().head
    val (nBig, nPass, nTrue, fpPpm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // independent recount of the ground truth
    val o = Tables.orders(spark, sf0001)
    val l = Tables.lineitem(spark, sf0001)
    val keys = o.filter(col("o_orderpriority") === "1-URGENT" &&
                        col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("l_orderkey")).distinct()
    assert(nBig == l.count())
    assert(nTrue == l.join(keys, Seq("l_orderkey"), "left_semi").count())
    // a Bloom filter may over-admit but NEVER under-admit
    assert(nPass >= nTrue, "bloom dropped a true match")
    assert(nPass < nBig, "bloom pruned nothing")
    assert(fpPpm == (nPass - nTrue) * 1000000L / (nBig - nTrue))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"bitmap and key set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
           s"the scanned side must never sort-merge:\n$plan")
  }

  test("q263: estimates follow the uniform-frequency formula, truth " +
       "bounds hold, and bucket rows partition the table") {
    val rows = RelationalQueries.queries("q263_join_card_estimate")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 16)
    rows.foreach { case (b, n, ndv, est, tru, err) =>
      assert(est == n * n / ndv, s"estimate formula broke at bucket $b")
      // Cauchy-Schwarz floor: sum c^2 >= n^2/ndv, so the uniform
      // estimate can only UNDER-estimate a skewed bucket
      assert(tru >= est, s"true self-join card under the CS floor at $b")
      assert(ndv <= n)
      assert(err == (tru - est) * 1000000L / tru)
    }
    assert(rows.map(_._2).sum == Tables.events(spark, sf0001).count(),
           "bucket rows must partition the events table")
  }

  test("q267: the six schema FKs are detected; each negative is " +
       "rejected by exactly the leg built to catch it") {
    val rows = RelationalQueries.queries("q267_fk_discovery")(
      spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getLong(3), r.getLong(4), r.getLong(5),
                 r.getLong(6), r.getLong(7)))
    val byPair = rows.map(t => (t._1, t._2) -> t).toMap
    val fks = Seq(
      ("lineitem.l_orderkey", "orders.o_orderkey"),
      ("lineitem.l_partkey", "part.p_partkey"),
      ("lineitem.l_suppkey", "supplier.s_suppkey"),
      ("orders.o_custkey", "customer.c_custkey"),
      ("customer.c_nationkey", "nation.n_nationkey"),
      ("nation.n_regionkey", "region.r_regionkey"))
    fks.foreach { p =>
      assert(byPair(p)._8 == 1L, s"schema FK $p not detected")
      assert(byPair(p)._7 == 1000000L)
    }
    // rejected at every SF; the uniqueness-leg-specific rejection
    // (full containment, non-unique parent) needs sf0.01's 100
    // suppliers over 25 nations — checked there below
    val nonUnique =
      byPair(("customer.c_nationkey", "supplier.s_nationkey"))
    assert(nonUnique._8 == 0L)
    val partial = byPair(("orders.o_orderkey", "customer.c_custkey"))
    assert(partial._8 == 0L && partial._7 < 1000000L,
           "must reject via partial containment")
  }

  test("q273: sketch join-card estimate reconciles with its " +
       "components and the truth recounts independently") {
    val r = LlmQueries.queries("q273_kmv_join_card")(spark, sf0001)
      .collect().head
    val (rowsA, rowsB, dA, dB, estM, trueM, estC, trueC, err) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
       r.getLong(8))
    val ev = Tables.events(spark, sf0001)
    assert(rowsA + rowsB == ev.count(),
           "the two sides must partition the events table")
    // independent truth recount
    val cut = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val byUser = ev.select("user_id", "ts").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(rs => (rs.count(_.getTimestamp(1).before(cut)).toLong,
                        rs.count(!_.getTimestamp(1).before(cut)).toLong))
      .toMap
    assert(trueM == byUser.values.count(t => t._1 > 0 && t._2 > 0))
    assert(trueC == byUser.values.map(t => t._1 * t._2).sum)
    // estimate arithmetic reconciles with its own components
    assert(estC ==
      (BigInt(estM) * (rowsA * 1000 / dA) * (rowsB * 1000 / dB) /
        1000000).toLong)
    assert(err == (BigInt((estC - trueC).abs) * 1000000 / trueC).toLong)
    // matched-keys estimate can never exceed either side's estimate
    assert(estM <= math.min(dA, dB))
  }

  test("q274: the erasure cascade recounts independently, integrity " +
       "holds, and no data row ever rides a shuffle") {
    val df = RelationalQueries.queries("q274_erasure_audit")(
      spark, sf0001)
    val rows = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
                                   r.getLong(3))).toMap
    val cust = Tables.customer(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
    val erased = cust.filter(col("c_custkey") % 97 === 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(erased.nonEmpty)
    assert(rows("customer")._1 == erased.size)
    val deadOrders = ord.collect()
      .filter(r => erased(r.getAs[Long]("o_custkey")))
      .map(_.getAs[Long]("o_orderkey")).toSet
    assert(rows("orders")._1 == deadOrders.size)
    assert(rows("lineitem")._1 ==
      Tables.lineitem(spark, sf0001).collect()
        .count(r => deadOrders(r.getAs[Long]("l_orderkey"))))
    rows.foreach { case (t, (del, keep, orph)) =>
      assert(orph == 0L, s"$t left orphans")
      assert(del > 0L, s"$t cascade must be non-empty")
    }
    assert(rows.values.map(t => t._1 + t._2).sum ==
      cust.count() + ord.count() +
        Tables.lineitem(spark, sf0001).count() +
        Tables.events(spark, sf0001).count())
    // round-13 pin: every broadcast-hinted side must be a DELETED key
    // set — never an anti-derived (kept) set, which is
    // corpus-proportional and dies at the broadcast cap at 100 TB.
    // (The round-14 orphan legs join kept children vs kept-parent KEY
    // sets and are deliberately UNHINTED — AQE may plan them as SMJ at
    // scale, so no blanket no-SMJ assertion here.)
    val hinted = broadcastHintedSides(df)
    assert(hinted.nonEmpty, "deleted key sets must carry the gated hint")
    hinted.foreach { side =>
      assert(!containsAntiJoin(side),
             s"a kept (anti-derived) key set is hinted for broadcast:\n" +
               side.toString)
    }
  }

  test("q274's orphan check is REAL: a kept child of an erased parent " +
       "is counted, a parentless child is not") {
    import spark.implicits._
    // parents originally {1, 2}; parent 2 erased → kept parents {1};
    // kept children reference 1 (fine), 2 (orphan — cascade broke),
    // 3 (never had a parent — q267's concern, not an orphan)
    val parentKeys     = Seq(1L, 2L).toDF("k")
    val keptParentKeys = Seq(1L).toDF("k")
    val keptChildKeys  = Seq(1L, 2L, 3L).toDF("k")
    val orphans = RelationalQueries.orphanKeys(
      keptChildKeys, parentKeys, keptParentKeys).collect()
    assert(orphans.map(_.getLong(0)).toSeq == Seq(2L),
           "exactly the erased-parent child must surface as an orphan")
    // and the kept-parent leg is independent of the erase derivation:
    // feeding the OLD tautological shape (anti vs erase then semi vs
    // erase) would have returned 0 here no matter what
  }

  /** The broadcast gate itself: a key set above the threshold flows
    * UNHINTED (AQE decides), below it carries the hint.
    */
  test("gatedBroadcast hints small key sets and lets big ones flow") {
    val keys = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("k"))
    val probe = Tables.orders(spark, sf0001)
      .select(col("o_custkey").as("k"))
    val small = probe.join(
      RelationalQueries.gatedBroadcast(keys.limit(5)),
      Seq("k"), "left_semi")
    val big = probe.join(
      RelationalQueries.gatedBroadcast(keys, maxKeys = 3L),
      Seq("k"), "left_semi")
    assert(broadcastHintedSides(small).nonEmpty,
           "small set must carry the hint into the join")
    assert(broadcastHintedSides(big).isEmpty,
           "over-threshold set must flow unhinted (AQE decides)")
  }

  private def broadcastHintedSides(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right)
          .collect { case (Some(h), side) if h.strategy.isDefined =>
            side }
    }.flatten

  private def containsAntiJoin(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    p.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }.nonEmpty

  test("q277: catalog statistics recount independently and the " +
       "encoded extremes are ordered") {
    val rows = RelationalQueries.queries("q277_analyze_stats")(
      spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
             (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
              r.getLong(6))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
    assert(rows(("orders", "o_custkey"))._1 ==
      Tables.orders(spark, sf0001).count())
    assert(rows(("customer", "c_mktsegment"))._3 ==
      Tables.customer(spark, sf0001)
        .select("c_mktsegment").distinct().count())
    assert(rows(("documents", "lang"))._2 ==
      docs.filter(col("lang").isNull).count())
    assert(rows(("events", "user_id"))._4 ==
      Tables.events(spark, sf0001).agg(min("user_id"))
        .head.getLong(0))
    // string extremes are md5-encoded (deterministic, NOT
    // order-preserving) — the ordering invariant applies to the
    // monotonic encoders only
    val strCols = Set(("customer", "c_mktsegment"),
                      ("documents", "lang"), ("documents", "source"))
    rows.foreach { case (k, (n, nul, ndv, mn, mx)) =>
      if (!strCols(k)) assert(mn <= mx, s"$k extremes out of order")
      assert(ndv <= n - nul, s"$k ndv exceeds non-null rows")
    }
  }

  test("q267 at sf0.01: the non-unique-parent pair is rejected by " +
       "uniqueness ALONE (containment is full there)") {
    val r = RelationalQueries.queries("q267_fk_discovery")(
      spark, "/root/testdata/sf0.01")
      .filter(col("parent") === "supplier.s_nationkey")
      .collect().head
    assert(r.getLong(6) == 1000000L, "containment must be full")
    assert(r.getLong(5) < r.getLong(4), "parent must be non-unique")
    assert(r.getLong(7) == 0L, "pair must still be rejected")
  }
}
