package graft.plans

import graft.SparkSpec
import graft.operators.SqlAnchors
import graft.tools.CboAnchors

/** The CBO estate applied to the engine's OWN standing relational
  * anchors (round-13 left it on purpose-built fixtures): statistics
  * published on the real catalog tables, every SQL anchor twin
  * compiled under four legs (blind / cbo at the default broadcast
  * threshold, and both again at the 128 KB "scaled" threshold that
  * emulates 100 TB relative table sizes), plus the answers-unchanged
  * execution leg. The measured boundary this suite pins — no flips at
  * the default local threshold, reorder flips on q03/q05 in the
  * scaled regime — is recorded in PLANS.md (round 14).
  */
class CboAnchorsSpec extends SparkSpec {

  private lazy val sweep01: Map[String, Map[String, String]] =
    CboAnchors.sweep(spark, "/root/testdata/sf0.1").toMap

  test("publishing stats on a column list containing TIMESTAMP_NTZ " +
       "columns neither crashes the publish nor the CBO compile") {
    // l_shipdate / o_orderdate load as TIMESTAMP_NTZ;
    // FilterEstimation (Spark 4.1.2) MatchErrors if any stats reach
    // such a column, so publish() must drop them — the sweep below
    // compiles every anchor with CBO on, which crashed before the fix.
    assert(sweep01.nonEmpty)
  }

  test("default threshold: no standing anchor flips — size-based " +
       "broadcast is already optimal at local SF (the measured " +
       "boundary of the CBO estate's 100 TB claim)") {
    val diffs = sweep01.collect {
      case (n, legs) if legs("blind") != legs("cbo") => n
    }
    assert(diffs.isEmpty, s"unexpected default-threshold flips: $diffs")
  }

  test("scaled threshold (128 KB ~ tables larger than threshold, the " +
       "100 TB regime): join reorder flips q03 and q05") {
    // q03: blind runs the big lineitem⋈orders sort-merge FIRST and
    // applies customer after; CBO reorders to broadcast the
    // BUILDING-filtered customer onto orders BEFORE the sort-merge,
    // so the fact-side shuffle carries one segment's orders only.
    val q03 = sweep01("q03_shipping_priority")
    assert(q03("blind@128k") != q03("cbo@128k"),
           s"q03 must flip under stats: $q03")
    assert(q03("cbo@128k").startsWith("SMJ"),
           "q03's cbo tree keeps the lineitem join sort-merge on top " +
             s"with the dimension broadcast below: $q03")
    // q05: CBO rebuilds the tree around region→nation→supplier
    // broadcasts onto lineitem before orders/customer are touched.
    val q05 = sweep01("q05_region_revenue")
    assert(q05("blind@128k") != q05("cbo@128k"),
           s"q05 must flip under stats: $q05")
  }

  test("scaled threshold: the date-filtered anchors q17/q18/q19 do " +
       "NOT flip — their selective filters are on TIMESTAMP_NTZ " +
       "columns whose stats are unpublishable (documented gap)") {
    Seq("q17_semi_join", "q18_left_join_count", "q19_anti_join")
      .foreach { n =>
        val legs = sweep01(n)
        assert(legs("blind@128k") == legs("cbo@128k"),
               s"$n unexpectedly flipped: $legs")
      }
  }

  test("answers unchanged: every anchor executed with stats + CBO + " +
       "reorder equals the DataFrame program bit-for-bit (sf0.001)") {
    val mapping = CboAnchors.ensureTables(spark, sf0001)
    CboAnchors.publishAll(spark, mapping)
    StatsCatalog.withConfs(spark,
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      SqlAnchors.twins.foreach { case (name, sql) =>
        val viaCbo = spark.sql(SqlAnchors.rebind(sql, mapping))
          .collect().toSeq
        val viaDf = graft.SparkEntry.queries(name)(spark, sf0001)
          .collect().toSeq
        assert(viaCbo == viaDf, s"$name rows differ under CBO")
        assert(viaCbo.nonEmpty, s"$name must return rows")
      }
    }
  }
}
