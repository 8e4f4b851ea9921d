package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench auto-adjudication's pure logic: artifact parsing and
  * riser detection (the timing loop itself is exercised by the
  * driver's per-round run).
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  private val artifact =
    """{"metric":"total","value":12.5,"unit":"sec","queries":{"q01_a":0.9291,"q224_streaming_kmv":0.22,"q225_pmi":0.78},"spread":{"q01_a":1.010,"q224_streaming_kmv":1.52,"q225_pmi":1.05},"ok":{"q01_a":true},"sf":"/root/testdata/sf0.1"}"""

  test("parseQueryTimes extracts the flat queries object only") {
    val m = Bench.parseQueryTimes(artifact)
    assert(m == Map("q01_a" -> 0.9291, "q224_streaming_kmv" -> 0.22,
                    "q225_pmi" -> 0.78))
  }

  test("parseQueryTimes is empty on garbage / missing file content") {
    assert(Bench.parseQueryTimes("").isEmpty)
    assert(Bench.parseQueryTimes("{\"metric\":\"total\"}").isEmpty)
  }

  test("risers flags >1.5x minima on shared queries only") {
    val prev = Map("a" -> 1.0, "b" -> 0.22, "c" -> 0.5)
    val cur  = Map("a" -> 1.4, "b" -> 1.29, "d" -> 9.0)
    // a: 1.4x — under threshold; b: 5.8x — flagged (round-13's q224);
    // d: new query, no baseline — never flagged
    assert(Bench.risers(prev, cur) == Seq("b"))
  }

  test("risers ignores exact-threshold and zero baselines") {
    val prev = Map("a" -> 1.0, "z" -> 0.0)
    assert(Bench.risers(prev, Map("a" -> 1.5, "z" -> 99.0)).isEmpty)
    assert(Bench.risers(prev, Map("a" -> 1.51)) == Seq("a"))
  }

  test("parseSf reads the artifact's scale dir; adjudication must not " +
       "compare minima across scale factors") {
    assert(Bench.parseSf(artifact) == Some("/root/testdata/sf0.1"))
    assert(Bench.parseSf("{\"metric\":\"total\"}").isEmpty)
  }

  test("BenchDrift: raw ratio over the shared set, normalized by the " +
       "calibration ratio when both artifacts carry one") {
    val oldA =
      """{"metric":"total","value":2.0,"calibration":1.0000,"queries":{"a":1.0,"b":1.0,"gone":5.0},"sf":"x"}"""
    val newA =
      """{"metric":"total","value":3.0,"calibration":1.2000,"queries":{"a":1.2,"b":1.8,"new":7.0},"sf":"x"}"""
    val r = tools.BenchDrift.report(oldA, newA)
    assert(r.shared == 2)
    assert(math.abs(r.rawRatio - 1.5) < 1e-9)
    assert(r.calRatio.exists(c => math.abs(c - 1.2) < 1e-9))
    assert(r.normRatio.exists(n => math.abs(n - 1.25) < 1e-9))
    // per-query normalized: a = 1.2/1.2 = 1.0, b = 1.8/1.2 = 1.5
    assert(r.risers.head._1 == "b" &&
             math.abs(r.risers.head._2 - 1.5) < 1e-9)
    // without calibration on one side, normalization reports n/a
    val r2 = tools.BenchDrift.report(artifact, newA)
    assert(r2.calRatio.isEmpty && r2.normRatio.isEmpty)
  }
}
