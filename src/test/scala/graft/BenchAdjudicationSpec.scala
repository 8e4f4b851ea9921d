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
}
