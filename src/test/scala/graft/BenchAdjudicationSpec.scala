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

  test("risers is calibration-aware: a slower host relaxes the 1.5x " +
       "threshold by the probe ratio (the driver's round-15 rerun " +
       "burned 24 solo cycles a 1.27x-slower instant explains), a " +
       "faster host never tightens it, and the raw 3x backstop caps " +
       "what a bad probe reading can excuse") {
    val prev = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    // synthetic slow-host pass: every query uniformly 1.8x raw — the
    // exact shape that was 24 phantom risers; calRatio 1.27 relaxes
    // the threshold to 1.905x and none is flagged
    val slow = Map("a" -> 1.8, "b" -> 1.8, "c" -> 1.8)
    assert(Bench.risers(prev, slow).size == 3)
    assert(Bench.risers(prev, slow, calRatio = 1.27).isEmpty)
    // a genuine regression still pokes above the relaxed threshold
    assert(Bench.risers(prev, slow + ("b" -> 2.0),
                        calRatio = 1.27) == Seq("b"))
    // raw backstop: calRatio 3 would put the threshold at 4.5x; the
    // 3x cap keeps a real 3.1x regression flagged regardless
    assert(Bench.risers(prev, Map("a" -> 3.1), calRatio = 3.0)
             == Seq("a"))
    assert(Bench.risers(prev, Map("a" -> 2.9), calRatio = 3.0).isEmpty)
    // faster host (CPU probe sped up 2x): the clamp keeps the raw
    // 1.5x floor — IO-bound queries that didn't speed up must not all
    // false-positive
    assert(Bench.risers(prev, Map("a" -> 1.4), calRatio = 0.5).isEmpty)
    assert(Bench.risers(prev, Map("a" -> 1.6), calRatio = 0.5)
             == Seq("a"))
  }

  test("parseCalibration reads the probe field; absent on pre-r15 " +
       "artifacts") {
    val withCal =
      """{"metric":"total","value":2.0,"calibration":0.3701,"queries":{"a":1.0},"sf":"x"}"""
    assert(Bench.parseCalibration(withCal).exists(c =>
      math.abs(c - 0.3701) < 1e-9))
    assert(Bench.parseCalibration(artifact).isEmpty)
    // r16 artifacts carry pre/post diagnostics too — the reader must
    // bind the min-of-both "calibration" field, not a diagnostic
    val withBoth =
      """{"metric":"total","calibration":0.3832,"calibration_pre":1.1194,"calibration_post":0.3832,"queries":{"a":1.0},"sf":"x"}"""
    assert(Bench.parseCalibration(withBoth).exists(c =>
      math.abs(c - 0.3832) < 1e-9))
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
    // the full per-query table carries raw AND normalized columns
    // (round-16 verdict #3: per-query normalization is the intended
    // drift-adjudication read, not the suite total)
    assert(r.perQuery.map(_._1) == Seq("a", "b"))
    val a = r.perQuery.find(_._1 == "a").get
    val b = r.perQuery.find(_._1 == "b").get
    assert(math.abs(a._2 - 1.2) < 1e-9 && math.abs(a._3 - 1.0) < 1e-9)
    assert(math.abs(b._2 - 1.8) < 1e-9 && math.abs(b._3 - 1.5) < 1e-9)
    // without calibration on one side, normalization reports n/a
    val r2 = tools.BenchDrift.report(artifact, newA)
    assert(r2.calRatio.isEmpty && r2.normRatio.isEmpty)
  }
}
