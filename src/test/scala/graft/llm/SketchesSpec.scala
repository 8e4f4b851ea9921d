package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  private def occurrences = {
    import spark.implicits._
    // zipf-ish: token t_i appears (200 - i) times, i in 0..99
    (0 until 100).flatMap(i => Seq.fill(200 - i)(s"t$i")).toDF("item")
  }

  test("CMS never undercounts, and overcount respects the d×w bound") {
    val occ = occurrences
    val sketch = Sketches.cmsSketch(occ, "item", d = 4, w = 512)
    val est = Sketches.cmsEstimate(sketch, occ.distinct(), "item",
                                   d = 4, w = 512)
    val exact = occ.groupBy("item").agg(count(lit(1)).as("n_exact"))
    val joined = est.join(exact, "item")
      .select(col("item"), col("n_est"), col("n_exact")).collect()
    assert(joined.length == 100)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
             s"undercount for ${r.getString(0)}")
    }
    // classic CMS bound: overcount ≤ 2N/w with prob 1-(1/2)^d per item;
    // assert the loose deterministic corollary that MOST items are exact
    // at this load factor (15050 occurrences into 512 buckets)
    val over = joined.count(r => r.getLong(1) > r.getLong(2))
    assert(over < 50, s"$over of 100 items overcounted at w=512")
  }

  test("sketch is bounded by d×w rows regardless of vocabulary") {
    val sketch = Sketches.cmsSketch(occurrences, "item", d = 4, w = 64)
    assert(sketch.count() <= 4L * 64)
    // every counter row sums the full stream: per-row totals == N
    val totals = sketch.groupBy("row").agg(sum("cnt").as("s"))
      .select("s").collect().map(_.getLong(0)).toSet
    assert(totals == Set(15050L))
  }

  test("item never observed estimates 0 (absent counters coalesce)") {
    import spark.implicits._
    val sketch = Sketches.cmsSketch(occurrences, "item", d = 4, w = 4096)
    val est = Sketches.cmsEstimate(
      sketch, Seq("never-seen-token-xyzzy").toDF("item"), "item",
      d = 4, w = 4096).collect()
    assert(est.length == 1)
    // w=4096 with 100 distinct items: overwhelmingly likely every row has
    // an empty counter for this item; at minimum the estimate is finite
    assert(est.head.getLong(1) >= 0)
  }

  test("estimates are deterministic across reruns") {
    val occ = occurrences
    val sketch = Sketches.cmsSketch(occ, "item", d = 4, w = 512)
    val a = Sketches.cmsEstimate(sketch, occ.distinct(), "item", 4, 512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = Sketches.cmsEstimate(sketch, occ.distinct(), "item", 4, 512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("HLL: union of per-group sketches equals the direct global " +
       "estimate; error stays small; partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val items = (0 until 20000).map { i =>
      (s"g${i % 5}", s"item${rnd.nextInt(8000)}")
    }.toDF("grp", "item")
    val perGrp = items.groupBy("grp").agg(
      hll_sketch_agg(col("item")).as("sk"),
      countDistinct(col("item")).as("exact"))
    val unioned = perGrp
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = items
      .agg(hll_sketch_estimate(hll_sketch_agg(col("item"))).as("est"))
      .head().getLong(0)
    assert(unioned == direct,
           s"union-of-sketches $unioned must equal direct $direct")
    val exact = items.select("item").distinct().count()
    assert(math.abs(direct - exact).toDouble / exact < 0.05,
           s"HLL error too large: est $direct vs exact $exact")
    val repart = items.repartition(23)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("item"))).as("est"))
      .head().getLong(0)
    assert(repart == direct, "estimate must not depend on partitioning")
  }

  test("logBin: monotone, lower-bound-inverting, one-bin-width tight") {
    import spark.implicits._
    val vs = (1L to 5000L).toDF("v")
      .withColumn("bin", Sketches.logBin(col("v")))
      .withColumn("lb", Sketches.logBinLowerBound(col("bin")))
      .orderBy("v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    vs.sliding(2).foreach { case Array((_, b1, _), (_, b2, _)) =>
      assert(b1 <= b2, "bin must be monotone in the value")
    }
    vs.foreach { case (v, _, lb) =>
      assert(lb <= v, s"lower bound $lb must not exceed value $v")
      assert(v - lb <= lb / 8 + 1,
             s"value $v strays more than one bin width from lb $lb")
    }
    // bounded sketch: 5000 values span ≤ 8·⌈log₂ 5000⌉ bins
    assert(vs.map(_._2).distinct.length <= 8 * 13)
  }

  test("binQuantiles picks the ceil-rank bin per scope") {
    import spark.implicits._
    // scope a: bins 0,8,16 with counts 5,4,1 (total 10)
    //   p50 → rank 5 → bin 0 (cum 5 ≥ 5); p90 → rank 9 → bin 8;
    //   p99 → rank 10 → bin 16
    val bins = Seq(("a", 0L, 5L), ("a", 8L, 4L), ("a", 16L, 1L))
      .toDF("scope", "bin", "cnt")
    val got = Sketches.binQuantiles(bins, Seq(50, 90, 99))
      .orderBy("q")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((50, 10L, 1L), (90, 10L, 2L), (99, 10L, 4L)))
  }

  test("log-bin quantiles: within one bin width of the exact order " +
       "statistic; per-group merge equals direct binning exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = (0 until 4000).map { i =>
      (s"g${i % 4}", rnd.nextInt(2000).toLong + 1L)
    }
    val df = data.toDF("grp", "v")
      .withColumn("bin", Sketches.logBin(col("v")))
    val perGrp = df.groupBy(col("grp").as("scope"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val merged = perGrp.groupBy("bin").agg(sum("cnt").as("cnt"))
      .select(lit("G").as("scope"), col("bin"), col("cnt"))
      .orderBy("bin")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val direct = df.groupBy("bin").agg(count(lit(1)).as("cnt"))
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(merged == direct,
           "summed per-group counters must equal direct binning")
    val qs = Seq(50, 90, 99)
    val quants = Sketches.binQuantiles(
      perGrp.unionByName(
        merged.toDF("bin", "cnt").select(lit("G").as("scope"),
                                         col("bin"), col("cnt"))),
      qs).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(3))).toMap
    val sorted = data.map(_._2).sorted
    qs.foreach { q =>
      val exact = sorted((sorted.length * q + 99) / 100 - 1)
      val lb = quants(("G", q))
      assert(lb <= exact && exact - lb <= lb / 8 + 1,
             s"p$q: sketch $lb vs exact $exact breaks the bin-width bound")
    }
  }
}
