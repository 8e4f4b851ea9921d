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
}
