package graft.operators

import graft.SparkSpec

/** Plan-shape assertions: the scale properties claimed in Scaladoc must be
  * visible in the executed plan at any SF.
  */
class PlanSpec extends SparkSpec {

  test("q05: dimension joins are BroadcastHashJoin") {
    val plan = RelationalQueries.q05RegionRevenue(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"region/nation joins must broadcast, plan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q01: shipdate filter is pushed to the parquet scan") {
    val plan = RelationalQueries.q01PricingSummary(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
           s"expected pushed filter on l_shipdate:\n$plan")
  }

  test("q06: scan reads only the four needed columns") {
    val plan = RelationalQueries.q06ForecastRevenue(spark, sf0001)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .forall(readSchema.contains), readSchema)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
           s"column pruning failed: $readSchema")
  }

  test("q03: top-10 plans as TakeOrderedAndProject, not a global sort") {
    val plan = RelationalQueries.q03ShippingPriority(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q17/q19: EXISTS / NOT EXISTS plan as semi and anti hash joins") {
    val semi = RelationalQueries.q17SemiJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(semi.contains("LeftSemi"), semi)
    val anti = RelationalQueries.q19AntiJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(anti.contains("LeftAnti"), anti)
  }

  test("q28 range join: binned equi-join, no nested-loop or cartesian") {
    val plan = TimeSeriesQueries.q28RangeJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q35 minhash dedup: no cartesian product anywhere in the plan") {
    val plan = LlmQueries.q35MinhashDedup(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q64 stratified sample: rank limit pushed below the sort (WindowGroupLimit)") {
    val plan = LlmQueries.q64StratifiedSample(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
           s"per-stratum top-n must not be a full per-stratum sort:\n$plan")
  }

  test("q67 decontamination: eval gram set broadcasts; no explode pre-filter re-evaluation") {
    val df = LlmQueries.q67Decontamination(spark, sf0001)
    df.collect() // final AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"train grams must never shuffle against the eval set:\n$plan")
    // InferFiltersFromGenerate is excluded in Sessions: the optimized plan
    // must NOT carry a size(...) filter above the gram explode, which
    // would re-evaluate the HOF gram tree per row (measured 8x)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("size(CASE WHEN"),
           s"generator pre-filter re-appeared — check excludedRules:\n$opt")
  }

  test("q94 hybrid retrieval: both ranker selections and the fused " +
       "top-20 plan as TakeOrderedAndProject, no corpus-wide sort") {
    val plan = LlmQueries.q94HybridRetrieval(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q96 mixture budget: stats join as one-row broadcasts; the only " +
       "sort is the per-source cumsum window") {
    val plan = LlmQueries.q96MixtureBudget(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // one-row total/weight-sum frames may plan as BroadcastNestedLoopJoin
    // (a 1-row broadcast is fine); what must NOT appear is a shuffled join
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q98 CMS: sketch side broadcasts; no cartesian; single token shuffle " +
    "feeds both sketch and exact sides") {
    val df = LlmQueries.q98CmsHeavyHitters(spark, sf0001)
    df.collect() // final AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"d×w sketch (≤2048 rows) must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q99 corpus stats: Zipf top-K plans as TakeOrderedAndProject, " +
    "never a global sort") {
    val plan = LlmQueries.q99CorpusStats(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
           s"top-100 tokens must be a per-partition top-k:\n$plan")
    assert(!plan.toLowerCase.contains("rangepartitioning"),
           s"no global sort of the vocabulary:\n$plan")
  }

  test("q97 cluster split: split assignment adds no shuffle beyond the " +
    "dedup mapping (no cartesian, no extra exchange stage)") {
    val plan = LlmQueries.q97ClusterSplit(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q105 changelog merge: latest-wins is an aggregation, not a " +
    "window sort; merge join is not a cartesian") {
    val plan = LlmQueries.q105ApplyChangelog(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
           s"latest-per-id must be max(struct), no window:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q106/q107 funnel + cohorts: no window sorts, no cartesians, " +
    "no per-user collection") {
    for (q <- Seq(TimeSeriesQueries.q106EventFunnel(spark, sf0001),
                  TimeSeriesQueries.q107RetentionCohorts(spark, sf0001))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"no window expected:\n$plan")
      assert(!plan.contains("CartesianProduct"))
      assert(!plan.contains("collect_list"),
             s"no per-user event collection:\n$plan")
    }
  }

  test("q108 PSI: no cartesian, no window; final sort is bucket-count " +
    "sized (the spine joins land before the internal materialization, " +
    "so the final plan only scans the checkpointed 10-row frame)") {
    val df = LlmQueries.q108QualityPsi(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("Window"))
  }

  test("whole-stage codegen covers the scalar query surface") {
    // codegen stages print as "*(n)" — only in the FINAL adaptive plan,
    // so force execution before inspecting
    val df = ScalarQueries.q07StringFuncs(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("round-9 row-local gates plan with ZERO data-scale exchanges") {
    // q133 / q135 / q136 / q139 claim scan-speed zero-shuffle plans in
    // PLANS.md; pin it. The only allowed Exchange is the final
    // single-partition ordering of the driver-facing ORDER BY — assert
    // no hash-partitioned (data-scale) exchange appears at all.
    for ((name, df) <- Seq(
           "q133" -> LlmQueries.q133BlocklistRatio(spark, sf0001),
           "q135" -> LlmQueries.q135LineQuality(spark, sf0001),
           "q136" -> LlmQueries.q136SpanCorrupt(spark, sf0001),
           "q139" -> LlmQueries.q139ScriptAnomalies(spark, sf0001))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
             s"$name must not shuffle, plan:\n$plan")
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("q132 domain cap / q141 epoch expand: one narrow shuffle; schedule broadcasts") {
    val capPlan = LlmQueries.q132DomainCap(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(capPlan.contains("WindowGroupLimit"),
           s"rank bound must push below the sort:\n$capPlan")
    val expPlan = LlmQueries.q141EpochExpand(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(expPlan.contains("BroadcastHashJoin"),
           s"the #sources schedule must broadcast:\n$expPlan")
    assert(!expPlan.contains("CartesianProduct"))
  }

  test("q154 semantic decon: eval collapses to one broadcast array row; " +
       "the train side is a row-local scan — zero data-scale shuffles") {
    val plan = LlmQueries.q154SemanticDecon(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
           s"the one-row eval array must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // the only exchanges allowed: the eval side's single-partition
    // collect and the driver-facing ORDER BY — never a hash shuffle or
    // a per-train-id sort of the train×eval product
    assert(!plan.contains("Exchange hashpartitioning"),
           s"train side must not shuffle:\n$plan")
    assert(!plan.contains("WindowGroupLimit") &&
             !plan.linesIterator.exists(_.trim.startsWith("Window")),
           s"argmax must be row-local, not a window:\n$plan")
  }

  test("q155 weighted sample / q156 cell sample: rank bound pushes below " +
       "the per-stratum sort (WindowGroupLimit)") {
    for ((name, df) <- Seq(
           "q155" -> LlmQueries.q155WeightedSample(spark, sf0001),
           "q156" -> LlmQueries.q156CellSample(spark, sf0001))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
             s"$name: per-stratum top-k must group-limit:\n$plan")
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("round-10 second wave (q161/q164/q166): no cartesian products, " +
       "every window keyed — the all-pairs and global-sort hazards of " +
       "scrub, image dedup, and segmentation stay structurally excluded") {
    for ((name, df) <- Seq(
           "q161" -> LlmQueries.q161SubstringScrub(spark, sf0001),
           "q164" -> LlmQueries.q164ImageDedup(spark, sf0001),
           "q166" -> LlmQueries.q166UnigramSegment(spark, sf0001))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
             s"$name must have no all-pairs stage:\n$plan")
      // every Window operator must carry a partition key (a keyless
      // window would drag the whole relation onto one task)
      val keyless = plan.linesIterator.filter(_.contains("Window "))
        .filter(_.contains("windowspecdefinition()"))
      assert(keyless.isEmpty,
             s"$name has an unpartitioned window:\n${keyless.mkString}")
    }
  }

  test("round-10 fourth/fifth wave: q179 assignment stays row-local " +
       "until the narrow aggs; q184 vocab broadcasts; q185 rides the " +
       "planner (broadcast dim, zero reducer skew); no cartesians " +
       "anywhere") {
    // q179: the rendezvous/mod assignments are pure projections — the
    // only shuffles are the (scheme)/(scheme, shard) aggs and the
    // 2-row join; assert no explode-driven Generate of the shard list
    // ever reaches an Exchange input width (no Generate at all: the
    // argmax is transform+array_max, not posexplode)
    val p179 = LlmQueries.q179RendezvousReshard(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p179.contains("Generate"),
           s"q179 must not explode the shard sequence:\n$p179")
    assert(!p179.contains("CartesianProduct"))
    // q184: the fixed-budget vocab joins as a broadcast, never a
    // shuffled join side
    val p184 = LlmQueries.q184VocabCoverage(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p184.contains("BroadcastHashJoin") ||
             p184.contains("BroadcastExchange"),
           s"q184 vocab must broadcast:\n$p184")
    assert(!p184.contains("CartesianProduct"))
    // q185 (adjudicated round 11): the planner path — the tiny dim
    // must BROADCAST, so no reducer skew can exist at all; the manual
    // salt stays in Skew.saltedJoin (SkewAndAggSpec + probe) for the
    // joins AQE cannot split
    val p185 = LlmQueries.q185SkewJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p185.contains("BroadcastHashJoin") ||
             p185.contains("BroadcastExchange"),
           s"q185 dim must broadcast:\n$p185")
    assert(!p185.contains("__salt"),
           s"q185 must ride the planner, not the manual salt:\n$p185")
    assert(!p185.contains("CartesianProduct"))
    // q188: digests aggregate — no joins at all in the manifest build,
    // and no window anywhere (sort_array inside agg, not a sort)
    val p188 = LlmQueries.q188IndexManifest(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p188.contains("CartesianProduct") &&
             !p188.contains("Window "),
           s"q188 must be pure aggregation:\n$p188")
    // q194: the quantile table rides a BROADCAST nested loop (3 rows),
    // never a cartesian shuffle; the windows run over the sketch-scale
    // bin table, after the corpus has been reduced by the binning agg
    val p194 = LlmQueries.q194LengthQuantiles(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p194.contains("BroadcastNestedLoopJoin"),
           s"q194 quantile cross join must broadcast:\n$p194")
    assert(!p194.contains("CartesianProduct"))
  }

  test("round-11 third wave: q219 bottom-k is WindowGroupLimit, q223 " +
       "reads only the index, q225 tops out without a global sort, " +
       "q226 never reads text") {
    val p219 = LlmQueries.queries("q219_kmv_roll")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p219.contains("WindowGroupLimit"),
           s"the k-cut must push below the sort:\n$p219")
    assert(!p219.contains("CartesianProduct"))
    val p223 = LlmQueries.queries("q223_retrieval_eval")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p223.contains("documents.parquet"),
           s"retrieval eval must read the index, not corpus text:\n$p223")
    assert(!p223.contains("CartesianProduct"))
    val p225 = LlmQueries.queries("q225_pmi_collocations")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p225.contains("TakeOrderedAndProject"),
           s"top-20 must be a distributed top-k, not a sort:\n$p225")
    assert(!p225.contains("CartesianProduct"))
    val p226 = LlmQueries.queries("q226_source_dup_matrix")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val docScans = p226.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("documents"))
    assert(docScans.forall(!_.contains("text")),
           s"q226 must not read text — clusters are the index:\n$p226")
    assert(!p226.contains("CartesianProduct"))
  }

  test("q200 daily roll: the publish job never scans corpus text — " +
       "base via persisted artifacts, delta via the materialized batch") {
    val plan = LlmQueries.queries("q200_daily_roll")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // every appearance of the documents table would be a corpus re-scan
    // the roll exists to avoid; the delta feeds in as the checkpointed
    // RDD, the base only through the index/artifact tables
    assert(!plan.contains("documents.parquet"),
           s"q200 must not re-scan corpus text:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
