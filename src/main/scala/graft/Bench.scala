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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-bench")

    val subset = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
      .filter(n => subset.forall(_.contains(n)))

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val results: Seq[(String, Double, Double, Boolean)] = names.map {
      name =>
      // Warmup this query's exact shape, untimed, right before timing.
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
      val okAll = passes.forall(_._2)
      val times = passes.map(_._1).sorted
      val spread = times.last / math.max(times.head, 1e-9)
      (name, times.head, spread, okAll)
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
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spreads,"ok":$oks,"sf":"$sfDir"}"""
    println(line)
    try Files.writeString(Paths.get("bench_out.json"), line)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
