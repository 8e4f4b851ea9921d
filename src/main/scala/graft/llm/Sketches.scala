package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over the portable
  * md5-prefix hash family — the fixed-memory answer to token-frequency
  * questions that exact counting can't afford at corpus scale.
  *
  * Exact heavy hitters (q61) shuffle one row per DISTINCT token — fine
  * at sf0.1, but a 100 TB web corpus has billions of distinct tokens and
  * the shuffle is the bottleneck. The sketch aggregates into a fixed
  * d×w counter grid instead: partial aggregation collapses every
  * partition to ≤ d·w rows BEFORE the shuffle (map-side combine), so the
  * exchange moves ≤ d·w·partitions tiny rows regardless of vocabulary
  * size, and the merged sketch (≤ d·w rows ≈ KBs) broadcasts for
  * estimation. Estimates never undercount; overcount is bounded by
  * e·N/w with probability 1−(1/2)^d.
  *
  * Spark ships a CountMinSketch (`df.stat.countMinSketch`) whose murmur
  * hashing is engine-private; this one hashes with the portable
  * md5-prefix family so another SQL engine can replay sketch AND
  * estimate from inlined constants — which is how the DuckDB oracle
  * checks it end-to-end (q98).
  */
object Sketches {

  /** 60-bit md5-prefix of a string column as a non-negative long
    * (`('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB).
    */
  private def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  private def bucketOf(row: Column, item: Column, w: Int): Column =
    pmod(hash60(concat(row.cast("string"), lit(":"), item)), lit(w.toLong))

  /** Build the sketch: one row per non-empty (row, bucket) counter,
    * ≤ d·w rows total. `items` is one row per OCCURRENCE (pre-exploded).
    */
  def cmsSketch(items: DataFrame, itemCol: String,
                d: Int = 4, w: Int = 512): DataFrame = {
    require(d > 0 && w > 0, "d and w must be positive")
    // Round-17 (guide §2.3 "aggregate before you shuffle", §1.2 step 2):
    // hash DISTINCT items, not occurrences — the d md5 bucket addresses
    // per OCCURRENCE (4 × corpus tokens) dominated the sketch build;
    // counting per item first and summing weights into the counters is
    // count-distributivity, so the (row, bucket, cnt) output is
    // bit-identical while the md5 work drops from d·occurrences to
    // d·vocabulary. The per-item partial counts also map-side combine,
    // so the exchange carries vocabulary-, not corpus-, scale rows.
    items.select(col(itemCol).cast("string").as("item"))
      .groupBy("item").agg(count(lit(1)).as("__n"))
      .select(col("item"), col("__n"),
              explode(array((0 until d).map(lit): _*)).as("row"))
      .select(col("row"), col("__n"),
              bucketOf(col("row"), col("item"), w).as("bucket"))
      .groupBy("row", "bucket")
      // coalesce keeps cnt non-nullable, exactly like count()'s schema
      .agg(coalesce(sum("__n"), lit(0L)).as("cnt"))
  }

  /** Point-estimate the count of each distinct item in `queries`:
    * min over the d rows of the addressed counters. The sketch side is
    * ≤ d·w rows, so the join is a broadcast — query items never shuffle.
    * Items hashing to an absent counter (never observed) estimate 0.
    */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
                  d: Int = 4, w: Int = 512): DataFrame = {
    require(d > 0 && w > 0, "d and w must be positive")
    queries.select(col(itemCol).cast("string").as("item")).distinct()
      .select(col("item"),
              explode(array((0 until d).map(lit): _*)).as("row"))
      .select(col("item"), col("row"),
              bucketOf(col("row"), col("item"), w).as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** The bucket expression as DuckDB SQL (for oracles): row `r` over an
    * `item` column expression.
    */
  private[graft] def bucketSql(r: String, item: String, w: Int): String =
    s"(('0x' || substr(md5(CAST($r AS VARCHAR) || ':' || $item), 1, 15))::BIGINT) % $w"

  // ------------------------------------------------------------------
  // Log-octave quantile histogram — the mergeable percentile sketch.
  //
  // Exact percentiles need a corpus-wide sort (or one shuffled row per
  // distinct value); `percentile_approx`'s GK sketch is engine-private.
  // This histogram is both MERGEABLE and PORTABLE: values bin into 8
  // sub-buckets per power-of-two octave, so a shard keeps ≤ 8·log₂(max)
  // counter rows (a few hundred bytes), shard sketches merge by plain
  // counter addition (sum is associative — merged ≡ direct is an exact
  // invariant, not an estimate bound), and any SQL engine replays the
  // bin boundaries bit-identically because floor(log₂ v) is computed as
  // the binary-digit count `length(bin(v)) - 1`, never a floating log.
  // A quantile answered at its bin's lower bound is within one bin
  // width (≤ 12.5% relative) of the true order statistic, and the
  // answer is a pure function of the counters — deterministic across
  // partitionings, engines, and merge orders.
  // ------------------------------------------------------------------

  /** Histogram bin of a POSITIVE long value: `pw·8 + (v·8 div 2^pw) − 8`
    * with `pw = floor(log₂ v)` from the binary digit count. The
    * divisions are by powers of two, exact in double for v < 2^50, so
    * `floor` reproduces integer division exactly — same arithmetic as
    * the DuckDB replay's `//`.
    */
  def logBin(v: Column): Column = {
    val pw  = (length(bin(v)) - 1).cast("long")
    val oct = pow(lit(2.0), pw.cast("double"))
    pw * 8 + floor((v * 8).cast("double") / oct).cast("long") - 8
  }

  /** Smallest value mapping to `binId` — the deterministic quantile
    * answer: `2^pw + (sub · 2^pw) div 8` for `pw = binId div 8`,
    * `sub = binId mod 8`.
    */
  def logBinLowerBound(binId: Column): Column = {
    val pw  = floor(binId.cast("double") / 8.0).cast("long")
    val sub = binId - pw * 8
    val oct = pow(lit(2.0), pw.cast("double"))
    oct.cast("long") +
      floor((sub.cast("double") * oct) / 8.0).cast("long")
  }

  /** Quantiles from a bin-count table `(scope, bin, cnt)`: for each
    * scope and each percentage in `qs`, the lower bound of the first
    * bin whose cumulative count reaches `ceil(total·q/100)` (picked via
    * the integer-exact `cum·100 ≥ total·q`), plus the scope's total row
    * count. The input is sketch-scale (≤ scopes × 8·log₂(max) rows), so
    * the windows and the tiny quantile cross join never see corpus
    * data — the only corpus-scale work is the caller's binning
    * aggregation, which map-side combines into ≤ #bins rows per
    * partition before its shuffle.
    */
  def binQuantiles(bins: DataFrame, qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
            "quantile percentages must be in [1, 100]")
    import org.apache.spark.sql.expressions.Window
    val cum = bins
      .withColumn("__cum",
                  sum("cnt").over(Window.partitionBy("scope").orderBy("bin")))
      .withColumn("__total", sum("cnt").over(Window.partitionBy("scope")))
    val qt = bins.sparkSession
      .createDataFrame(qs.map(Tuple1(_))).toDF("q")
    cum.crossJoin(broadcast(qt))
      .filter(col("__cum") * 100 >= col("__total") * col("q"))
      .groupBy("scope", "q")
      .agg(min("bin").as("__pbin"), max("__total").as("n_rows"))
      .withColumn("value_lb", logBinLowerBound(col("__pbin")))
      .select("scope", "q", "n_rows", "value_lb")
  }

  /** [[logBin]] as DuckDB SQL over a BIGINT value expression. */
  private[graft] def logBinSql(v: String): String =
    s"(CAST(length(bin($v)) - 1 AS BIGINT) * 8" +
      s" + ($v * 8) // (CAST(1 AS BIGINT) << (length(bin($v)) - 1)) - 8)"

  /** [[logBinLowerBound]] as DuckDB SQL over a BIGINT bin expression. */
  private[graft] def logBinLowerBoundSql(b: String): String =
    s"((CAST(1 AS BIGINT) << CAST(($b) // 8 AS INTEGER))" +
      s" + ((($b) % 8) * (CAST(1 AS BIGINT) << CAST(($b) // 8 AS INTEGER))) // 8)"
}
