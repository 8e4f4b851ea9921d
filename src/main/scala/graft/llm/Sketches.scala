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
    items.select(col(itemCol).cast("string").as("item"))
      .select(col("item"),
              explode(array((0 until d).map(lit): _*)).as("row"))
      .select(col("row"),
              bucketOf(col("row"), col("item"), w).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
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
}
