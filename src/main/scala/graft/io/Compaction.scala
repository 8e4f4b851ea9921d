package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Small-file compaction — the unglamorous operation every 100 TB estate
  * runs constantly: streaming sinks, incremental ingests, and per-batch
  * upserts leave thousands of KB-scale files per partition, and scan cost
  * at scale is dominated by file-open overhead + lost row-group locality,
  * not bytes. Compaction rewrites a table to ~target-sized files.
  *
  * Two knobs do all the work, both standard Spark:
  *  - `repartition(n)` (or range-partition by a sort key) sets the file
  *    COUNT — n ≈ tableBytes / targetFileBytes;
  *  - `maxRecordsPerFile` caps the straggler file a skewed partition
  *    would otherwise produce.
  * Sorting within files (zorder-lite: range partition + in-file sort on
  * the filter key) is what makes min/max row-group stats selective, so
  * compaction is also the moment to lay data out for pruning.
  */
object Compaction {

  /** Rewrite `df` as `nFiles` parquet files of roughly equal row count.
    * Plain hash distribution — right when downstream scans have no
    * dominant filter key.
    */
  def compactParquet(df: DataFrame, path: String, nFiles: Int,
                     maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.repartition(nFiles).write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }

  /** Rewrite range-partitioned and in-file-sorted by `sortCol`, so every
    * output file owns a contiguous key range and parquet min/max stats
    * prune files AND row groups on `sortCol` filters — the layout to
    * choose when scans filter on a known column (date, id range).
    */
  def compactSortedParquet(df: DataFrame, path: String, nFiles: Int,
                           sortCol: String): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)

  /** Fixed-width bin of a numeric column into [0, 2^bits): the z-order
    * coordinate quantization. min/max come in as plain doubles (one
    * 1-row aggregate upstream); a degenerate constant column bins to 0.
    * The arithmetic is a single expression tree — `floor((x−mn)·2^bits ⁄
    * (mx−mn))` clamped — so another engine replays it bit-identically.
    */
  def zBin(c: Column, mn: Double, mx: Double, bits: Int): Column =
    if (mx == mn) lit(0L)
    else least(lit((1L << bits) - 1),
               greatest(lit(0L),
                        floor((c.cast("double") - lit(mn)) *
                          lit((1L << bits).toDouble) / lit(mx - mn))
                          .cast("long")))

  /** [[zBin]] with the min/max as COLUMNS (a broadcast 1-row stats join)
    * — the form a fully SQL-replayable query uses.
    */
  def zBinCol(c: Column, mn: Column, mx: Column, bits: Int): Column =
    when(mx === mn, lit(0L))
      .otherwise(least(lit((1L << bits) - 1),
                       greatest(lit(0L),
                                floor((c.cast("double") - mn) *
                                  lit((1L << bits).toDouble) / (mx - mn))
                                  .cast("long"))))

  /** Morton (Z-order) interleave of two `bits`-wide bins: bit i of A
    * lands at position 2i, bit i of B at 2i+1. Pure shift/mask
    * arithmetic (codegen'd; replayable as `>> << &` SQL in any engine).
    */
  def zInterleave(binA: Column, binB: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(binA, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(binB, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** [[zInterleave]] as SQL text over bin expressions `a` / `b` — for
    * DuckDB oracle replay.
    */
  private[graft] def zInterleaveSql(a: String, b: String,
                                    bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)}" +
        s" + (($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Rewrite clustered on the Z-ORDER curve of TWO filter columns — the
    * multi-dimensional generalization of [[compactSortedParquet]] (the
    * Delta OPTIMIZE ZORDER layout): each output file owns a contiguous
    * z-range, i.e. a small tile of the (colA, colB) plane, so parquet
    * min/max stats prune files for 2-D box predicates where a 1-D sort
    * can only prune on its lead column. One extra 1-row min/max
    * aggregate; the write itself is the same range-partition + in-file
    * sort. `bits` = 8 gives a 256×256 grid — file-granular pruning needs
    * far fewer cells than files, so 8 bits covers any realistic
    * `nFiles`.
    */
  def compactZOrderedParquet(df: DataFrame, path: String, nFiles: Int,
                             colA: String, colB: String,
                             bits: Int = 8): Unit = {
    val r = df.agg(min(col(colA).cast("double")),
                   max(col(colA).cast("double")),
                   min(col(colB).cast("double")),
                   max(col(colB).cast("double"))).head()
    val (minA, maxA, minB, maxB) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val z = zInterleave(zBin(col(colA), minA, maxA, bits),
                        zBin(col(colB), minB, maxB, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
