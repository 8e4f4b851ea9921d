package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
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
}
