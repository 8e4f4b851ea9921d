package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (point-in-interval): `points ⋈ intervals ON lo <= v < hi` —
  * another operator Spark lacks a native physical strategy for. A naive
  * inequality join plans BroadcastNestedLoopJoin: every point × every
  * interval. Intractable once intervals outgrow a broadcast.
  *
  * Scale shape (brief preference (a), composition): overlay a fixed-width
  * bin grid. Each interval explodes into the bins it overlaps (bounded by
  * interval_span/binWidth); each point maps to exactly one bin. The join
  * becomes a bin equi-join — shuffle-partitionable on the bin key — with
  * the exact range predicate verified post-join. Work is
  * O(points + intervals × span/binWidth + matches), never points × intervals.
  */
object RangeJoin {

  /** @param binWidth grid step; choose ≈ median interval span so each
    *                 interval covers O(1) bins.
    */
  def binned(points: DataFrame, pointCol: String,
             intervals: DataFrame, loCol: String, hiCol: String,
             binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        // unconditionally include hi's bin: when hi sits exactly on a grid
        // line the extra boundary bin yields only false candidates, which
        // the exact range post-filter removes — an epsilon subtraction
        // would instead DROP the last bin (missed matches) whenever hi is
        // within the epsilon above a grid line, and is a double no-op for
        // large hi anyway
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
