package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for each left row, the latest right
  * row with the same key and `rightTime <= leftTime` — the operator Spark
  * lacks natively and time-series stores ship built-in.
  *
  * Built by COMPOSITION (brief preference (a)): tag both sides, union,
  * one window pass per key ordered by (time, tag) with
  * last-observation-carried-forward via `last(_, ignoreNulls = true)`.
  *
  * Scale shape: exactly ONE shuffle (on the key, for the window) and zero
  * row fanout — unlike the naive inequality-join + row_number approach,
  * which multiplies each left row by all its time-predecessors before
  * pruning. Ties (rightTime == leftTime) match, mirroring standard ASOF
  * `>=` semantics (right rows sort before left rows at equal times).
  */
object AsOfJoin {

  /** @param rightVals right columns carried to the output (LOCF'd);
    *                   emitted under the same names — they must not clash
    *                   with left column names.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    val r = right.select(
      (col(key) +: col(rightTime).as("__t") +: rightVals.map(col)): _*)
      .withColumn("__tag", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1).drop("__t", "__tag")
  }
}
