package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-capacity token bins (the pre-tokenization step of packed-sequence
  * training). Documents longer than the capacity get a bin of their own
  * (flagged truncatable by the caller's policy).
  *
  * Packing is first-fit per partition via mapPartitions — embarrassingly
  * parallel, zero shuffle, and the waste bound of first-fit (≤ 2× optimal
  * bins) holds per partition independently, so quality doesn't degrade as
  * the corpus grows. Bin ids are (partition << 32 | local), unique without
  * any cross-partition coordination.
  */
object TextPacking {

  val packedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("bin_id", LongType, nullable = false),
    StructField("bin_fill", LongType, nullable = false))) // fill AFTER adding

  def packDocuments(df: DataFrame, idCol: String, textCol: String,
                    capacity: Int): DataFrame = {
    require(capacity > 0)
    val in = df.select(
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("n_tokens"))
    val enc = Encoders.row(packedSchema)
    in.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      // open bins: (binLocalId, fill) — first-fit over the open list
      val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      rows.map { r =>
        val id = r.getLong(0)
        val n  = math.max(r.getLong(1), 1L)
        val fit = bins.indexWhere { case (_, fill) => fill + n <= capacity }
        val (binLocal, newFill) =
          if (n >= capacity) { // oversized → dedicated bin, not kept open
            val b = bins.size.toLong
            bins += ((b, capacity.toLong))
            (b, n)
          } else if (fit >= 0) {
            val (b, fill) = bins(fit)
            bins(fit) = (b, fill + n)
            (b, fill + n)
          } else {
            val b = bins.size.toLong
            bins += ((b, n))
            (b, n)
          }
        Row(id, n, (pid << 32) | binLocal, newFill)
      }
    }(enc)
  }
}
