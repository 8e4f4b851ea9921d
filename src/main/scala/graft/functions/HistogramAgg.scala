package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** U6 surface — custom typed `Aggregator`: fixed-width histogram of a
  * double column over [lo, hi), open-ended edge bins. The engine's
  * user-defined-aggregation contract (registerable via `functions.udaf`),
  * demonstrated on the E7 histogram shape.
  *
  * Merge is element-wise vector addition → associative + commutative, so
  * Spark can partial-aggregate map-side and the shuffle carries one
  * `bins`-length array per partition regardless of input size.
  */
class HistogramAgg(bins: Int, lo: Double, hi: Double)
    extends Aggregator[Double, Array[Long], Seq[Long]] {
  require(bins > 0 && hi > lo)

  override def zero: Array[Long] = new Array[Long](bins)

  override def reduce(buf: Array[Long], x: Double): Array[Long] = {
    val idx0 = ((x - lo) / (hi - lo) * bins).toInt
    val idx  = math.min(bins - 1, math.max(0, idx0))
    buf(idx) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
