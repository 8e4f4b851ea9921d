package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused cosine argmax over a broadcast candidate array — THE hot loop of
  * semantic decontamination ([[graft.llm.Contamination.semanticContamination]]):
  * for one probe vector and an array of (id, vector) candidates, ONE pass
  * computes the max cosine, the arg-max id (ties → smallest id), and the
  * count of candidates at or above `threshold`. The higher-order-function
  * formulation (transform → array_max + filter/size) walks the candidate
  * array three times through interpreted lambda dispatch; this kernel walks
  * it once inside whole-stage codegen.
  *
  * Numerics are bit-identical to the HOF twin: each pair's cosine is
  * [[CosineSimExpr.compute]] (double accumulation in index order), the
  * argmax compares exact doubles, and the tie rule matches
  * max(struct(cos, -id)). Null candidate entries, null fields, and null
  * cosines (null vector elements) are SKIPPED — same as the HOF chain
  * folding null out of array_max. An empty/all-skipped candidate array
  * yields (null, null, 0) — the all-clean report.
  *
  * Returns struct<closest: bigint, max_cos: double, n_hits: bigint>.
  * Registered as SQL `cosine_argmax(vec, candidates, threshold)` by
  * [[graft.plans.GraftExtensions]].
  */
case class CosineArgmaxExpr(left: Expression, right: Expression,
                            threshold: Double)
    extends BinaryExpression {

  private def vecOk(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val candOk = right.dataType match {
      case ArrayType(StructType(Array(a, b)), _) =>
        a.dataType == LongType && vecOk(b.dataType)
      case _ => false
    }
    if (vecOk(left.dataType) && candOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cosine_argmax requires (array<float|double>, " +
        s"array<struct<bigint, array<float|double>>>), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("closest", LongType, nullable = true),
    StructField("max_cos", DoubleType, nullable = true),
    StructField("n_hits", LongType, nullable = false)))

  override def prettyName: String = "cosine_argmax"

  private def tvFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def evFloat: Boolean = right.dataType match {
    case ArrayType(StructType(fs), _) => fs(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  override protected def nullSafeEval(tv: Any, evs: Any): Any =
    CosineArgmaxExpr.compute(tv.asInstanceOf[ArrayData],
                             evs.asInstanceOf[ArrayData],
                             tvFloat, evFloat, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineArgmaxExpr.compute($a, $b, " +
        s"$tvFloat, $evFloat, ${java.lang.Double.toString(threshold)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineArgmaxExpr =
    copy(left = newLeft, right = newRight)
}

object CosineArgmaxExpr {
  /** One pass over the candidate array; pairs whose cosine is null (null
    * vector elements) or whose entry/fields are null are skipped for BOTH
    * the argmax and the hit count.
    */
  def compute(tv: ArrayData, evs: ArrayData,
              tvFloat: Boolean, evFloat: Boolean,
              threshold: Double): GenericInternalRow = {
    val n = evs.numElements()
    var any = false
    var bestCos = 0.0
    var bestId = 0L
    var hits = 0L
    var i = 0
    while (i < n) {
      if (!evs.isNullAt(i)) {
        val entry = evs.getStruct(i, 2)
        if (!entry.isNullAt(0) && !entry.isNullAt(1)) {
          val eid = entry.getLong(0)
          val c = CosineSimExpr.compute(tv, entry.getArray(1),
                                        tvFloat, evFloat)
          if (c != null) {
            val cv = c.doubleValue()
            if (cv >= threshold) hits += 1
            if (!any || cv > bestCos || (cv == bestCos && eid < bestId)) {
              any = true; bestCos = cv; bestId = eid
            }
          }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      if (any) java.lang.Long.valueOf(bestId) else null,
      if (any) java.lang.Double.valueOf(bestCos) else null,
      java.lang.Long.valueOf(hits)))
  }
}
