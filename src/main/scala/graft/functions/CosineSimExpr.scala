package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity between two numeric arrays — THE hot kernel of
  * every ANN/similarity operator, where the higher-order-function
  * formulation (aggregate∘zip_with with per-element lambda dispatch) is
  * interpreted. This expression runs the whole dot/norm computation as one
  * fused loop inside whole-stage codegen.
  *
  * Numerics are kept bit-identical to the HOF spec in
  * [[graft.llm.Similarity.cosine]] (and the DuckDB oracle): elements cast
  * to double, each of dot/normA/normB accumulated in index order with
  * double adds, result = dot / (sqrt(na) * sqrt(nb)).
  *
  * Registered as SQL function `cosine_sim` by [[graft.plans.GraftExtensions]].
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double>, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // Null elements inside either array propagate to a null result (the
  // zip_with/aggregate HOF twin folds null through the sums), so the
  // expression is nullable even over non-null array columns.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.compute(a.asInstanceOf[ArrayData],
                          b.asInstanceOf[ArrayData],
                          isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("cosRes")
      s"""
         |java.lang.Double $res = graft.functions.CosineSimExpr.compute(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Fused kernel, called from interpreted eval and generated Java alike.
    * Iterates min(len) pairs (zip_with semantics over equal-length arrays;
    * norms still cover each full array like the spec formulation). A null
    * element anywhere in either array yields null (boxed), matching the
    * HOF twin where null folds through the aggregate sums.
    */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    while (i < na) { if (a.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < nb) { if (b.isNullAt(i)) return null; i += 1 }
    var dot = 0.0; var qa = 0.0; var qb = 0.0
    i = 0
    val n = math.min(na, nb)
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    i = 0
    while (i < na) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      qa += x * x; i += 1
    }
    i = 0
    while (i < nb) {
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      qb += y * y; i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(qa) * math.sqrt(qb)))
  }
}
