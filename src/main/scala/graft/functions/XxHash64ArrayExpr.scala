package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{
  Expression, UnaryExpression, XxHash64Function
}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-element xxhash64 (seed 42, matching `functions.xxhash64(col)`) of a
  * string array in one fused loop — the throughput twin of
  * [[Md5Prefix60Expr]] for the xxhash64 dedup family. Replaces the
  * interpreted `transform(arr, s -> xxhash64(s))` HOF, which pays a
  * lambda-dispatch per element; property-tested identical. Null elements
  * map to null.
  *
  * Registered as SQL `xxhash64_array(arr)` by
  * [[graft.plans.GraftExtensions]].
  */
case class XxHash64ArrayExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xxhash64_array requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "xxhash64_array"

  override protected def nullSafeEval(input: Any): Any =
    XxHash64ArrayExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.XxHash64ArrayExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): XxHash64ArrayExpr =
    copy(child = newChild)
}

object XxHash64ArrayExpr {
  def compute(arr: ArrayData): ArrayData = {
    val n   = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}
