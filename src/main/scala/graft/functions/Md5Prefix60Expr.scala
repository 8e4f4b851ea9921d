package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-element 60-bit md5-prefix hash of a string array
  * ([[PortableHash.hash60]]): one fused loop per row inside whole-stage
  * codegen, vs interpreting a `transform(arr, s ->
  * conv(substring(md5(s),1,15),16,10))` lambda per element. The portable
  * dedup family's shingle-hash kernel; null elements map to null (like
  * `md5(NULL)` in both engines).
  *
  * Registered as SQL `md5prefix60(arr)` by [[graft.plans.GraftExtensions]].
  */
case class Md5Prefix60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5prefix60 requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "md5prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix60Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60Expr =
    copy(child = newChild)
}

object Md5Prefix60Expr {
  def compute(arr: ArrayData): ArrayData = {
    val n   = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = PortableHash.hash60(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
