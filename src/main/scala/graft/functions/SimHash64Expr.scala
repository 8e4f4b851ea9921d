package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{
  Expression, UnaryExpression, XxHash64Function
}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash of a token array.
  *
  * Semantically identical to the higher-order-function formulation in
  * [[graft.llm.Dedup.withSimhash]] (equivalence is property-tested), but:
  *  - single pass over the tokens, one heap allocation (the vote array),
  *  - participates in whole-stage codegen via a static runtime call, where
  *    the HOF chain (aggregate∘zip_with∘getbit) is interpreted — on a
  *    100 TB corpus SimHash runs at scan speed instead of per-element
  *    lambda dispatch.
  *
  * Token hashing uses XxHash64 with seed 42 — the same function/seed as
  * `functions.xxhash64`, so signatures are comparable across both
  * formulations.
  *
  * Registered as SQL function `simhash64` by [[graft.plans.GraftExtensions]].
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Runtime kernel — called from both interpreted eval and generated
    * Java. One pass, branch-free inner loop.
    */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (((h >>> b) & 1L).toInt << 1) - 1 // +1 set, -1 clear
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
