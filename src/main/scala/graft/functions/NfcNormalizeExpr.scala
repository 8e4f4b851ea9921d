package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical first
  * step of web-corpus text cleaning (combining sequences → precomposed
  * forms, so "e" + U+0301 and "é" dedupe/tokenize identically). Spark has
  * no built-in normalizer; a Scala UDF would box every row out of
  * Tungsten, so this is a native expression: one
  * `java.text.Normalizer.normalize` call per row inside whole-stage
  * codegen, with a cheap `isNormalized` fast path (most corpus text is
  * already NFC and skips the rewrite entirely).
  *
  * Semantics match DuckDB's `nfc_normalize` (both implement Unicode NFC),
  * which is the oracle for `q60_unicode_norm`.
  *
  * Registered as SQL `nfc_normalize` by [[graft.plans.GraftExtensions]].
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalizeExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  import java.text.Normalizer

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
