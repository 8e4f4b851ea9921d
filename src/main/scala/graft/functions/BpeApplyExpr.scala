package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application over a token-array column — the fused
  * kernel behind [[graft.llm.BpeTrainer.tokenStream]] (round-17, guide
  * §1.2 step 2 "per-task work"): the composed form folds every word
  * through `numMerges` chained literal `replace` calls over a
  * marker-delimited symbol stream (`<c> <c> …`), allocating ~2 new
  * strings per (word, merge) — measured as the dominant per-task cost
  * of q101/q138/q170 (≈ 2 s each at sf0.1 for 40 merges). This kernel
  * runs the SAME algorithm directly on a token list: per merge rule,
  * one left-to-right non-overlapping adjacent-pair pass that resumes
  * AFTER each merge — exactly `UTF8String.replace`'s semantics on the
  * marker stream, which the `<sym>` wrapping makes token-boundary-safe
  * (normalized words are `\w`-only, so a marker match is always a whole
  * token; see the BpeTrainer scaladoc). Output is the space-joined
  * token stream of the whole word array, identical byte-for-byte to
  * `array_join(transform(words, applyMergesToWord(_, merges)), " ")`
  * — BpeTrainerSpec pins the equivalence on the real corpus plus the
  * repeat/chain/empty edges, and the q101/q138/q170 oracles hash it.
  *
  * Null elements are skipped without a delimiter (array_join's
  * documented null filtering); a null array yields null.
  */
case class BpeApplyExpr(child: Expression, mergesPacked: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_apply"

  override protected def nullSafeEval(input: Any): Any =
    BpeApplyExpr.compute(input.asInstanceOf[ArrayData], mergesPacked)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergesPacked,
                                  "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeApplyExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeApplyExpr = copy(child = newChild)

  // Array fields break case-class equality/semanticEquals; compare by
  // content so two identical bpe_apply calls are recognized as equal.
  override def equals(other: Any): Boolean = other match {
    case o: BpeApplyExpr =>
      child == o.child &&
        java.util.Arrays.equals(
          mergesPacked.asInstanceOf[Array[AnyRef]],
          o.mergesPacked.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.hashCode(mergesPacked.asInstanceOf[Array[AnyRef]])
}

object BpeApplyExpr {

  /** Pack a merge list as the flat (a, b, ab) triples the kernel scans
    * — precomputing `ab` avoids a concat per merge occurrence.
    */
  def pack(merges: Seq[(String, String)]): Array[String] = {
    val out = new Array[String](merges.length * 3)
    var i = 0
    merges.foreach { case (a, b) =>
      out(i) = a; out(i + 1) = b; out(i + 2) = a + b; i += 3
    }
    out
  }

  /** One word: char tokens → per-rule non-overlapping adjacent merge
    * passes (resuming after each merge, exactly like string replace on
    * the marker stream) → space-joined tokens appended to `sb`.
    */
  private def applyWord(w: String, merges: Array[String],
                        sb: java.lang.StringBuilder): Unit = {
    val n = w.length
    if (n == 0) return
    var toks = new Array[String](n)
    var cnt = n
    var i = 0
    while (i < n) { toks(i) = String.valueOf(w.charAt(i)); i += 1 }
    var m = 0
    while (m < merges.length && cnt > 1) {
      val a = merges(m); val b = merges(m + 1); val ab = merges(m + 2)
      var read = 0
      var write = 0
      while (read < cnt) {
        if (read + 1 < cnt && toks(read) == a && toks(read + 1) == b) {
          toks(write) = ab; read += 2
        } else {
          toks(write) = toks(read); read += 1
        }
        write += 1
      }
      cnt = write
      m += 3
    }
    i = 0
    while (i < cnt) {
      if (i > 0) sb.append(' ')
      sb.append(toks(i))
      i += 1
    }
  }

  def compute(words: ArrayData, merges: Array[String]): UTF8String = {
    val n = words.numElements()
    val sb = new java.lang.StringBuilder
    var first = true
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) { // null elements filtered, no delimiter
        if (!first) sb.append(' ')
        applyWord(words.getUTF8String(i).toString, merges, sb)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
