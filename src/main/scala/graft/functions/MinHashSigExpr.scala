package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{
  Expression, UnaryExpression, XxHash64Function
}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature of a shingle/token array: `numHashes` slots,
  * slot s = min over elements of xxhash64(element, seed = s).
  *
  * Matches [[graft.llm.Dedup.minhashSignature]] (the HOF spec:
  * `transform(sequence(0, n-1), seed -> array_min(transform(shingles, x ->
  * xxhash64(x, seed))))`) — property-tested identical — but hashes each
  * element once per seed in a fused loop inside whole-stage codegen instead
  * of interpreting n × |shingles| lambda calls. This is the dedup
  * signature kernel; at corpus scale it dominates MinHash cost.
  *
  * `functions.xxhash64(col, lit(seed))` hashes the seed value into the
  * running hash (seed param 42, then each child folded in); the kernel
  * replays exactly that: h = hashLong(seed, hashUTF8(x, 42)).
  *
  * Registered as SQL `minhash_signature(arr, numHashes)` by
  * [[graft.plans.GraftExtensions]].
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 512,
          s"numHashes must be in (0, 512], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Fused kernel: one UTF8 hash per element, then one cheap long-mix per
    * (element, seed) — identical numerics to
    * `xxhash64(element, lit(seed))`, which folds children left-to-right
    * from initial seed 42: hash(seed_val, LongType, hash(elem, StringType, 42)).
    */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var s = 0
        while (s < numHashes) {
          val h = XxHash64Function.hash(s, IntegerType, base)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    // empty/all-null input → HOF's array_min over empty gives null; we
    // return MaxValue sentinels instead of nulls only if nothing was seen
    new GenericArrayData(mins)
  }
}
