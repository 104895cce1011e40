package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel behind [[NgramJoin]]: all `n`-element windows of a
  * token array, each joined with a single separator — the fused native
  * form of the gram-window pattern
  *
  * {{{ transform(sequence(0, size(toks) - n), i ->
  *       array_join(slice(toks, i + 1, lit(n)), sep)) }}}
  *
  * which Catalyst evaluates INTERPRETED per row (higher-order
  * functions never enter whole-stage codegen, and the lambda
  * re-walks the expression tree per window). Semantics replicated
  * exactly from the declarative twin (kept law-checked in
  * FunctionsSpec):
  *
  *  - fewer than `n` elements (including the empty array) -> EMPTY
  *    array, matching `sequence(0, size - n)` being empty when
  *    `size - n < 0`... which it is NOT in Spark (`sequence(0, -1)`
  *    steps backwards!) — every call site guards with
  *    `when(size(toks) >= n, ...)`, so the kernel folds that guard in;
  *  - a NULL element inside a window is skipped by the join exactly
  *    like `array_join` without a null replacement (separator not
  *    doubled);
  *  - join cost is linear in window bytes via one reused buffer.
  */
object NgramKernel {

  def eval(arr: ArrayData, n: Int, sep: UTF8String): ArrayData = {
    val size = arr.numElements()
    if (size < n) return new GenericArrayData(new Array[Any](0))
    // decode each token to a java String ONCE (not once per window —
    // adjacent windows share n-1 tokens)
    val toks = new Array[String](size)
    var i = 0
    while (i < size) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      i += 1
    }
    val sepStr = sep.toString
    val out = new Array[Any](size - n + 1)
    val sb = new java.lang.StringBuilder()
    var s = 0
    while (s < out.length) {
      sb.setLength(0)
      var first = true
      var w = 0
      while (w < n) {
        val t = toks(s + w)
        if (t != null) {
          if (!first) sb.append(sepStr)
          sb.append(t)
          first = false
        }
        w += 1
      }
      out(s) = UTF8String.fromString(sb.toString)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_ngrams(toks, n[, sep])` — every `n`-token window of `toks`
  * joined with `sep` (default a single space); empty output below `n`
  * tokens. Native, codegen-participating replacement for the
  * interpreted `transform(sequence(...), i -> array_join(slice(...)))`
  * gram pattern (the round-4 verdict's last interpreted-HOF family:
  * distinct-n-grams, paragraph-chunk shingles, winnowing grams,
  * exact-substring grams).
  */
case class NgramJoin(child: Expression, n: Int, sep: String = " ")
    extends UnaryExpression {
  require(n > 0, "gram width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_ngrams expects ARRAY<STRING>, got ${other.sql}")
  }

  private lazy val sepUtf8 = UTF8String.fromString(sep)

  override def nullSafeEval(input: Any): Any =
    NgramKernel.eval(input.asInstanceOf[ArrayData], n, sepUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("ngramSep", sepUtf8,
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramKernel.eval($c, $n, $sepRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramJoin =
    copy(child = newChild)
}
