package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native kernels for the MinHash-LSH banding stage (the last
  * interpreted higher-order expressions on the dedup hot path after
  * round 3's vector kernels).
  */
object SigKernels {

  /** One 64-bit key per band: an xxhash-style multiply-xor fold of the
    * band's signature slice. The key only needs to be deterministic
    * and collision-resistant — docs pair iff a band slice matches
    * EXACTLY, so any injective-enough fold yields the same pair set as
    * the former string-join+xxhash64 derivation (and no per-row string
    * materialization). Null slots (empty-signature docs) fold as a
    * distinct sentinel.
    */
  def bandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b97f4a7c15L + b
      var i = b * rows
      val end = i + rows
      while (i < end) {
        val v = if (sig.isNullAt(i)) 0x7f4a7c159e3779b9L else sig.getLong(i)
        h = java.lang.Long.rotateLeft(h ^ v, 27) * 0x94d049bb133111ebL
        i += 1
      }
      out(b) = h
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Number of slots where the two signatures agree (null slots agree
    * iff both null — matching `zip_with(a, b, _ === _)` under
    * null-safe counting of `true`s).
    */
  def agreement(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      val an = a.isNullAt(i); val bn = b.isNullAt(i)
      if (!an && !bn) { if (a.getLong(i) == b.getLong(i)) c += 1 }
      i += 1
    }
    c
  }
}

/** `sig_band_keys(sig)` — per-band bucket keys of a MinHash signature. */
case class SigBandKeys(child: Expression, bands: Int) extends UnaryExpression {
  require(bands > 0, "bands must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_sig_band_keys expects ARRAY<BIGINT>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SigKernels.bandKeys(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SigKernels.bandKeys($c, $bands);")

  override protected def withNewChildInternal(newChild: Expression): SigBandKeys =
    copy(child = newChild)
}

/** `sig_agreement(a, b)` — count of agreeing signature slots. */
case class SigAgreement(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _) | NullType, ArrayType(LongType, _) | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_sig_agreement expects two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SigKernels.agreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigKernels.agreement($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}
