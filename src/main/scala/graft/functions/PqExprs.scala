package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (IVF-PQ, the 10^12-vector ANN shape):
  * a vector of `dim` floats is encoded as `m` one-byte codes — each
  * subspace of dim/m dimensions quantized to its nearest of <=256
  * per-subspace centroids. Candidates then shuffle as m BYTES instead
  * of dim floats (dim=64, m=8: 32x less candidate traffic), and
  * queries rank candidates by asymmetric distance (ADC): the exact
  * query subvector against the candidate's quantized centroids.
  *
  * Codebooks are constructor constants (broadcast inside the plan,
  * like [[IvfProbes]]); both kernels are single fused loops.
  */
object PqKernels {

  /** Marker for "no residual subtraction" (raw-vector quantization). */
  val noCoarse: Array[Double] = Array.empty[Double]

  /** Flat offset of `cell`'s centroid, clamped into the codebook — a
    * corrupt/out-of-range cell id degrades deterministically (edge
    * centroid) instead of reading out of bounds.
    */
  private def clampBase(coarseFlat: Array[Double], dim: Int, cell: Int): Int =
    if (coarseFlat.length == 0) 0
    else {
      val nCells = coarseFlat.length / dim
      val cc = if (cell < 0) 0 else if (cell >= nCells) nCells - 1 else cell
      cc * dim
    }

  /** Reads past the vector's actual length return 0.0 — a ragged or
    * corrupt embedding row (numElements < m*subDim) degrades
    * deterministically instead of reading out-of-bounds ArrayData
    * (silent garbage on UnsafeArrayData, AIOOBE on GenericArrayData).
    * Same contract as VectorKernels.ivfProbes/planeDots.
    *
    * With a non-empty `coarseFlat` (k x dim row-major) the read is the
    * RESIDUAL component: v_i - coarse[cell]_i (classic residual PQ —
    * quantize the offset from the coarse centroid, tighter cells at
    * the same index shape).
    */
  private def elem(a: ArrayData, isFloat: Boolean, i: Int, n: Int,
                   coarseFlat: Array[Double], base: Int): Double = {
    val raw =
      if (i >= n) 0.0
      else if (isFloat) a.getFloat(i).toDouble
      else a.getDouble(i)
    if (coarseFlat.length > 0) raw - coarseFlat(base + i) else raw
  }

  /** Encode: byte s = argmin_c ||v_s - cb[s][c]||^2, ties to the lower
    * code. `flat` is (s, c, d)-major: flat[(s*codes + c)*subDim + d].
    */
  def encode(v: ArrayData, isFloat: Boolean, flat: Array[Double],
             m: Int, codes: Int, subDim: Int): Array[Byte] =
    encodeRes(v, isFloat, flat, m, codes, subDim, noCoarse, 0)

  /** [[encode]] of the residual v - coarse[cell] (see [[elem]]). */
  def encodeRes(v: ArrayData, isFloat: Boolean, flat: Array[Double],
                m: Int, codes: Int, subDim: Int,
                coarseFlat: Array[Double], cell: Int): Array[Byte] = {
    val out = new Array[Byte](m)
    val n = v.numElements()
    val cbase = clampBase(coarseFlat, m * subDim, cell)
    var s = 0
    while (s < m) {
      var best = 0
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < codes) {
        var d2 = 0.0
        val base = (s * codes + c) * subDim
        var d = 0
        while (d < subDim) {
          val diff = elem(v, isFloat, s * subDim + d, n, coarseFlat, cbase) - flat(base + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bd) { bd = d2; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** [[encode]] with `array<int>` output (SQL-indexable codes). */
  def encodeInts(v: ArrayData, isFloat: Boolean, flat: Array[Double],
                 m: Int, codes: Int, subDim: Int): ArrayData =
    encodeIntsRes(v, isFloat, flat, m, codes, subDim, noCoarse, 0)

  /** [[encodeRes]] with `array<int>` output. */
  def encodeIntsRes(v: ArrayData, isFloat: Boolean, flat: Array[Double],
                    m: Int, codes: Int, subDim: Int,
                    coarseFlat: Array[Double], cell: Int): ArrayData = {
    val bytes = encodeRes(v, isFloat, flat, m, codes, subDim, coarseFlat, cell)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) { out(s) = bytes(s) & 0xff; s += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC: sum over subspaces of ||q_s - centroid[s][code_s]||^2 —
    * the asymmetric (exact-query x quantized-candidate) squared
    * distance.
    */
  def adc(q: ArrayData, isFloat: Boolean, codeBytes: Array[Byte],
          flat: Array[Double], m: Int, codes: Int, subDim: Int): Double =
    adcRes(q, isFloat, codeBytes, flat, m, codes, subDim, noCoarse, 0)

  /** [[adc]] in residual space: the candidate's code quantizes
    * v - coarse[cell], so the query compares as q - coarse[cell] with
    * `cell` the CANDIDATE's coarse cell (known at the probe join).
    */
  def adcRes(q: ArrayData, isFloat: Boolean, codeBytes: Array[Byte],
             flat: Array[Double], m: Int, codes: Int, subDim: Int,
             coarseFlat: Array[Double], cell: Int): Double = {
    var acc = 0.0
    val n = q.numElements()
    val cbase = clampBase(coarseFlat, m * subDim, cell)
    var s = 0
    while (s < m) {
      val c = codeBytes(s) & 0xff
      val base = (s * codes + c) * subDim
      var d = 0
      while (d < subDim) {
        val diff = elem(q, isFloat, s * subDim + d, n, coarseFlat, cbase) - flat(base + d)
        acc += diff * diff
        d += 1
      }
      s += 1
    }
    acc
  }
}

/** `pq_codes(v)` — per-subspace code indices as `array<int>` (same
  * assignment as [[PqEncode]]; the SQL-indexable form `trainPq` uses
  * so one aggregation updates every subspace's codebook per Lloyd
  * round).
  */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {
  PqResChecks.requireRect(codebooks)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(child.dataType, "graft_pq_codes")

  private lazy val vFloat = VectorExprs.isFloat(child.dataType)
  private val m = codebooks.length
  private val codes = codebooks.head.length
  private val subDim = codebooks.head.head.length
  private lazy val flat: Array[Double] = codebooks.flatten.flatten.toArray

  override def nullSafeEval(v: Any): Any =
    PqKernels.encodeInts(v.asInstanceOf[ArrayData], vFloat, flat, m, codes, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqCodesFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernels.encodeInts($v, $vFloat, $flatRef, $m, $codes, $subDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** `pq_encode(v)` — m-byte PQ code of a vector. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {
  PqResChecks.requireRect(codebooks)

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(child.dataType, "graft_pq_encode")

  private lazy val vFloat = VectorExprs.isFloat(child.dataType)
  private val m = codebooks.length
  private val codes = codebooks.head.length
  private val subDim = codebooks.head.head.length
  private lazy val flat: Array[Double] = codebooks.flatten.flatten.toArray

  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], vFloat, flat, m, codes, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernels.encode($v, $vFloat, $flatRef, $m, $codes, $subDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc(q, code)` — asymmetric distance of an exact query vector to
  * a PQ-encoded candidate.
  */
case class PqAdc(left: Expression, right: Expression,
                 codebooks: Array[Array[Array[Double]]]) extends BinaryExpression {
  PqResChecks.requireRect(codebooks)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorExprs.checkVec(left.dataType, "graft_pq_adc")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else right.dataType match {
      case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"graft_pq_adc expects BINARY code, got ${other.sql}")
    }
  }

  private lazy val qFloat = VectorExprs.isFloat(left.dataType)
  private val m = codebooks.length
  private val codes = codebooks.head.length
  private val subDim = codebooks.head.head.length
  private lazy val flat: Array[Double] = codebooks.flatten.flatten.toArray

  override def nullSafeEval(q: Any, code: Any): Any =
    PqKernels.adc(q.asInstanceOf[ArrayData], qFloat, code.asInstanceOf[Array[Byte]],
      flat, m, codes, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqAdcFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.PqKernels.adc($q, $qFloat, $c, $flatRef, $m, $codes, $subDim);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** Residual-PQ variants: the code quantizes v - coarse[cell] (the
  * offset from the row's coarse IVF centroid) instead of the raw
  * vector — the classic recall improvement at identical index shape
  * (same m bytes per candidate, same probe join). `cell` is the
  * row's coarse cell id ([[graft.ops.Similarity.nearestCentroid]]);
  * both codebooks are constructor constants (plan literals, broadcast
  * by construction).
  */
object PqResChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def checkVecAndCell(vec: DataType, cell: DataType, fn: String): TypeCheckResult = {
    val v = VectorExprs.checkVec(vec, fn)
    if (v != TypeCheckResult.TypeCheckSuccess) v
    else cell match {
      case IntegerType | NullType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$fn expects INT cell id, got ${other.sql}")
    }
  }

  /** Codebooks must be RECTANGULAR: a ragged array passes a head-only
    * check and then silently misindexes the flattened
    * (s*codes + c)*subDim layout every kernel reads (garbage codes /
    * ADC distances, or an out-of-bounds read mid-job).
    */
  def requireRect(codebooks: Array[Array[Array[Double]]]): Unit = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty &&
      codebooks.head.length <= 256, "1..256 codes per subspace")
    val codes = codebooks.head.length
    val subDim = codebooks.head.head.length
    require(codebooks.forall(b => b.length == codes && b.forall(_.length == subDim)),
      s"ragged codebooks: every subspace needs exactly $codes codes of sub-dim $subDim")
  }

  def requireShapes(coarse: Array[Array[Double]],
                    codebooks: Array[Array[Array[Double]]]): Unit = {
    requireRect(codebooks)
    val dim = codebooks.length * codebooks.head.head.length
    require(coarse.nonEmpty && coarse.forall(_.length == dim),
      s"every coarse centroid must have dim $dim")
  }
}

/** `pq_codes_res(v, cell)` — [[PqCodes]] in residual space. */
case class PqCodesRes(left: Expression, right: Expression,
                      coarse: Array[Array[Double]],
                      codebooks: Array[Array[Array[Double]]])
  extends BinaryExpression {
  PqResChecks.requireShapes(coarse, codebooks)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    PqResChecks.checkVecAndCell(left.dataType, right.dataType, "graft_pq_codes_res")

  private lazy val vFloat = VectorExprs.isFloat(left.dataType)
  private val m = codebooks.length
  private val codes = codebooks.head.length
  private val subDim = codebooks.head.head.length
  private lazy val flat: Array[Double] = codebooks.flatten.flatten.toArray
  private lazy val coarseFlat: Array[Double] = coarse.flatten.toArray

  override def nullSafeEval(v: Any, cell: Any): Any =
    PqKernels.encodeIntsRes(v.asInstanceOf[ArrayData], vFloat, flat,
      m, codes, subDim, coarseFlat, cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqCodesResFlat", flat, "double[]")
    val coarseRef = ctx.addReferenceObj("pqCodesResCoarse", coarseFlat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.functions.PqKernels.encodeIntsRes($v, $vFloat, $flatRef, $m, $codes, $subDim, $coarseRef, $cell);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqCodesRes =
    copy(left = newLeft, right = newRight)
}

/** `pq_encode_res(v, cell)` — [[PqEncode]] in residual space. */
case class PqEncodeRes(left: Expression, right: Expression,
                       coarse: Array[Array[Double]],
                       codebooks: Array[Array[Array[Double]]])
  extends BinaryExpression {
  PqResChecks.requireShapes(coarse, codebooks)

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    PqResChecks.checkVecAndCell(left.dataType, right.dataType, "graft_pq_encode_res")

  private lazy val vFloat = VectorExprs.isFloat(left.dataType)
  private val m = codebooks.length
  private val codes = codebooks.head.length
  private val subDim = codebooks.head.head.length
  private lazy val flat: Array[Double] = codebooks.flatten.flatten.toArray
  private lazy val coarseFlat: Array[Double] = coarse.flatten.toArray

  override def nullSafeEval(v: Any, cell: Any): Any =
    PqKernels.encodeRes(v.asInstanceOf[ArrayData], vFloat, flat,
      m, codes, subDim, coarseFlat, cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqEncResFlat", flat, "double[]")
    val coarseRef = ctx.addReferenceObj("pqEncResCoarse", coarseFlat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.functions.PqKernels.encodeRes($v, $vFloat, $flatRef, $m, $codes, $subDim, $coarseRef, $cell);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncodeRes =
    copy(left = newLeft, right = newRight)
}

/** `pq_adc_res(q, cell, code)` — [[PqAdc]] in residual space: the
  * candidate's code quantizes v - coarse[cell], so the query side
  * compares q - coarse[cell] with `cell` the candidate's cell (the
  * probe-join key — already on every candidate row).
  */
case class PqAdcRes(first: Expression, second: Expression, third: Expression,
                    coarse: Array[Array[Double]],
                    codebooks: Array[Array[Array[Double]]])
  extends TernaryExpression {
  PqResChecks.requireShapes(coarse, codebooks)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val vc = PqResChecks.checkVecAndCell(first.dataType, second.dataType, "graft_pq_adc_res")
    if (vc != TypeCheckResult.TypeCheckSuccess) vc
    else third.dataType match {
      case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"graft_pq_adc_res expects BINARY code, got ${other.sql}")
    }
  }

  private lazy val qFloat = VectorExprs.isFloat(first.dataType)
  private val m = codebooks.length
  private val codes = codebooks.head.length
  private val subDim = codebooks.head.head.length
  private lazy val flat: Array[Double] = codebooks.flatten.flatten.toArray
  private lazy val coarseFlat: Array[Double] = coarse.flatten.toArray

  override def nullSafeEval(q: Any, cell: Any, code: Any): Any =
    PqKernels.adcRes(q.asInstanceOf[ArrayData], qFloat,
      code.asInstanceOf[Array[Byte]], flat, m, codes, subDim,
      coarseFlat, cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqAdcResFlat", flat, "double[]")
    val coarseRef = ctx.addReferenceObj("pqAdcResCoarse", coarseFlat, "double[]")
    nullSafeCodeGen(ctx, ev, (q, cell, c) =>
      s"${ev.value} = graft.functions.PqKernels.adcRes($q, $qFloat, $c, $flatRef, $m, $codes, $subDim, $coarseRef, $cell);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression, newSecond: Expression,
                                                 newThird: Expression): PqAdcRes =
    copy(first = newFirst, second = newSecond, third = newThird)
}
