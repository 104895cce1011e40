package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: k-permutation MinHash signature of a
  * pre-hashed shingle array (`array<bigint>` of 31-bit hashes ->
  * `array<bigint>` of length k). Permutation i is the affine transform
  * `(a_i * h + b_i) mod (2^31 - 1)` with Det-derived odd a / b —
  * EXACTLY the declarative twin [[graft.ops.Dedup.minhashSignature]]
  * (which stays as the law-checked reference), whose k *
  * `array_min(transform(...))` higher-order calls cost k interpreted
  * lambda evaluations per shingle. `doGenCode` emits one fused loop:
  * shingles outer, k mins inner — the Fingerprint64/SimHash64 pattern.
  *
  * An empty shingle array yields an all-null signature, matching
  * `array_min` over an empty transform.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "k must be positive")

  private val PRIME = 2147483647L // 2^31 - 1

  // identical coefficient derivation to Dedup.minhashSignature
  private lazy val coefA: Array[Long] =
    Array.tabulate(k)(i => (graft.util.Det.at(0x5eedL, i.toLong * 2) & 0x7fffffffL) | 1L)
  private lazy val coefB: Array[Long] =
    Array.tabulate(k)(i => graft.util.Det.at(0x5eedL, i.toLong * 2 + 1) & 0x7fffffffL)

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash expects ARRAY<BIGINT>, got ${other.sql}")
    }

  /** pmod semantics for the affine transform via floorMod (identical
    * to `%` on the 31-bit non-negative pipeline domain, and matching
    * the twin's `pmod` for negative inputs). Null elements are SKIPPED
    * — `array_min` in the twin ignores nulls — so an array of only
    * nulls (or an empty array) yields the twin's all-null signature.
    * Known divergence (documented): for |h| large enough that a*h+b
    * overflows Long, the twin throws under ANSI mode while this
    * expression wraps; 31-bit inputs (the [[graft.ops.Dedup]]
    * contract) never get there.
    */
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = java.lang.Math.floorMod(coefA(j) * h + coefB(j), PRIME)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(mins.map(Long.box(_): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mhMins")
      val i = ctx.freshName("mhI")
      val j = ctx.freshName("mhJ")
      val h = ctx.freshName("mhH")
      val v = ctx.freshName("mhV")
      val n = ctx.freshName("mhN")
      val res = ctx.freshName("mhRes")
      val seen = ctx.freshName("mhSeen")
      s"""
         |final int $n = $c.numElements();
         |Object[] $res = new Object[$k];
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) continue;
         |  $seen = true;
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = java.lang.Math.floorMod($aRef[$j] * $h + $bRef[$j], ${PRIME}L);
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |if ($seen) {
         |  for (int $j = 0; $j < $k; $j++) $res[$j] = Long.valueOf($mins[$j]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
