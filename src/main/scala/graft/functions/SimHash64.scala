package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash of a pre-hashed token
  * array (`array<bigint>` -> `bigint`). Bit b of the result is set iff
  * the majority of token hashes have bit b set (vote +1/-1 per token,
  * strict majority) — identical semantics to the declarative twin
  * [[graft.ops.Dedup.simhashFromHashes]], which builds a 64-wide
  * `zip_with` expression tree per token and is kept as the
  * law-checked reference.
  *
  * `doGenCode` emits one loop over the array with a 64-slot vote
  * buffer — the Fingerprint64 pattern (SURVEY.md §7.4) — so the hot
  * path of `Dedup.simhash` participates in whole-stage codegen with
  * per-row cost O(tokens * 64) simple ALU ops instead of a deep
  * Catalyst tree evaluation.
  *
  * Null array elements count as a -1 vote on every bit (they cannot
  * occur from `xxhash64`, which is null-intolerant in our pipelines).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash64 expects ARRAY<BIGINT>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("shVotes")
      val i = ctx.freshName("shI")
      val b = ctx.freshName("shB")
      val h = ctx.freshName("shH")
      val acc = ctx.freshName("shAcc")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.isNullAt($i) ? 0L : $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $acc = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $acc |= 1L << $b;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
