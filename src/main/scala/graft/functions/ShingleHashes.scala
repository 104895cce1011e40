package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel behind [[ShingleHashes]]: tokenize -> word n-gram
  * shingles -> distinct -> 31-bit hash, replicating the declarative
  * chain `shingleHashes(shingles(text, n))` in [[graft.ops.Dedup]]
  * step for step (the twin stays as the law-checked reference):
  *
  *  - tokens: `filter(split(lower(text), "\\W+"), _ != "")` — Spark's
  *    `lower` is `UTF8String.toLowerCase`, its `split` is the Java
  *    regex on the string form; both reproduced exactly;
  *  - shingles: `n`-token windows joined with " " when there are at
  *    least n tokens, else the single all-tokens join (empty string
  *    for an empty token list) — `Dedup.shingles`' degenerate branch;
  *  - distinct keeping FIRST occurrence (`array_distinct`);
  *  - hash: `pmod(xxhash64(shingle), 2^31-1)` — same seed-42 XxHash64
  *    Spark's `xxhash64` uses.
  */
object ShingleKernel {
  private val PRIME = 2147483647L // 2^31 - 1, Dedup.MINHASH_PRIME
  private val SPLIT = java.util.regex.Pattern.compile("\\W+")

  def eval(text: UTF8String, n: Int): ArrayData = {
    val toks0 = SPLIT.split(text.toLowerCase.toString)
    var nTok = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nTok += 1; i += 1 }
    val toks = new Array[String](nTok)
    var j = 0
    i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks(j) = toks0(i); j += 1 }
      i += 1
    }
    val shingleCount = if (nTok >= n) nTok - n + 1 else 1
    val seen = new java.util.LinkedHashSet[String](shingleCount * 2)
    if (nTok >= n) {
      val sb = new java.lang.StringBuilder()
      var s = 0
      while (s < shingleCount) {
        sb.setLength(0)
        var w = 0
        while (w < n) {
          if (w > 0) sb.append(' ')
          sb.append(toks(s + w))
          w += 1
        }
        seen.add(sb.toString): Unit
        s += 1
      }
    } else {
      seen.add(toks.mkString(" ")): Unit
    }
    val out = new Array[Long](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) {
      val h = XxHash64Function.hash(UTF8String.fromString(it.next()), StringType, 42L)
      out(k) = java.lang.Math.floorMod(h, PRIME)
      k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `shingle_hashes(text)` — 31-bit hashes of the distinct lowercase
  * word n-gram shingles of a document; the fused native form of
  * `Dedup.shingleHashes(Dedup.shingles(text, n))` (two nested
  * higher-order transforms = interpreted per-row tree walks — the
  * round-2 x04 residual cost). Feeds [[MinHashSig]].
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_shingle_hashes expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.eval($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
