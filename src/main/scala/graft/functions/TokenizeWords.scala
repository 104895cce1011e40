package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel behind [[TokenizeWords]]: the text battery's
  * tokenization `filter(split(lower(text), "\\W+"), _ != "")`
  * replicated exactly (same `UTF8String.toLowerCase`, same Java
  * `\W+` regex split — [[ShingleKernel]]'s proven recipe), emitted as
  * one native array instead of two nested higher-order functions
  * (interpreted per-row tree walks — the same CodegenFallback cost
  * class round 2 measured on the similarity paths).
  */
/** Shared byte-level scanner for the `\W+` tokenizer family.
  *
  * Java's default-mode `\w` is EXACTLY `[a-zA-Z0-9_]` (no
  * UNICODE_CHARACTER_CLASS anywhere in these kernels), so the tokens
  * of `split(s, "\\W+")` are precisely the maximal runs of those four
  * ASCII byte classes — every other character, including every byte of
  * a multi-byte UTF-8 codepoint (all >= 0x80), is a separator. A byte
  * scan therefore reproduces the regex split exactly on ANY input.
  * The only step that can escape ASCII is `toLowerCase` (e.g. Kelvin
  * sign U+212A lowercases INTO 'k'), so the lowercasing variants keep
  * a pure-ASCII guard and fall back to the regex path otherwise —
  * the same guard recipe as `TextOps.tokenize` and `collapseWs`.
  * Law-checked against the regex twins in GraftProps/FunctionsSpec.
  */
private[functions] object AsciiScan {
  @inline def isWord(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  @inline def lower(c: Byte): Byte =
    if (c >= 'A' && c <= 'Z') (c | 0x20).toByte else c

  /** true iff every byte is < 0x80 (bytes are signed: >= 0). */
  def allAscii(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) { if (b(i) < 0) return false; i += 1 }
    true
  }

  /** number of maximal word-byte runs */
  def countTokens(b: Array[Byte]): Int = {
    var cnt = 0
    var i = 0
    val n = b.length
    while (i < n) {
      if (isWord(b(i))) { cnt += 1; while (i < n && isWord(b(i))) i += 1 }
      else i += 1
    }
    cnt
  }
}

object TokenizeKernel {
  private val SPLIT = java.util.regex.Pattern.compile("\\W+")

  def eval(text: UTF8String): ArrayData = {
    val b = text.getBytes
    if (AsciiScan.allAscii(b)) tokensAscii(b, toLower = true)
    else evalImpl(text.toLowerCase.toString)
  }

  /** Case-preserving variant: `filter(split(text, "\\W+"), _ != "")`
    * with NO lowercase — the chunk/paragraph builders' tokenizer
    * (their DuckDB oracles tokenize case-preserving). No lowercase
    * means no char can cross the ASCII boundary, so the byte scan is
    * exact on every input — no guard needed.
    */
  def evalRaw(text: UTF8String): ArrayData = tokensAscii(text.getBytes, toLower = false)

  private def tokensAscii(b: Array[Byte], toLower: Boolean): ArrayData = {
    val n = b.length
    val out = new Array[Any](AsciiScan.countTokens(b))
    var j = 0
    var i = 0
    while (i < n) {
      if (AsciiScan.isWord(b(i))) {
        val st = i
        while (i < n && AsciiScan.isWord(b(i))) i += 1
        val tok = java.util.Arrays.copyOfRange(b, st, i)
        if (toLower) {
          var k = 0
          while (k < tok.length) { tok(k) = AsciiScan.lower(tok(k)); k += 1 }
        }
        out(j) = UTF8String.fromBytes(tok)
        j += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  private def evalImpl(s: String): ArrayData = {
    val raw = SPLIT.split(s)
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    val out = new Array[Any](n)
    var j = 0
    i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { out(j) = UTF8String.fromString(raw(i)); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_tokenize(text)` — lowercase word tokens of a document as a
  * native array expression (`lower = false` keeps the original case —
  * the chunk-builder tokenizer). Law-checked against the declarative
  * twin (FunctionsSpec); used by every [[graft.ops.TextAnalysis]]
  * operator that tokenizes.
  */
case class TokenizeWords(child: Expression, lower: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_tokenize expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    if (lower) TokenizeKernel.eval(input.asInstanceOf[UTF8String])
    else TokenizeKernel.evalRaw(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (lower) "eval" else "evalRaw"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenizeKernel.$m($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeWords =
    copy(child = newChild)
}
