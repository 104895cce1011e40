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
object TokenizeKernel {
  private val SPLIT = java.util.regex.Pattern.compile("\\W+")

  def eval(text: UTF8String): ArrayData = evalImpl(text.toLowerCase.toString)

  /** Case-preserving variant: `filter(split(text, "\\W+"), _ != "")`
    * with NO lowercase — the chunk/paragraph builders' tokenizer
    * (their DuckDB oracles tokenize case-preserving).
    */
  def evalRaw(text: UTF8String): ArrayData = evalImpl(text.toString)

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
