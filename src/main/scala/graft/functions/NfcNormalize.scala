package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel behind [[NfcNormalize]]: Unicode NFC via `java.text.Normalizer`
  * with a cheap already-normalized fast path — `isNormalized` is a
  * quick-check table walk that accepts pure-ASCII (and most real text)
  * without allocating, so the common case returns the INPUT UTF8String
  * untouched and only genuinely decomposed rows pay the
  * decompose+compose. Parity note: JDK and utf8proc (DuckDB's
  * `nfc_normalize`) implement the same canonical composition —
  * verified on combining-sequence, reordering (ccc), and
  * composition-exclusion cases.
  */
object NfcKernel {
  import java.text.Normalizer
  def eval(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)` — Unicode NFC normalization as a native
  * expression (whole-stage codegen; Spark has no built-in normalizer).
  * The leading step of any corpus text-cleaning stage: byte-level
  * duplicates of canonically-equal text (`e` + COMBINING ACUTE vs
  * precomposed `é`) must collapse BEFORE fingerprint/dedup keys are
  * computed, or the same sentence hashes two ways.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_nfc expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcKernel.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcKernel.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
