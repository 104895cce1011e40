package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit polynomial rolling fingerprint of
  * a string (Rabin-Karp family, base 1000003, wrap-around arithmetic).
  *
  * This is the codegen upgrade path SURVEY.md §7.4 names: the same
  * fingerprint is expressible with `aggregate(split(...))` column
  * functions ([[graft.ops.TextAnalysis.rollingFingerprint]] keeps that
  * form, modulo-reduced, as the SQL-oracle-friendly twin), but a hot
  * inner loop over every character of every document deserves a single
  * generated loop over the UTF8String bytes rather than a per-character
  * array of single-char strings. `doGenCode` emits exactly that, so
  * the expression participates in whole-stage codegen.
  *
  * Registered for SQL as `graft_fingerprint64` (see [[GraftFunctions]]).
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint64 expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("fpBytes")
      val i = ctx.freshName("fpI")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}_acc = ${ev.value}_acc * 1000003L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** Registration + Column helpers for the native functions. */
object GraftFunctions {

  def fingerprint64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      Fingerprint64(org.apache.spark.sql.GraftBridge.toExpression(c)))

  def simhash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      SimHash64(org.apache.spark.sql.GraftBridge.toExpression(c)))

  def minhashSig(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      MinHashSig(org.apache.spark.sql.GraftBridge.toExpression(c), k))

  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      CosineSim(org.apache.spark.sql.GraftBridge.toExpression(a),
        org.apache.spark.sql.GraftBridge.toExpression(b)))

  def ivfProbes(v: Column, codebook: Array[Array[Double]], nProbe: Int): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      IvfProbes(org.apache.spark.sql.GraftBridge.toExpression(v), codebook, nProbe))

  def planeDots(v: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      PlaneDots(org.apache.spark.sql.GraftBridge.toExpression(v), planes))

  def shingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      ShingleHashes(org.apache.spark.sql.GraftBridge.toExpression(text), n))

  def rhpBucket(v: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      RhpBucket(org.apache.spark.sql.GraftBridge.toExpression(v), planes))

  def rhpProbes(v: Column, planes: Array[Array[Double]], probes: Int): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      RhpProbes(org.apache.spark.sql.GraftBridge.toExpression(v), planes, probes))

  def tokenizeWords(c: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      TokenizeWords(org.apache.spark.sql.GraftBridge.toExpression(c)))

  def countInSet(arr: Column, items: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      CountInSet(org.apache.spark.sql.GraftBridge.toExpression(arr), items))

  def collapseWs(c: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      CollapseWs(org.apache.spark.sql.GraftBridge.toExpression(c)))

  def sentencesSql(c: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      SentenceSplitSql(org.apache.spark.sql.GraftBridge.toExpression(c)))

  def tokenXxhash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      TokenXxhash64(org.apache.spark.sql.GraftBridge.toExpression(c)))

  def tokenizeRaw(c: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      TokenizeWords(org.apache.spark.sql.GraftBridge.toExpression(c), lower = false))

  def ngramJoin(toks: Column, n: Int, sep: String = " "): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      NgramJoin(org.apache.spark.sql.GraftBridge.toExpression(toks), n, sep))

  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      NfcNormalize(org.apache.spark.sql.GraftBridge.toExpression(c)))

  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      PqEncode(org.apache.spark.sql.GraftBridge.toExpression(v), codebooks))

  def pqCodes(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      PqCodes(org.apache.spark.sql.GraftBridge.toExpression(v), codebooks))

  def pqAdc(q: Column, code: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      PqAdc(org.apache.spark.sql.GraftBridge.toExpression(q),
        org.apache.spark.sql.GraftBridge.toExpression(code), codebooks))

  def pqCodesRes(v: Column, cell: Column, coarse: Array[Array[Double]],
                 codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      PqCodesRes(org.apache.spark.sql.GraftBridge.toExpression(v),
        org.apache.spark.sql.GraftBridge.toExpression(cell), coarse, codebooks))

  def pqEncodeRes(v: Column, cell: Column, coarse: Array[Array[Double]],
                  codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      PqEncodeRes(org.apache.spark.sql.GraftBridge.toExpression(v),
        org.apache.spark.sql.GraftBridge.toExpression(cell), coarse, codebooks))

  def pqAdcRes(q: Column, cell: Column, code: Column,
               coarse: Array[Array[Double]],
               codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      PqAdcRes(org.apache.spark.sql.GraftBridge.toExpression(q),
        org.apache.spark.sql.GraftBridge.toExpression(cell),
        org.apache.spark.sql.GraftBridge.toExpression(code), coarse, codebooks))

  def sigBandKeys(sig: Column, bands: Int): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      SigBandKeys(org.apache.spark.sql.GraftBridge.toExpression(sig), bands))

  def sigAgreement(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      SigAgreement(org.apache.spark.sql.GraftBridge.toExpression(a),
        org.apache.spark.sql.GraftBridge.toExpression(b)))

  /** Register SQL names on a session (idempotent). Parameterized
    * kernels take their constant as a foldable int literal (the
    * standard SQL-function shape for e.g. ngrams(n)).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String): Int =
      e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$what must be an INT literal, got $other")
      }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fingerprint64", exprs => Fingerprint64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hashes",
      exprs => ShingleHashes(exprs(0), litInt(exprs(1), "shingle width")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => MinHashSig(exprs(0), litInt(exprs(1), "k")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sig_agreement", exprs => SigAgreement(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokenize", exprs => TokenizeWords(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams",
      exprs => NgramJoin(exprs(0), litInt(exprs(1), "gram width")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "scala_udf")
  }
}
