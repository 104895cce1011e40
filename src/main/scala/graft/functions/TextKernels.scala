package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernels behind the last two per-row interpreted `aggregate` forms
  * the round-4 verdict flagged ([[graft.ops.TextAnalysis]] keeps both
  * declarative twins law-checked in FunctionsSpec):
  *
  *  - [[RollingFp31]]: the Rabin-Karp rolling fingerprint
  *    `aggregate(split(s, ""), 0L, (acc, ch) ->
  *       pmod(acc * 1000003 + ascii(ch), 2^31-1))` — Spark's
  *    `split(s, "")` yields one string per CODEPOINT (java regex ""
  *    boundaries are codepoint-aware) and `ascii` returns the leading
  *    codepoint (measured: ascii('é') = 233), so the kernel folds the
  *    string's codepoints;
  *  - [[TokenCountBpe]]: the BPE-ish subword count — nonempty pieces
  *    of the literal split regex (digit-run starts and every
  *    non-alphanumeric open a piece; a digit->letter transition does
  *    not) plus sum(len/4) over the lowercase `\W+` tokens. The regex
  *    is applied verbatim (same java.util.regex engine Spark's `split`
  *    uses) so the twin equality is by construction.
  */
object TextKernels {
  private val MOD = 2147483647L // 2^31 - 1

  def rollingFp(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = java.lang.Math.floorMod(h * 1000003L + cp, MOD)
      i += Character.charCount(cp)
    }
    h
  }

  /** The SQL summarize chain's sentence splitter:
    * `filter(transform(split(text, "[.!?]\\s+"), trim), _ != "")` —
    * consuming split (the DuckDB-parity form; RE2 has no lookbehind),
    * SQL-standard trim (SPACE 0x20 only — Spark's `trim` and DuckDB's
    * `trim` both strip only spaces, unlike java.lang.String#trim),
    * empties dropped.
    */
  def sentenceSplitSql(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    // byte-level twin of Pattern("[.!?]\\s+").split(str, -1) + trim(' ') + drop
    // empties (round-6). Exact on EVERY input, no ASCII guard needed:
    // the delimiter chars [.!?] and Java default-mode `\s` (six ASCII
    // bytes) are all < 0x80, and no byte of a multi-byte UTF-8
    // codepoint is < 0x80, so byte comparisons can never fire inside
    // one — the scan sees exactly the matches the regex engine sees,
    // greedy \s+ run included (law-checked in GraftProps).
    val b = s.getBytes
    val n = b.length
    @inline def isWs(c: Byte): Boolean =
      c == 0x20 || c == 0x09 || c == 0x0A || c == 0x0B || c == 0x0C || c == 0x0D
    val kept = new java.util.ArrayList[Any]()
    var start = 0
    var i = 0
    while (i <= n) {
      val atDelim = i < n && (b(i) == '.' || b(i) == '!' || b(i) == '?') &&
        i + 1 < n && isWs(b(i + 1))
      if (i == n || atDelim) {
        // piece = [start, i); SQL trim strips 0x20 only
        var a = start
        var e = i
        while (a < e && b(a) == 0x20) a += 1
        while (e > a && b(e - 1) == 0x20) e -= 1
        if (e > a) kept.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(b, a, e))): Unit
        if (i < n) {
          i += 2 // consume the delimiter char + first ws byte
          while (i < n && isWs(b(i))) i += 1
          start = i
        } else i += 1
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(kept.toArray)
  }

  private val BPE_SPLIT =
    java.util.regex.Pattern.compile("(?=[0-9])(?<=[^0-9])|(?=[^0-9a-zA-Z])|\\s+")
  private val WORD_SPLIT = java.util.regex.Pattern.compile("\\W+")

  def tokenXxhash64(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = s.getBytes
    if (AsciiScan.allAscii(b)) {
      // byte-scan fast path (round-6, the AsciiScan contract): tokens
      // are maximal [a-zA-Z0-9_] runs; each is lowercased into a
      // reused scratch and hashed directly — identical bytes, hence
      // identical seed-42 xxhash64, to the regex+String path.
      val n = b.length
      val out = new Array[Long](AsciiScan.countTokens(b))
      var maxTok = 0
      var i = 0
      while (i < n) {
        if (AsciiScan.isWord(b(i))) {
          val st = i
          while (i < n && AsciiScan.isWord(b(i))) i += 1
          if (i - st > maxTok) maxTok = i - st
        } else i += 1
      }
      val scratch = new Array[Byte](maxTok)
      var j = 0
      i = 0
      while (i < n) {
        if (AsciiScan.isWord(b(i))) {
          val st = i
          while (i < n && AsciiScan.isWord(b(i))) i += 1
          var k = st
          while (k < i) { scratch(k - st) = AsciiScan.lower(b(k)); k += 1 }
          out(j) = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            UTF8String.fromBytes(scratch, 0, i - st), StringType, 42L)
          j += 1
        } else i += 1
      }
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }
    val toks = WORD_SPLIT.split(s.toLowerCase.toString, -1)
    var n = 0
    var i = 0
    while (i < toks.length) { if (toks(i).nonEmpty) n += 1; i += 1 }
    val out = new Array[Long](n)
    var j = 0
    i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        out(j) = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          UTF8String.fromString(toks(i)), StringType, 42L)
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** One-pass byte-level twin of `trim(regexp_replace(s, "\s+", " "))`
    * (round-6: the collapse ran as a java.util.regex
    * Matcher.appendReplacement loop on every text span of the
    * extraction pipeline and every fingerprint() call — measured ~7%
    * of flagship task samples). Java's `\s` without UNICODE_CHARACTER_CLASS
    * is exactly the six ASCII bytes [ \t\n\x0B\f\r]; every byte of a
    * multi-byte UTF-8 codepoint is >= 0x80, so the byte scan can never
    * split or match inside one, and SQL `trim` strips only the 0x20
    * the collapse itself produced at the ends — so emitting nothing
    * for leading/trailing runs and one 0x20 for interior runs is
    * byte-for-byte the regex+trim composition.
    */
  def collapseWs(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == 0x20 || c == 0x09 || c == 0x0A || c == 0x0B || c == 0x0C || c == 0x0D) {
        if (o > 0) pendingSpace = true // leading runs vanish under trim
      } else {
        if (pendingSpace) { out(o) = 0x20; o += 1; pendingSpace = false }
        out(o) = c
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  def tokenCountBpe(s: UTF8String): Int = {
    val str = s.toString
    var count = 0
    val pieces = BPE_SPLIT.split(str, -1)
    var i = 0
    while (i < pieces.length) {
      if (pieces(i).nonEmpty) count += 1
      i += 1
    }
    // the `\W+` component only needs token LENGTHS: on the ASCII fast
    // path (see AsciiScan) those are the word-byte run lengths, no
    // allocation at all; lowercase cannot change a run's length on
    // pure-ASCII input
    val b = s.getBytes
    if (AsciiScan.allAscii(b)) {
      var k = 0
      val n = b.length
      while (k < n) {
        if (AsciiScan.isWord(b(k))) {
          val st = k
          while (k < n && AsciiScan.isWord(b(k))) k += 1
          count += (k - st) / 4
        } else k += 1
      }
    } else {
      val toks = WORD_SPLIT.split(s.toLowerCase.toString, -1)
      i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) count += toks(i).length / 4
        i += 1
      }
    }
    count
  }
}

/** `graft_count_in_set(toks)` — how many elements of a string array
  * are members of a FIXED string set (marker-word / stopword hit
  * counting): the native form of
  * `size(filter(toks, t -> t.isin(set)))`, whose IN-lambda is
  * interpreted per element. Counts OCCURRENCES (array_intersect would
  * dedup). Null elements are not members (IN's null never counts as
  * true under `filter`).
  */
case class CountInSet(child: Expression, items: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_count_in_set expects ARRAY<STRING>, got ${other.sql}")
  }
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](items.size * 2)
    items.foreach(i => s.add(UTF8String.fromString(i)))
    s
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set, classOf[java.util.HashSet[_]].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("cisI")
      val n = ctx.freshName("cisN")
      s"""
         |int $n = 0;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i) && $setRef.contains($c.getUTF8String($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

/** `graft_sentences_sql(text)` — the SQL summarize chain's sentence
  * list as one native pass; law-checked against the declarative
  * `filter(transform(split(...), trim), _ != "")` twin in
  * FunctionsSpec. (The KERNEL summarizer's lookbehind split lives in
  * [[graft.text.TextOps.splitSentences]] — this is the consuming-split
  * SQL-parity form q17/x07/x12-x14 ship.)
  */
case class SentenceSplitSql(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_sentences_sql expects STRING, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.sentenceSplitSql(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.sentenceSplitSql($c);")
  override protected def withNewChildInternal(newChild: Expression): SentenceSplitSql =
    copy(child = newChild)
}

/** `graft_token_xxh64(text)` — xxhash64 (Spark's seed-42 default) of
  * each lowercase word token, one fused pass: the native form of
  * `transform(graft_tokenize(text), t -> xxhash64(t))` (an
  * interpreted per-element lambda — x05's last HOF). Feeds
  * [[SimHash64]].
  */
case class TokenXxhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_token_xxh64 expects STRING, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenXxhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.tokenXxhash64($c);")
  override protected def withNewChildInternal(newChild: Expression): TokenXxhash64 =
    copy(child = newChild)
}

/** `graft_rolling_fp31(s)` — 31-bit rolling polynomial fingerprint of
  * a (caller-normalized) string; native codegen twin of
  * [[graft.ops.TextAnalysis.rollingFingerprintHof]].
  */
case class RollingFp31(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_rolling_fp31 expects STRING, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.rollingFp(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.rollingFp($c);")
  override protected def withNewChildInternal(newChild: Expression): RollingFp31 =
    copy(child = newChild)
}

/** `graft_collapse_ws(s)` — whitespace-run collapse + trim as one
  * native byte pass; the codegen twin of
  * `trim(regexp_replace(s, "\s+", " "))` (law-checked in
  * FunctionsSpec). Used by the extraction pipeline's text-span
  * cleanup and by [[graft.ops.Dedup.normalizedText]].
  */
case class CollapseWs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_collapse_ws expects STRING, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.collapseWs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.collapseWs($c);")
  override protected def withNewChildInternal(newChild: Expression): CollapseWs =
    copy(child = newChild)
}

/** `graft_token_count_bpe(s)` — deterministic BPE-ish subword count;
  * native codegen twin of
  * [[graft.ops.TextAnalysis.tokenCountBpeHof]].
  */
case class TokenCountBpe(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_token_count_bpe expects STRING, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenCountBpe(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.tokenCountBpe($c);")
  override protected def withNewChildInternal(newChild: Expression): TokenCountBpe =
    copy(child = newChild)
}
