package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleaningSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-cleaning")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def clean(ss: String*): Seq[String] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    ss.toDF("t").select(TextAnalysis.cleanText(col("t"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("NFC composes decomposed sequences; canonical reordering applied") {
    assert(clean("Cafe\u0301") == Seq("Caf\u00e9"))
    assert(clean("A\u030A") == Seq("\u00c5"))
    // ccc reordering: dot-below (ccc 220) sorts before dot-above (ccc 230)
    assert(clean("q\u0307\u0323") == Seq("q\u0323\u0307"))
    // already-NFC text unchanged (the fast path)
    assert(clean("plain ascii") == Seq("plain ascii"))
  }

  test("control chars stripped, CRLF -> LF, whitespace discipline") {
    assert(clean("ab\u0007c\u0000") == Seq("abc"))
    assert(clean("line1\r\nline2\rline3") == Seq("line1\nline2\nline3"))
    assert(clean("a \t  b") == Seq("a b"))
    assert(clean("  lead  \n  mid \n\n\n\n trail  ") == Seq("lead\nmid\n\ntrail"))
    // tab inside a run collapses WITH the run; lone newline survives
    assert(clean("a\tb\nc") == Seq("a b\nc"))
  }

  test("boundary newlines stripped (trim() would keep them — oracle parity)") {
    // trailing/leading \n survive steps 2-6 (step 4 deliberately
    // excludes \n); the final strip must remove ALL whitespace, as the
    // q53 DuckDB twin's '^\s+|\s+$' does — regression for the
    // space-only functions.trim that diverged from the oracle
    assert(clean("abc\n") == Seq("abc"))
    assert(clean("\nabc") == Seq("abc"))
    assert(clean("\n\n a\nb \n\n") == Seq("a\nb"))
    assert(clean("\n\n") == Seq(""))
  }

  test("null-safe and empty-safe") {
    import spark.implicits._
    val got = Seq[Option[String]](None, Some(""), Some("   ")).toDF("t")
      .select(TextAnalysis.cleanText(col("t"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq(null, "", ""))
  }

  test("scriptProfile: per-script counts, non-latin fraction, dominant script") {
    import spark.implicits._
    val d = Seq(
      (1L, "hello world"),
      (2L, "привет мир"),
      (3L, "数据清洗"),
      (4L, "بيانات"),
      (5L, "abc данные 123"),
      (6L, "123 !!!")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(d).orderBy("doc_id").collect().map { r =>
      (r.getAs[Long]("doc_id"),
        (r.getAs[Number]("n_latin").longValue, r.getAs[Number]("n_cyrillic").longValue,
          r.getAs[Number]("n_han").longValue, r.getAs[Number]("n_arabic").longValue,
          r.getAs[Number]("n_digit").longValue),
        r.getAs[Double]("non_latin_frac"), r.getAs[String]("dominant_script"))
    }
    assert(got(0) == ((1L, (10L, 0L, 0L, 0L, 0L), 0.0, "latin")))
    assert(got(1) == ((2L, (0L, 9L, 0L, 0L, 0L), 1.0, "cyrillic")))
    assert(got(2) == ((3L, (0L, 0L, 4L, 0L, 0L), 1.0, "han")))
    assert(got(3) == ((4L, (0L, 0L, 0L, 6L, 0L), 1.0, "arabic")))
    assert(got(4) == ((5L, (3L, 6L, 0L, 0L, 3L), 0.666667, "cyrillic")))
    assert(got(5) == ((6L, (0L, 0L, 0L, 0L, 3L), 0.0, "none")))
  }
}
