package graft

import graft.ops.{Curation, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-curation")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 60 words, no repeated bigrams, English markers present. */
  private def goodText(tag: String): String =
    (0 until 60).map(i =>
      if (i % 10 == 0) "the" else if (i % 10 == 5) "with" else s"$tag${i}z")
      .mkString(" ")

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("gopherQuality: each rule fires on its planted violation") {
    spark.sparkContext.setLogLevel("WARN")
    val docs = docsDf(Seq(
      1L -> goodText("alpha"),
      2L -> Seq.fill(30)("spam ham").mkString(" "),           // repeated bigram
      3L -> (0 until 60).map(i => s"${i}00").mkString(" "),   // no alphabetic words
      4L -> "the tiny with doc",                              // too short
      5L -> goodText("beta").replace("beta30z", "####...")))  // symbols ok at 1/60
    val g = TextAnalysis.gopherQuality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(g(1L).getAs[Boolean]("gopher_keep"))
    assert(!g(2L).getAs[Boolean]("gopher_keep"))
    assert(g(2L).getAs[Double]("top_bigram_frac") > 0.2)
    assert(!g(3L).getAs[Boolean]("gopher_keep"))
    assert(g(3L).getAs[Double]("frac_alpha_words") == 0.0)
    assert(!g(4L).getAs[Boolean]("gopher_keep"))
    assert(g(4L).getAs[Long]("n_words") == 4L)
    assert(g(1L).getAs[Long]("req_stop_hits") >= 2L)
    assert(g(1L).getAs[Double]("top_bigram_frac") <= 0.2)
  }

  test("piiScrub counts and redacts urls, emails, phones in order") {
    val docs = docsDf(Seq(
      1L -> "mail a.b+c@site.org or b@x.io call +62-555-123-4567 see https://ex.org/p?q=1 end",
      2L -> "clean text with no contact details at all"))
    val out = TextAnalysis.piiScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_urls") == 1L)
    assert(out(1L).getAs[Long]("n_emails") == 2L)
    assert(out(1L).getAs[Long]("n_phones") == 1L)
    assert(out(1L).getAs[String]("scrubbed") ==
      "mail <EMAIL> or <EMAIL> call <PHONE> see <URL> end")
    assert(out(2L).getAs[Long]("n_urls") == 0L &&
      out(2L).getAs[String]("scrubbed") == "clean text with no contact details at all")
  }

  test("verdict: exact-dup loser, low quality, wrong language, gopher fail all drop") {
    val good = goodText("alpha")
    val docs = docsDf(Seq(
      1L -> good,
      2L -> good,                                            // exact dup, higher id
      3L -> Seq.fill(30)("spam ham").mkString(" "),          // gopher fail
      4L -> "the tiny with doc",                             // short: quality + gopher fail
      5L -> goodText("gamma")))                              // independent good doc
    val v = Curation.verdict(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(v.size == 5)
    assert(v(1L).getAs[Boolean]("keep"))
    assert(!v(2L).getAs[Boolean]("keep") && !v(2L).getAs[Boolean]("is_exact_keeper"))
    assert(!v(3L).getAs[Boolean]("keep") && !v(3L).getAs[Boolean]("gopher_keep"))
    assert(!v(4L).getAs[Boolean]("keep"))
    assert(v(5L).getAs[Boolean]("keep"))
    assert(v(1L).getAs[String]("predicted_lang") == "en")
  }

  test("verdictFull additionally drops the minhash near-dup loser (higher id)") {
    val good = goodText("alpha")
    val nearDup = good.replace("alpha41z", "changedword") // 1 of 60 words differs
    val docs = docsDf(Seq(1L -> good, 6L -> nearDup, 5L -> goodText("gamma")))
    // without near-dup detection both variants survive
    val plain = Curation.verdict(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(plain(1L) && plain(6L) && plain(5L))
    // with it, the higher id of the verified pair drops
    val full = Curation.verdictFull(docs, nearDupThreshold = 0.7).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(full(1L).getAs[Boolean]("keep"))
    assert(!full(6L).getAs[Boolean]("keep") &&
      full(6L).getAs[Boolean]("is_neardup_loser"))
    assert(full(5L).getAs[Boolean]("keep") &&
      !full(5L).getAs[Boolean]("is_neardup_loser"))
  }

  test("distinctNgrams: hand-computed totals/distincts per n; repetition lowers the ratio; short docs skip") {
    import spark.implicits._
    val d = Seq(
      ("a", "x y x y"),   // 1g: 4 tot 2 dist; 2g: "x y","y x","x y" -> 3 tot 2 dist; 3g: 2 tot 2 dist
      ("a", "x"),         // contributes only one 1-gram (too short for 2/3-grams)
      ("b", "p q r")      // all distinct at every n
    ).toDF("source", "text")
    val out = TextAnalysis.distinctNgrams(d, ns = Seq(1, 2, 3))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("a", 1)) == (5L, 2L, 0.4))
    assert(out(("a", 2)) == (3L, 2L, 0.666667))
    assert(out(("a", 3)) == (2L, 2L, 1.0))
    assert(out(("b", 1)) == (3L, 3L, 1.0))
    assert(out(("b", 2)) == (2L, 2L, 1.0))
    assert(out(("b", 3)) == (1L, 1L, 1.0))
    // a source whose docs are all shorter than n emits no (source, n) row
    val short = Seq(("c", "solo")).toDF("source", "text")
    val rows = TextAnalysis.distinctNgrams(short, ns = Seq(1, 2)).collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1))).toSet == Set(("c", 1)))
  }
}
