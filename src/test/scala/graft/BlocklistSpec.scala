package graft

import graft.ops.Blocklist
import graft.ops.Blocklist.AhoCorasick
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BlocklistSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-blocklist")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Brute-force token-boundary containment — the documented semantics
    * the automaton must reproduce exactly.
    */
  private def brute(tokens: Seq[String], phrases: Seq[String]): Seq[String] =
    phrases.filter { p =>
      val pt = p.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
      pt.nonEmpty && tokens.indices.exists(i => tokens.slice(i, i + pt.size) == pt)
    }.sorted.distinct

  test("automaton == brute force, incl. nested + overlapping phrases") {
    spark.sparkContext.setLogLevel("WARN")
    val phrases = Seq("scan", "table scan", "table scan merge", "scan merge",
      "a b a", "b a b", "absent phrase")
    val ac = AhoCorasick(phrases)
    val cases = Seq(
      "the table scan merge path",          // scan + table scan + table scan merge + scan merge
      "a b a b a",                          // overlapping: both a-b-a and b-a-b
      "scan",                               // phrase == whole doc
      "scanner table scans",                // NO match: token boundary, not substring
      "table scan table scan",              // repeats dedup
      "")                                   // empty doc
    cases.foreach { text =>
      val toks = text.split("\\W+").filter(_.nonEmpty).toSeq
      assert(ac.matches(toks) == brute(toks, phrases), s"on '$text'")
    }
    assert(ac.matches(Seq("the", "table", "scan", "merge", "path")) ==
      Seq("scan", "scan merge", "table scan", "table scan merge"))
  }

  test("automaton == brute force on a deterministic random-ish stream") {
    val vocab = Vector("a", "b", "c", "d")
    val phrases = Seq("a", "a b", "b a", "c d c", "a b c d", "d d")
    val ac = AhoCorasick(phrases)
    // xorshift-ish deterministic token stream, no RNG
    val toks = (1 to 400).map(i => vocab(((i * 2654435761L) >>> 7).toInt & 3))
    (0 to 390 by 13).foreach { off =>
      val window = toks.slice(off, off + 37)
      assert(ac.matches(window) == brute(window, phrases), s"at offset $off")
    }
  }

  test("tagMatches: DataFrame plumbing, null text, sorted joined output") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the Table SCAN wins"),          // case-folded: scan + table scan
      (2L, "nothing of note"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Blocklist.tagMatches(docs, Seq("table scan", "scan", "foo bar"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, "scan,table scan", 2L, true),
      (2L, "", 0L, false),
      (3L, "", 0L, false)))
  }
}
