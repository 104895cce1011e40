package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase blocklist tagging via a token-level Aho–Corasick
  * automaton (Aho & Corasick 1975) — the C4 "bad words" / RefinedWeb
  * URL-and-phrase blocklist shape. A production blocklist is tens of
  * thousands of phrases; testing them as `P` separate `contains`
  * probes is O(P·n) per document and a `P`-way regexp alternation
  * degrades the same way inside one opaque pattern. The automaton is
  * the scale answer: O(Σ|phrase|) states built ONCE driver-side
  * (model-sized — the blocklist, not the corpus), shipped to every
  * task in the UDF closure (broadcast by construction), and matching
  * is a single O(tokens) pass per document regardless of phrase
  * count. Map-side only — the operator adds ZERO shuffles; the tag
  * lands at scan speed and any downstream drop is a pushed filter.
  *
  * Matching is at TOKEN granularity (a phrase is a sequence of
  * normalized tokens; it matches only on token boundaries), which is
  * the published blocklist semantics — substring matching would flag
  * "scanner" for "scan". Tokenization is the corpus convention used
  * across this engine: lowercase, split on `\W+`, drop empties.
  * Overlapping phrases all report (suffix outputs propagate through
  * the fail links): with {"scan", "table scan"} the text "a table
  * scan" reports both.
  *
  * The per-row kernel is procedural by design (like the summarizer
  * kernel, x07/q17) and carries an oracled SQL twin (q75) proving the
  * match semantics against token-boundary containment.
  */
object Blocklist {

  /** Immutable token-level Aho–Corasick automaton. States are dense
    * ints; goto is a per-state Map[token -> state]; each state's
    * `out` lists the phrase indices ending there (own + suffix
    * outputs, pre-merged at build time so matching never walks fail
    * links).
    */
  final class AhoCorasick private (
      goto: Array[Map[String, Int]],
      fail: Array[Int],
      out: Array[Array[Int]],
      val phrases: Array[String]) extends Serializable {

    /** Distinct matched phrases in `tokens`, lexicographically sorted. */
    def matches(tokens: Seq[String]): Seq[String] = {
      val hit = mutable.SortedSet.empty[String]
      var s = 0
      tokens.foreach { t =>
        var cur = s
        while (cur != 0 && !goto(cur).contains(t)) cur = fail(cur)
        s = goto(cur).getOrElse(t, 0)
        out(s).foreach(i => hit += phrases(i))
      }
      hit.toSeq
    }
  }

  object AhoCorasick {
    /** Build from phrases (each split on the corpus token convention). */
    def apply(phraseList: Seq[String]): AhoCorasick = {
      val phrases = phraseList.toArray
      val tokensOf = phrases.map(_.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq)
      val goto = mutable.ArrayBuffer[mutable.Map[String, Int]](mutable.Map.empty)
      val ownOut = mutable.ArrayBuffer[mutable.ArrayBuffer[Int]](mutable.ArrayBuffer.empty)
      tokensOf.zipWithIndex.foreach { case (toks, pi) =>
        var s = 0
        toks.foreach { t =>
          s = goto(s).getOrElseUpdate(t, {
            goto += mutable.Map.empty; ownOut += mutable.ArrayBuffer.empty
            goto.size - 1
          })
        }
        if (toks.nonEmpty) ownOut(s) += pi
      }
      val n = goto.size
      val fail = new Array[Int](n)
      val out = ownOut.map(_.clone()).toArray
      val queue = mutable.Queue.empty[Int]
      goto(0).values.foreach { s => fail(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        goto(r).foreach { case (t, s) =>
          queue += s
          var f = fail(r)
          while (f != 0 && !goto(f).contains(t)) f = fail(f)
          fail(s) = if (goto(f).contains(t) && goto(f)(t) != s) goto(f)(t) else 0
          out(s) ++= out(fail(s)) // suffix outputs, pre-merged (BFS order makes fail(s)'s final)
        }
      }
      new AhoCorasick(goto.map(_.toMap).toArray, fail, out.map(_.toArray.distinct), phrases)
    }
  }

  /** Tag each document with its matched blocklist phrases.
    * Output: (doc_id, matched, n_matches, blocked) — `matched` the
    * sorted distinct phrases joined by ',' ('' when none), `blocked`
    * = any match. One projection, no shuffle.
    */
  def tagMatches(docs: DataFrame, phraseList: Seq[String]): DataFrame = {
    val ac = AhoCorasick(phraseList)
    val matchUdf = udf((toks: Seq[String]) =>
      if (toks == null) Seq.empty[String] else ac.matches(toks))
    val toks = graft.functions.GraftFunctions.tokenizeWords(col("text"))
    docs
      .select(col("doc_id"), matchUdf(toks).as("__m"))
      .select(col("doc_id"),
        array_join(col("__m"), ",").as("matched"),
        size(col("__m")).cast("long").as("n_matches"),
        (size(col("__m")) > 0).as("blocked"))
  }
}
