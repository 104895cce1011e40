package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test splitting and the near-dup
  * leakage audit — the two bookends of every training-data release.
  *
  * `hashSplit` assigns each document to a named split by hashing its
  * id (md5, salted) to a uniform in [0,1) and walking the cumulative
  * weight ladder. Properties that matter at 10^12 docs:
  *   - STABLE: assignment is a pure function of (doc_id, salt) — a
  *     re-run, a backfill, or a different partitioning reproduces the
  *     same split; no RNG state, no global sort, no window.
  *   - MAP-SIDE: one codegen'd projection, zero shuffles; the split
  *     column lands at scan speed and prunes downstream.
  *   - PORTABLE: md5-hex-head arithmetic reproduces bit-identically
  *     in any engine (the q69/q64 convention), so an auditor can
  *     recompute membership outside Spark.
  * The uniform is the first 8 md5 hex chars of `doc_id:salt` parsed
  * as a long over 16^8 — 32 bits of split resolution, far below any
  * plausible weight granularity.
  *
  * `splitLeakage` is the audit: given near-dup pairs (a, b) and the
  * split assignment, report every pair that straddles two splits —
  * test-set leakage a dedup pass upstream of the split would have
  * prevented. Pair-frame-sized join (the pairs, not the corpus, flow
  * through), two broadcast-or-hash joins on doc_id.
  */
object Splits {

  private def u01(id: Column, salt: String): Column =
    graft.util.SqlCols.md5Head32(concat(id.cast("string"), lit(":" + salt)))
      .cast("double") / lit(4294967296.0)

  /** (doc_id, split) for every input row; `weights` are (name, w>0)
    * in ladder order, normalized internally.
    */
  def hashSplit(docs: DataFrame, weights: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights")
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val u = u01(col("doc_id"), salt)
    // last rung catches u exactly: cum.last == 1.0 up to IEEE, and the
    // otherwise covers the ulp edge
    val ladder = weights.map(_._1).zip(cum).dropRight(1)
      .foldRight(lit(weights.last._1): Column) { case ((name, c), rest) =>
        when(u < c, lit(name)).otherwise(rest)
      }
    docs.select(col("doc_id"), ladder.as("split"))
  }

  /** Annotate near-dup pairs with both sides' splits and the `leak`
    * verdict (a pair straddling two splits is test-set leakage a dedup
    * pass upstream of the split would have prevented). All pairs are
    * returned — the audit wants the denominator; filter on `leak` for
    * the offending set.
    */
  def splitLeakage(pairs: DataFrame, assignment: DataFrame): DataFrame =
    pairs
      .join(assignment.select(col("doc_id").as("a"), col("split").as("split_a")), Seq("a"))
      .join(assignment.select(col("doc_id").as("b"), col("split").as("split_b")), Seq("b"))
      .select(col("a"), col("b"), col("split_a"), col("split_b"),
        (col("split_a") =!= col("split_b")).as("leak"))
}
