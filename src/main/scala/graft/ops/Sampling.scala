package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the quota step of a training-data
  * mixture: per stratum (language, source, quality band, ...) keep
  * exactly `k` documents, chosen by a seedless deterministic
  * pseudo-random rank (md5 of the id rendered as text) so every
  * engine — and every rerun — picks the identical sample. No RNG, no
  * sampleBy approximation: quotas are exact, and the rule is plain
  * SQL (the DuckDB oracle is the same row_number window).
  *
  * Scale shape: a naive per-stratum window serializes a whale
  * stratum into one task (the asof/sessionize pathology). The
  * two-phase form bounds it: phase 1 ranks within (stratum, salt)
  * sub-groups — `salts` bounded tasks per stratum, each keeping only
  * its local top-k — and phase 2 ranks the <= salts*k survivors per
  * stratum exactly. Phase-1 local top-k is sound because the global
  * top-k by any total order is contained in the union of per-salt
  * top-ks (every non-survivor loses to k rows in its own salt, hence
  * to k rows globally).
  */
object Sampling {

  /** The deterministic rank key: md5 of the id's string rendering —
    * identical bytes in Spark and DuckDB (`md5(id::VARCHAR)`).
    */
  def detRank(idCol: Column): Column = md5(idCol.cast("string").cast("binary"))

  /** Per-stratum exact top-k sample: (stratum..., id, rn) with
    * rn = 1..k in deterministic-rank order.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String, k: Int,
                       idCol: String = "doc_id", salts: Int = 16): DataFrame = {
    require(k > 0 && salts > 0, "k and salts must be positive")
    val rank = detRank(col(idCol))
    val base = docs.select(col(stratumCol), col(idCol), rank.as("__r"))
    // phase 1: bounded sub-group top-k (31-bit hash domain — ANSI-safe)
    val salted = base.withColumn("__salt",
      pmod(xxhash64(col(idCol)), lit(salts)).cast("int"))
    val w1 = Window.partitionBy(col(stratumCol), col("__salt"))
      .orderBy(col("__r"), col(idCol))
    val survivors = salted
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= k)
    // phase 2: exact rank over <= salts*k rows per stratum
    val w2 = Window.partitionBy(col(stratumCol)).orderBy(col("__r"), col(idCol))
    survivors
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k)
      .select(col(stratumCol), col(idCol), col("rn"))
  }
}
