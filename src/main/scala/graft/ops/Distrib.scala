package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus distribution auditing — the drift/contamination dashboards
  * of a training-data pipeline: how far does each slice's unigram
  * distribution sit from the corpus (mixture re-balancing, crawl-
  * snapshot drift alarms, domain outlier detection)?
  *
  * `sliceKlDivergence` computes KL(P_s || Q) per slice s, with P_s
  * the slice's unigram distribution and Q the whole corpus's. Every
  * slice word also appears in the corpus, so q(w) > 0 wherever
  * p(w) > 0 and the sum needs NO smoothing — the value is exact
  * relational algebra (one ln per joined row, round(4) absorbing
  * libm ulps):
  *
  *   KL(P_s||Q) = sum_w (c_sw / n_s) * ln( (c_sw / n_s) / (c_w / n) )
  *
  * Scale shape: one hash agg by (slice, word) — the only corpus-
  * sized shuffle; the corpus distribution re-aggregates the MODEL
  * (O(slices x vocab) rows, never the corpus); totals ride a
  * broadcast one-row cross join; the final sum is slice-keyed.
  * KL >= 0 always (Gibbs); 0 iff the slice matches the corpus
  * exactly.
  */
object Distrib {

  def sliceKlDivergence(docs: DataFrame, sliceCol: String,
                        textCol: String = "text"): DataFrame = {
    def toks(c: Column) = filter(split(lower(c), "\\W+"), t => t =!= "")
    // pinned: cw/ns/the join all derive from sw — without the pin the
    // corpus-sized tokenize+agg lineage would run once PER consumer
    // (the model itself is O(slices x vocab), bounded)
    val sw = docs
      .select(col(sliceCol), explode(toks(col(textCol))).as("word"))
      .groupBy(col(sliceCol), col("word")).agg(count(lit(1)).as("csw"))
      .localCheckpoint()
    // corpus word counts: re-aggregate the slice model, not the corpus
    val cw = sw.groupBy(col("word")).agg(sum(col("csw")).as("cw"))
    val ns = sw.groupBy(col(sliceCol)).agg(sum(col("csw")).as("ns"))
    val n = cw.agg(greatest(coalesce(sum(col("cw")), lit(0L)), lit(1L))
      .cast("double").as("__n"))
    sw.join(cw, Seq("word"))
      .join(ns, Seq(sliceCol))
      .crossJoin(broadcast(n))
      .withColumn("__p", col("csw").cast("double") / col("ns").cast("double"))
      .withColumn("__q", col("cw").cast("double") / col("__n"))
      .groupBy(col(sliceCol))
      .agg(max(col("ns")).as("n_tokens"),
        round(sum(col("__p") * log(col("__p") / col("__q"))), 4).as("kl"))
  }
}
