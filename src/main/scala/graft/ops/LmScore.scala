package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet's third filter leg (beside dedup and language id): language-
  * model quality scoring. The full KenLM 5-gram is a deployment-time
  * model artifact; the in-engine form is the unigram cross-entropy of
  * each document under a Laplace-smoothed LM trained on a reference
  * slice — the identical dataflow shape (token -> model prob join ->
  * per-doc mean surprisal) with a model that is itself a corpus
  * aggregate, so the whole operator is SQL-checkable.
  *
  * p(w) = (count_ref(w) + 1) / (total_ref + V); out-of-vocabulary
  * tokens get the unseen mass 1 / (total_ref + V). Score = mean of
  * -ln p(w) over the doc's tokens (nats; higher = less reference-
  * like), rounded to 4 — the round absorbs the sub-ulp libm
  * differences between engines. An empty reference clamps the
  * denominator to 1 (every token scores 0) rather than dividing by
  * zero.
  *
  * Scale shape: the model is ONE hash aggregation over the reference
  * slice; the denominator rides as a broadcast one-row cross join
  * (the whole operator stays a lazy DataFrame -> DataFrame transform
  * — no job at construction time, and the denominator is computed
  * from the same refCounts evaluation the probability join sees);
  * scoring is a token->word join (broadcast when the vocab is
  * broadcast-sized, one hash shuffle otherwise) + a doc-keyed mean —
  * never a second corpus pass, no window.
  */
object LmScore {

  def unigramCrossEntropy(docs: DataFrame, ref: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    def toks(c: Column) = filter(split(lower(c), "\\W+"), t => t =!= "")
    val refCounts = ref
      .select(explode(toks(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    val consts = refCounts.agg(
      greatest(coalesce(sum(col("c")), lit(0L)) + count(lit(1)), lit(1L))
        .cast("double").as("__denom"))
    val tok = docs.select(col(idCol), explode(toks(col(textCol))).as("word"))
    tok
      .join(refCounts, Seq("word"), "left")
      .crossJoin(broadcast(consts))
      .withColumn("__nll",
        -log((coalesce(col("c"), lit(0L)) + lit(1L)) / col("__denom")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__nll")), 4).as("cross_entropy"))
  }
}
