package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Mixture realization planning — the arithmetic between a mixture
  * DESIGN (target weight per slice, a DoReMi/Pile-style recipe) and
  * its EXECUTION ([[Sampling.proportionalSample]] consumes the rates
  * this emits): given the corpus's actual per-slice token inventory
  * and a total token budget, compute each slice's target token count,
  * the sampling rate that realizes it, and the epoch count when the
  * slice must be UPSAMPLED (rate > 1 — the Wikipedia-seen-3x case).
  *
  *   target_s = floor(budget * w_s / sum(w))
  *   rate_s   = target_s / avail_s     (0 when the slice is empty)
  *   epochs_s = ceil(rate_s)           (passes over the slice)
  *
  * Slices present in the corpus but absent from the design get weight
  * 0 (target 0 — dropped by the plan, visible in the output rather
  * than silently missing); design entries with no corpus slice still
  * appear with avail 0, the auditable "recipe names a source we don't
  * have" row.
  *
  * Scale shape: ONE corpus aggregation (per-slice token sums — a
  * map-side-combine hash agg); everything after it operates on the
  * slice-count-sized model, full-outer-joined with the literal design
  * table (full outer can't broadcast — Spark warns and shuffles — but
  * both sides are O(slices) rows, so the exchange is a no-op at any
  * corpus size). The rate arithmetic is plain IEEE DOUBLE in a fixed
  * expression order, so any engine reproduces it bit-for-bit.
  */
object Mixture {

  def tokenBudgetPlan(docs: DataFrame, weights: Seq[(String, Double)],
                      budget: Long,
                      sliceCol: String = "source",
                      textCol: String = "text"): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0),
      "weights must be non-empty and non-negative")
    val sumW = weights.map(_._2).sum
    require(sumW > 0.0, "at least one weight must be positive")
    def toks(c: Column) = filter(split(lower(c), "\\W+"), t => t =!= "")
    val avail = docs
      .groupBy(col(sliceCol))
      .agg(sum(size(toks(col(textCol)))).as("avail_tokens"))
    val spark = docs.sparkSession
    import spark.implicits._
    val design = weights.toDF(sliceCol, "weight")
    avail.join(design, Seq(sliceCol), "full_outer")
      .select(col(sliceCol),
        coalesce(col("weight"), lit(0.0)).as("weight"),
        coalesce(col("avail_tokens"), lit(0L)).as("avail_tokens"))
      .withColumn("target_tokens",
        floor(lit(budget.toDouble) * col("weight") / lit(sumW)).cast("long"))
      .withColumn("rate",
        when(col("avail_tokens") > 0,
          round(col("target_tokens").cast("double") /
            col("avail_tokens").cast("double"), 6))
          .otherwise(lit(0.0)))
      .withColumn("epochs", ceil(col("rate")).cast("long"))
  }
}
