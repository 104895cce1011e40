package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass distributed least squares — fit y ~ b0 + b1·x1 + b2·x2
  * per group with a SINGLE hash aggregation, no iteration, no driver
  * data. The normal equations for two centered regressors reduce to
  * the covariance form
  *
  *   [v11 v12] [b1]   [c1]         v_ij = covar_pop(x_i, x_j)
  *   [v12 v22]·[b2] = [c2]         c_i  = covar_pop(x_i, y)
  *
  * solved in closed form (Cramer, 2×2):
  *   det = v11·v22 − v12²
  *   b1  = (v22·c1 − v12·c2)/det,  b2 = (v11·c2 − v12·c1)/det
  *   b0  = ȳ − b1·x̄1 − b2·x̄2
  *   r²  = (b1·c1 + b2·c2)/var_pop(y)
  *
  * This is the pattern for ANY fixed-dimension model fit at 10^12
  * rows: the sufficient statistics (a p×p Gram/covariance block) are
  * a mergeable aggregation with map-side combine, and the solve is
  * O(p³) scalar math per GROUP — never per row, never on the driver.
  * Spark's builtin covar_pop/var_pop/avg are the aggregators, so the
  * whole fit is codegen'd and exactly mirrored by the DuckDB oracle
  * (both engines define the identical population moments).
  *
  * Degenerate groups are reported, not NaN-poisoned: det ≈ 0
  * (collinear or constant regressors) or var_pop(y) = 0 yields NULL
  * coefficients with `n` still populated, so a 10^12-slice audit
  * can see WHICH slices were unfittable.
  */
object Regression {

  /** Fit per `keys` group. Output: keys ++ (n, b0, b1, b2, r2),
    * coefficients rounded to 4 dp (cross-engine float contract).
    */
  def olsTwoFeature(df: DataFrame, y: Column, x1: Column, x2: Column,
                    keys: Seq[String] = Nil): DataFrame = {
    val kc = keys.map(col)
    val base = df.select(
      (kc ++ Seq(y.cast("double").as("__y"),
                 x1.cast("double").as("__x1"),
                 x2.cast("double").as("__x2"))): _*)
    val agg = base.groupBy(kc: _*).agg(
      count(lit(1)).as("n"),
      avg(col("__y")).as("__my"),
      avg(col("__x1")).as("__m1"),
      avg(col("__x2")).as("__m2"),
      var_pop(col("__x1")).as("__v11"),
      covar_pop(col("__x1"), col("__x2")).as("__v12"),
      var_pop(col("__x2")).as("__v22"),
      covar_pop(col("__x1"), col("__y")).as("__c1"),
      covar_pop(col("__x2"), col("__y")).as("__c2"),
      var_pop(col("__y")).as("__vy"))
    val det = col("__v11") * col("__v22") - col("__v12") * col("__v12")
    // relative singularity guard: both engines compute the identical
    // det from identical moments, so the cutoff is oracle-stable
    val ok = abs(det) > lit(1e-12) * col("__v11") * col("__v22") &&
      col("__vy") > lit(0.0)
    val b1 = (col("__v22") * col("__c1") - col("__v12") * col("__c2")) / det
    val b2 = (col("__v11") * col("__c2") - col("__v12") * col("__c1")) / det
    agg.select(
      (kc ++ Seq(
        col("n"),
        round(when(ok, col("__my") - b1 * col("__m1") - b2 * col("__m2")), 4).as("b0"),
        round(when(ok, b1), 4).as("b1"),
        round(when(ok, b2), 4).as("b2"),
        round(when(ok, (b1 * col("__c1") + b2 * col("__c2")) / col("__vy")), 4)
          .as("r2"))): _*)
  }
}
