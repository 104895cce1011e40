package graft

import graft.ops.Sampling
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sampling")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stratifiedSample == the naive per-stratum window; exact quotas; salt-count invariant") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // whale stratum (5000 docs) + tiny strata incl. one below quota
    val rows = (0 until 5000).map(i => (i.toLong, "whale")) ++
      (5000 until 5040).map(i => (i.toLong, "mid")) ++
      (5040 until 5043).map(i => (i.toLong, "tiny"))
    val df = rows.toDF("doc_id", "lang")
    val k = 10
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(Sampling.detRank(col("doc_id")), col("doc_id"))
    val naive = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("lang"), col("doc_id"), col("rn"))
      .orderBy(col("lang"), col("rn")).collect().map(_.toSeq).toSeq
    for (salts <- Seq(1, 4, 64)) {
      val got = Sampling.stratifiedSample(df, "lang", k, salts = salts)
        .orderBy(col("lang"), col("rn")).collect().map(_.toSeq).toSeq
      assert(got == naive, s"salts=$salts diverged from the naive window")
    }
    // quotas: full strata give exactly k, the below-quota stratum all 3
    val counts = naive.groupBy(_.head).view.mapValues(_.size).toMap
    assert(counts == Map("whale" -> k, "mid" -> k, "tiny" -> 3))
    // deterministic: same sample on a rerun
    val again = Sampling.stratifiedSample(df, "lang", k)
      .orderBy(col("lang"), col("rn")).collect().map(_.toSeq).toSeq
    assert(again == naive)
  }
}
