package graft

import graft.ops.Distrib
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DistribSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-distrib")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("slice KL: zero for a corpus-identical slice, hand-computed for a skewed one, always >= 0") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // two slices with the SAME distribution {a:2, b:1} -> corpus is
    // {a:4, b:2}, both KLs exactly 0
    val same = Seq(("s1", "a a b"), ("s2", "a b a")).toDF("source", "text")
    val kl0 = Distrib.sliceKlDivergence(same, "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(kl0("s1") == (3L, 0.0) && kl0("s2") == (3L, 0.0))
    // skewed: s1 = {a:2}, s2 = {a:1, b:1}; corpus = {a:3, b:1}
    //   KL(s1) = 1 * ln(1 / (3/4)) = ln(4/3)
    //   KL(s2) = .5 ln(.5/(3/4)) + .5 ln(.5/(1/4))
    val skew = Seq(("s1", "a a"), ("s2", "a b")).toDF("source", "text")
    val kl = Distrib.sliceKlDivergence(skew, "source")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    assert(kl("s1") == r4(math.log(4.0 / 3.0)))
    assert(kl("s2") == r4(0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)))
    assert(kl.values.forall(_ >= 0.0), "Gibbs: KL is never negative")
  }
}
