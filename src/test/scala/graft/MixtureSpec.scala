package graft

import graft.ops.Mixture
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class MixtureSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mixture")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("token budget plan: hand-computed targets/rates/epochs, unweighted and corpus-absent slices audited") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // inventories: a=6 tokens (2 docs x 3), b=2, c=4; c gets no weight
    val docs = Seq(
      ("a", "one two three"), ("a", "four five six"),
      ("b", "seven eight"),
      ("c", "x y z w")
    ).toDF("source", "text")
    // weights sum to 1.0; 'd' names a slice the corpus lacks
    val plan = Mixture.tokenBudgetPlan(docs,
        Seq("a" -> 0.5, "b" -> 0.4, "d" -> 0.1), budget = 10L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))
      .toMap
    // a: target floor(10*0.5)=5 of 6 avail -> rate 5/6, 1 epoch
    assert(plan("a") == (0.5, 6L, 5L, math.round(5.0 / 6.0 * 1e6) / 1e6, 1L))
    // b: target 4 of 2 avail -> rate 2.0 -> UPSAMPLED, 2 epochs
    assert(plan("b") == (0.4, 2L, 4L, 2.0, 2L))
    // c: in corpus, not in design -> weight 0, target 0, rate 0
    assert(plan("c") == (0.0, 4L, 0L, 0.0, 0L))
    // d: in design, not in corpus -> avail 0, rate clamps to 0
    assert(plan("d") == (0.1, 0L, 1L, 0.0, 0L))
    assert(plan.size == 4, "every slice from either side appears")
  }

  test("doremiWeights: uniform when slices match reference, surprising slice upweighted, eta monotone, sums to 1") {
    import spark.implicits._
    // s1/s2 are reference-like; s3 is pure out-of-vocabulary noise
    val docs = Seq(
      ("s1", 1L, "the cat sat"), ("s1", 2L, "the dog sat"),
      ("s2", 3L, "the cat sat"), ("s2", 4L, "the dog sat"),
      ("s3", 5L, "zz qq vv"), ("s3", 6L, "qq vv zz")
    ).toDF("source", "doc_id", "text")
    val ref = docs.filter(col("source") =!= "s3")
    def run(eta: Double) = graft.ops.Mixture.doremiWeights(docs, ref, eta)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val w = run(1.0)
    assert(math.abs(w.values.sum - 1.0) < 1e-5, "weights sum to 1")
    assert(w("s1") == w("s2"), "identical slices weigh the same")
    assert(w("s3") > w("s1"), "the OOV slice is the surprising one")
    // eta sharpens the tilt toward the high-excess slice
    assert(run(4.0)("s3") > w("s3"))
    // all slices reference-like -> zero excess everywhere -> uniform
    val u = graft.ops.Mixture.doremiWeights(docs.filter(col("source") =!= "s3"),
      ref, eta = 1.0).collect().map(_.getDouble(4))
    assert(u.forall(x => math.abs(x - 0.5) < 1e-5))
  }

  test("temperature weights: alpha=1 keeps natural shares, alpha<1 flattens toward uniform, boost is the sampling multiplier") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // token inventory: big=16, small=4 -> natural shares 0.8 / 0.2
    val docs = Seq(
      ("big", "a b c d e f g h i j k l m n o p"),
      ("small", "q r s t")
    ).toDF("source", "text")
    def run(alpha: Double) = Mixture.temperatureWeights(docs, alpha)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val nat = run(1.0)
    assert(nat("big") == ((16L, 0.8, 0.8, 1.0)), s"alpha=1 natural: $nat")
    assert(nat("small") == ((4L, 0.2, 0.2, 1.0)))
    // alpha = 0.5: w ~ sqrt(p) renormalized -> sqrt(.8)/(sqrt(.8)+sqrt(.2))
    val flat = run(0.5)
    val wBig = math.sqrt(0.8) / (math.sqrt(0.8) + math.sqrt(0.2))
    assert(math.abs(flat("big")._3 - wBig) < 1e-5, s"alpha=.5: $flat")
    assert(math.abs(flat("big")._3 + flat("small")._3 - 1.0) < 1e-5,
      "weights sum to 1")
    // flattening: the low-resource slice is upsampled, the big one down
    assert(flat("small")._4 > 1.0 && flat("big")._4 < 1.0)
    // order preserved (alpha > 0 is monotone in share)
    assert(flat("big")._3 > flat("small")._3)
    // boost IS weight/share of the emitted (rounded) columns
    assert(math.abs(flat("small")._4 - flat("small")._3 / flat("small")._2) < 1e-5)
    // zero-token corpus: all-zero columns, never NaN
    val empty = Mixture.temperatureWeights(
      Seq(("a", ""), ("b", "")).toDF("source", "text"), 0.5).collect()
    assert(empty.forall(r => r.getLong(1) == 0L && r.getDouble(2) == 0.0 &&
      r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
  }
}
