package graft

import graft.ops.Classifier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-classifier")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("NB log-odds matches the hand-computed Laplace model; degenerate one-class train defined") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // train: pos docs say "good nice", neg docs say "bad"
    //   pos tokens: good=2, nice=1 (tp=3); neg tokens: bad=2 (tn=2)
    //   vocab {good, nice, bad} -> V=3; priors np=2, nn=1
    val train = Seq(
      (101L, "good nice", true), (102L, "good", true), (103L, "bad bad", false)
    ).toDF("doc_id", "text", "label")
    val docs = Seq(
      (1L, "good"),  // ln(2) + ln((2+1)/6) - ln((0+1)/5)
      (2L, "bad"),   // ln(2) + ln((0+1)/6) - ln((2+1)/5)
      (3L, "zz")     // OOV: ln(2) + ln(1/6) - ln(1/5)
    ).toDF("doc_id", "text")
    val out = Classifier.naiveBayesScore(docs, train, "label")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    val pri = math.log(2.0 / 1.0)
    assert(out(1L)._2 == r4(pri + math.log(3.0 / 6) - math.log(1.0 / 5)))
    assert(out(2L)._2 == r4(pri + math.log(1.0 / 6) - math.log(3.0 / 5)))
    assert(out(3L)._2 == r4(pri + math.log(1.0 / 6) - math.log(1.0 / 5)))
    // the ordering the classifier exists for: good-word doc scores
    // positive, bad-word doc negative
    assert(out(1L)._3 && out(1L)._2 > 0)
    assert(!out(2L)._3 && out(2L)._2 < 0)
    // one-class degenerate training stays defined (clamped prior)
    val onlyPos = train.filter(col("label"))
    val deg = Classifier.naiveBayesScore(docs, onlyPos, "label").collect()
    assert(deg.length == 3 && deg.forall(r => !r.isNullAt(2)))
  }

  test("calibrationCurve: hand-computed two-band diagram, exact counts, monotone mean_prob") {
    import spark.implicits._
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val scored = Seq(
      (1L, -2.0, false), (2L, -1.0, false), (3L, 1.0, true), (4L, 2.0, true)
    ).toDF("doc_id", "log_odds", "y")
    val out = Classifier.calibrationCurve(scored, "y", bands = 2)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1) == (2L, 0L, r6((sig(-2.0) + sig(-1.0)) / 2), 0.0))
    assert(out(2) == (2L, 2L, r6((sig(1.0) + sig(2.0)) / 2), 1.0))
    // a perfectly separable scorer is perfectly calibrated at the ends
    assert(out(1)._4 <= out(2)._4 && out(1)._3 < out(2)._3)
  }

  test("filterAgreement: hand-computed confusion, precision/recall/F1, Cohen's kappa; degenerate pairs defined") {
    import spark.implicits._
    // 10 docs: both=4, only_a=2, only_b=1, neither=3
    // precision = 4/5 = 0.8, recall = 4/6 = 0.666667,
    // f1 = 2*0.8*0.666667/1.466667 = 0.727273 (on rounded p/r),
    // po = 0.7, pa = 0.6, pb = 0.5, pe = 0.3+0.2 = 0.5,
    // kappa = (0.7-0.5)/0.5 = 0.4
    val d = Seq(
      (true, true), (true, true), (true, true), (true, true),
      (true, false), (true, false),
      (false, true),
      (false, false), (false, false), (false, false)
    ).toDF("a", "b")
    val r = Classifier.filterAgreement(d, col("a"), col("b")).head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_both") == 4L &&
      r.getAs[Long]("n_only_a") == 2L && r.getAs[Long]("n_only_b") == 1L &&
      r.getAs[Long]("n_neither") == 3L)
    assert(r.getAs[Double]("precision") == 0.8)
    assert(r.getAs[Double]("recall") == 0.666667)
    assert(math.abs(r.getAs[Double]("f1") -
      math.round(2.0 * 0.8 * 0.666667 / (0.8 + 0.666667) * 1e6) / 1e6) < 1e-9)
    assert(r.getAs[Double]("kappa") == 0.4)
    // identical filters: kappa 1 when both rates are non-degenerate
    val same = Seq((true, true), (false, false), (true, true)).toDF("a", "b")
    val rs = Classifier.filterAgreement(same, col("a"), col("b")).head()
    assert(rs.getAs[Double]("kappa") == 1.0 && rs.getAs[Double]("f1") == 1.0)
    // constant filters: pe = 1 -> kappa defined as 0
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    assert(Classifier.filterAgreement(const, col("a"), col("b"))
      .head().getAs[Double]("kappa") == 0.0)
  }

  test("confusionMulticlass: hand-computed cells, recall and precision marginals") {
    import spark.implicits._
    // actual en: 3 -> predicted en,en,id; actual id: 2 -> id,id;
    // actual fr: 1 -> en
    val rows = Seq(
      ("en", "en"), ("en", "en"), ("en", "id"),
      ("id", "id"), ("id", "id"),
      ("fr", "en")).toDF("actual_lang", "pred")
    val got = Classifier.confusionMulticlass(rows, "actual_lang", "pred")
      .orderBy("actual", "predicted").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.size == 4)
    assert(got(("en", "en")) == ((2L, 0.666667, 0.666667))) // 2/3 recall, 2/3 precision (en predicted 3x)
    assert(got(("en", "id")) == ((1L, 0.333333, 0.333333))) // id predicted 3x
    assert(got(("id", "id")) == ((2L, 1.0, 0.666667)))
    assert(got(("fr", "en")) == ((1L, 1.0, 0.333333)))
    // per-actual recalls sum to 1
    val byActual = got.groupBy(_._1._1).view.mapValues(_.values.map(_._2).sum)
    byActual.values.foreach(s => assert(math.abs(s - 1.0) < 1e-5))
  }
}
