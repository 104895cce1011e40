package graft

import graft.ops.Quantiles
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-quantiles")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // deterministic pseudo-random positives: affine-mod series, domain [1, 997]
  private def series(n: Int): Seq[Long] =
    (0 until n).map(i => ((i.toLong * 7919 + 13) % 997) + 1)

  test("exactIntQuantiles matches sort-based percentile_disc on a hand-checkable set") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // 1..10: median (pm 500) -> rank ceil(500*10/1000)=5 -> value 5
    val df = (1L to 10L).toDF("v")
    val q = Quantiles.exactIntQuantiles(df, "v", Seq(100, 500, 900, 1000))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(q(100) == (1L, 1L))
    assert(q(500) == (5L, 5L))
    assert(q(900) == (9L, 9L))
    assert(q(1000) == (10L, 10L))
  }

  test("exactIntQuantiles equals the brute-force rank pick, grouped and with ties") {
    import spark.implicits._
    val data = series(5000)
    val df = data.zipWithIndex
      .map { case (v, i) => (if (i % 2 == 0) "g0" else "g1", v / 10) } // heavy ties
      .toDF("g", "v")
    val pms = Seq(10, 250, 500, 750, 990)
    val got = Quantiles.exactIntQuantiles(df, "v", pms, keys = Seq("g"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    for (g <- Seq("g0", "g1"); pm <- pms) {
      val vals = data.zipWithIndex.collect { case (v, i)
        if (if (i % 2 == 0) "g0" else "g1") == g => v / 10 }.sorted
      val rank = ((pm.toLong * vals.length + 999) / 1000).toInt
      assert(got((g, pm)) == vals(rank - 1), s"group $g pm $pm")
    }
  }

  test("DdHistogram: relative-error bound at every permille, underflow bucket, NaN guard") {
    import spark.implicits._
    val alpha = 0.05
    val data = series(4000).map(_.toDouble)
    val dd = udaf(new Quantiles.DdHistogram(alpha), Encoders.scalaDouble)
    val sk = data.toDF("v").agg(dd(col("v"))).head()
      .getMap[Int, Long](0).toMap
    val sorted = data.sorted
    for (pm <- Seq(10, 100, 250, 500, 750, 900, 990, 1000)) {
      val est = Quantiles.ddQuantile(sk, alpha, pm)
      val exact = sorted((((pm.toLong * data.length + 999) / 1000) - 1).toInt)
      assert(math.abs(est - exact) <= alpha * exact + 1e-9,
        s"pm $pm: est $est exact $exact")
    }
    // zeros and negatives land in the underflow bucket, estimate 0.0
    val sk0 = Seq(0.0, -3.0, 0.0).toDF("v").agg(dd(col("v"))).head()
      .getMap[Int, Long](0).toMap
    assert(sk0 == Map(Int.MinValue -> 3L))
    assert(Quantiles.ddQuantile(sk0, alpha, 500) == 0.0)
    assert(Quantiles.ddQuantile(Map.empty, alpha, 500).isNaN)
  }

  test("DdHistogram buffer is EXACTLY partitioning-invariant (not just the estimate)") {
    import spark.implicits._
    val dd = udaf(new Quantiles.DdHistogram(0.02), Encoders.scalaDouble)
    val data = series(3000).map(_.toDouble)
    def sketchAt(parts: Int): Map[Int, Long] =
      data.toDF("v").repartition(parts).agg(dd(col("v"))).head()
        .getMap[Int, Long](0).toMap
    assert(sketchAt(1) == sketchAt(13))
  }

  test("madOutliers: hand-computed median/MAD/outlier counts, MAD=0 degenerate slice, integer ppm") {
    import spark.implicits._
    val rows =
      Seq(1L, 2L, 3L, 4L, 100L).map(("a", _)) ++   // med 3, devs {0,1,1,2,97} -> mad 1
      Seq(5L, 5L, 5L, 5L).map(("b", _)) ++         // med 5, mad 0, no outliers
      Seq(5L, 5L, 5L, 9L).map(("c", _))            // med 5, mad 0, 9 is an outlier
    val out = Quantiles.madOutliers(rows.toDF("source", "v"), "v", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("a") == (3L, 1L, 5L, 1L, 200000L), "only 100 exceeds med±3*MAD")
    assert(out("b") == (5L, 0L, 4L, 0L, 0L), "constant slice: MAD 0, zero outliers")
    assert(out("c") == (5L, 0L, 4L, 1L, 250000L), "MAD=0 slice flags ANY deviation")
  }

  test("trimmedMean: equals the brute-force sorted-drop mean; whale value absorbed; tiny group NULL") {
    import spark.implicits._
    // slice a: 10 values incl. a 10^6 whale; 10% trim drops exactly the
    // min and the max -> mean of the middle 8
    val aVals = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 1000000L)
    // slice b: repeated values straddling the trim boundary
    val bVals = Seq(5L, 5L, 5L, 5L, 1L, 9L, 9L, 9L, 9L, 9L)
    // slice c: n=4, k=0 at 100 permille -> plain mean; n-2k>0 fine
    val cVals = Seq(10L, 20L, 30L, 40L)
    val rows = aVals.map(("a", _)) ++ bVals.map(("b", _)) ++ cVals.map(("c", _))
    def brute(vs: Seq[Long], pm: Int): Double = {
      val k = vs.size * pm / 1000
      val kept = vs.sorted.slice(k, vs.size - k)
      kept.sum.toDouble / kept.size
    }
    val got = Quantiles.trimmedMean(rows.toDF("s", "v"), "v", Seq("s"), 100)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("a") == ((10L, 1L, math.rint(brute(aVals, 100) * 1e6) / 1e6)))
    assert(got("b") == ((10L, 1L, math.rint(brute(bVals, 100) * 1e6) / 1e6)))
    assert(got("c") == ((4L, 0L, brute(cVals, 100))))
    // 400 permille on n=2: k=0 keeps all; 400 permille on n=5: k=2 keeps the median only
    val small = Quantiles.trimmedMean(
        Seq(("d", 1L), ("d", 100L)).toDF("s", "v"), "v", Seq("s"), 400)
      .collect().head
    assert(small.getDouble(3) == 50.5)
    val med = Quantiles.trimmedMean(
        Seq.tabulate(5)(i => ("e", (i * 10 + 1).toLong)).toDF("s", "v"), "v", Seq("s"), 400)
      .collect().head
    assert(med.getLong(2) == 2L && med.getDouble(3) == 21.0)
  }
}
