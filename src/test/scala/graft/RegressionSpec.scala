package graft

import graft.ops.Regression
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RegressionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-regression")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("olsTwoFeature recovers planted coefficients exactly on noise-free data") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // y = 7 + 2*x1 - 3*x2 exactly; x1, x2 deterministic and not collinear
    val rows = (0 until 200).map { i =>
      val x1 = (i % 17).toDouble; val x2 = ((i * i) % 13).toDouble
      ("g", 7.0 + 2.0 * x1 - 3.0 * x2, x1, x2)
    }
    val out = Regression.olsTwoFeature(
        rows.toDF("g", "y", "x1", "x2"),
        col("y"), col("x1"), col("x2"), keys = Seq("g"))
      .collect().head
    assert(out.getLong(1) == 200L)
    assert(math.abs(out.getDouble(2) - 7.0) < 1e-3)  // b0
    assert(math.abs(out.getDouble(3) - 2.0) < 1e-3)  // b1
    assert(math.abs(out.getDouble(4) + 3.0) < 1e-3)  // b2
    assert(math.abs(out.getDouble(5) - 1.0) < 1e-3)  // r2 = 1 noise-free
  }

  test("olsTwoFeature: collinear regressors and constant y report NULLs, not NaN") {
    import spark.implicits._
    val degenerate = Seq(
      // group a: x2 = 2*x1 (collinear -> det ~ 0)
      ("a", 1.0, 1.0, 2.0), ("a", 3.0, 2.0, 4.0), ("a", 5.0, 3.0, 6.0),
      // group b: constant y (vy = 0)
      ("b", 4.0, 1.0, 5.0), ("b", 4.0, 2.0, 3.0), ("b", 4.0, 3.0, 9.0)
    ).toDF("g", "y", "x1", "x2")
    val out = Regression.olsTwoFeature(
        degenerate, col("y"), col("x1"), col("x2"), keys = Seq("g"))
      .orderBy("g").collect()
    out.foreach { r =>
      assert(r.getLong(1) == 3L)          // n still reported
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
    }
  }

  test("olsTwoFeature is partitioning-invariant (mergeable moments)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      val x1 = rnd.nextDouble() * 10; val x2 = rnd.nextDouble() * 5
      ("g", 1.5 + 0.5 * x1 + 2.0 * x2 + rnd.nextGaussian() * 0.1, x1, x2)
    }
    def run(parts: Int) = Regression.olsTwoFeature(
        rows.toDF("g", "y", "x1", "x2").repartition(parts),
        col("y"), col("x1"), col("x2"), keys = Seq("g"))
      .collect().head
    val a = run(1); val b = run(7)
    // rounded to 4dp inside the op: identical after any partitioning
    assert((2 to 5).forall(i => a.getDouble(i) == b.getDouble(i)))
  }
}
