package graft

import graft.ops.Distrib
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ks")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ksTwoSample: identical distributions give D = 0, shifted give the hand value") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // a and b identical multisets; c is a +10 shift of a (disjoint
    // supports => D = 1); d overlaps a halfway
    val rows =
      Seq(1L, 2L, 2L, 3L, 5L).map(("a", _)) ++
      Seq(1L, 2L, 2L, 3L, 5L).map(("b", _)) ++
      Seq(11L, 12L, 12L, 13L, 15L).map(("c", _)) ++
      Seq(3L, 5L, 7L, 9L, 11L).map(("d", _))
    val out = Distrib.ksTwoSample(rows.toDF("s", "v"), "v", "s")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    assert(out(("a", "b")) == 0.0)
    assert(out(("a", "c")) == 1.0)
    // a vs d: at v=2, F_a = 3/5, F_d = 0 -> D = 0.6 (max over grid)
    assert(out(("a", "d")) == 0.6)
    // symmetric completeness: all C(4,2) unordered pairs present
    assert(out.size == 6)
  }

  test("ksTwoSample: D equals the brute-force sup over pooled values; critical rule sane") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map(_ => ("p", rnd.nextInt(40).toLong)) ++
      (0 until 200).map(_ => ("q", (rnd.nextInt(40) + rnd.nextInt(10)).toLong))
    val out = Distrib.ksTwoSample(rows.toDF("s", "v"), "v", "s").collect().head
    val p = rows.filter(_._1 == "p").map(_._2)
    val q = rows.filter(_._1 == "q").map(_._2)
    val gridV = (p ++ q).distinct.sorted
    val brute = gridV.map { v =>
      math.abs(p.count(_ <= v).toDouble / p.size - q.count(_ <= v).toDouble / q.size)
    }.max
    assert(out.getLong(2) == 300L && out.getLong(3) == 200L)
    assert(math.abs(out.getDouble(4) - brute) < 1e-6)
    val crit = math.sqrt(-math.log(0.025) / 2.0) * math.sqrt(500.0 / 60000.0)
    assert(math.abs(out.getDouble(5) - crit) < 1e-6)
    assert(out.getBoolean(6) == (out.getDouble(4) > out.getDouble(5)))
  }
}
