package graft

import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-graph")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Independent scalar reference of the exact documented semantics
    * (same per-round round(10), same dangling redistribution).
    */
  private def ref(edges: Seq[(String, String)], iters: Int,
                  d: Double): Map[String, Double] = {
    def r10(x: Double) = math.round(x * 1e10) / 1e10
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> r10(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(outdeg.contains).map(r).sum
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(v => v ->
        r10((1.0 - d) / n + d * (in.getOrElse(v, 0.0) + dm / n))).toMap
    }
    r.map { case (k, v) => k -> (math.round(v * 1e8) / 1e8) }
  }

  test("pageRank == the scalar reference on a dangling-node graph; mass conserved; sink ranks highest") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // a -> b, a -> c, b -> c; c dangles (mass recycles uniformly)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == ref(edges, 3, 0.85))
    assert(math.abs(got.values.sum - 1.0) < 1e-6,
      "dangling redistribution conserves total mass")
    assert(got("c") > got("b") && got("b") > got("a"))
  }

  test("pageRank: parallel edges carry double mass; partitioning-invariant") {
    import spark.implicits._
    // b receives a's mass twice vs c once: contribution sums per edge
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == ref(edges, 4, 0.85))
    assert(got("b") > got("c"))
    val rep = Graph.pageRank(edges.toDF("src", "dst").repartition(7), iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rep == got, "per-round rounding pins the result under any partitioning")
  }
}
