package graft

import graft.ops.Splits
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SplitsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-splits")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hashSplit: proportions track weights; stable across runs and partitionings; salt moves membership") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(5000).toDF("doc_id")
    val w = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val a = Splits.hashSplit(docs, w).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.03)
    assert(math.abs(counts("valid") / 5000.0 - 0.1) < 0.02)
    assert(math.abs(counts("test") / 5000.0 - 0.1) < 0.02)
    // a re-run and a different partitioning reproduce the assignment
    val b = Splits.hashSplit(docs.repartition(13), w).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // a different salt is a different (still-valid) assignment
    val c = Splits.hashSplit(docs, w, salt = "v2").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c != a)
    assert(c.count { case (k, v) => a(k) == v } > 3000,
      "most mass is train->train under any two salts")
  }

  test("hashSplit: unnormalized weights normalize; single split degenerates; weight order is the ladder") {
    import spark.implicits._
    val docs = spark.range(2000).toDF("doc_id")
    val a = Splits.hashSplit(docs, Seq("x" -> 8.0, "y" -> 2.0)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.hashSplit(docs, Seq("x" -> 0.8, "y" -> 0.2)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "only relative weight matters")
    val one = Splits.hashSplit(docs, Seq("all" -> 1.0)).collect()
    assert(one.length == 2000 && one.forall(_.getString(1) == "all"))
  }

  test("splitLeakage: annotates every pair; leak iff the sides' splits differ") {
    import spark.implicits._
    val assign = Seq((1L, "train"), (2L, "train"), (3L, "test"), (4L, "valid"))
      .toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Splits.splitLeakage(pairs, assign)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, "train", "train", false),
      (1L, 3L, "train", "test", true),
      (3L, 4L, "test", "valid", true)))
  }
}
