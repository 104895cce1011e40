package graft

import graft.ops.Snapshot
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SnapshotSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-snapshot")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("diff classifies added/removed/changed/unchanged; null text compares null-safe") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val cur = Seq(
      (1L, "same"), (2L, "new text"), (3L, "brand new"),
      (5L, null.asInstanceOf[String]), (6L, "was null before"))
      .toDF("doc_id", "text")
    val prev = Seq(
      (1L, "same"), (2L, "old text"), (4L, "gone"),
      (5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Snapshot.diff(cur, prev).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "added",
      4L -> "removed", 5L -> "unchanged", 6L -> "changed"))
  }

  test("diff is symmetric in size: every id from either side appears exactly once") {
    import spark.implicits._
    val cur = (0L to 99L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val prev = (50L to 149L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val got = Snapshot.diff(cur, prev).collect()
    assert(got.length == 150)
    val byStatus = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byStatus == Map("added" -> 50, "removed" -> 50, "unchanged" -> 50))
  }

  test("upsertLatestWins: higher version wins, delta wins ties, stale delta loses, inserts land") {
    import spark.implicits._
    val base = Seq(
      (1L, 3L, "base-v3"),   // delta has v2 -> base survives
      (2L, 1L, "base-v1"),   // delta has v5 -> delta survives
      (3L, 2L, "base-v2"),   // delta has v2 (tie) -> DELTA survives
      (4L, 1L, "untouched")  // no delta row
    ).toDF("doc_id", "version", "text")
    val delta = Seq(
      (1L, 2L, "delta-stale"),
      (2L, 5L, "delta-v5"),
      (3L, 2L, "delta-tie"),
      (9L, 1L, "delta-insert")
    ).toDF("doc_id", "version", "text")
    val got = Snapshot.upsertLatestWins(base, delta)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 3L, "base-v3"), (2L, 5L, "delta-v5"), (3L, 2L, "delta-tie"),
      (4L, 1L, "untouched"), (9L, 1L, "delta-insert")))
  }

  test("upsertLatestWins is partitioning-invariant and rejects schema drift") {
    import spark.implicits._
    val base = (0L until 100L).map(i => (i, i % 5, s"b$i")).toDF("doc_id", "version", "text")
    val delta = (0L until 100L by 3).map(i => (i, i % 5 + 1, s"d$i")).toDF("doc_id", "version", "text")
    val one = Snapshot.upsertLatestWins(base.repartition(1), delta.repartition(1))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val many = Snapshot.upsertLatestWins(base.repartition(13), delta.repartition(7))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(one == many)
    intercept[IllegalArgumentException] {
      Snapshot.upsertLatestWins(base, delta.withColumnRenamed("text", "body"))
    }
  }
}
