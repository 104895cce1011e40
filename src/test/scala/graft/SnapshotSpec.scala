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
}
