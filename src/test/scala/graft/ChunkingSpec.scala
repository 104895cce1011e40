package graft

import graft.ops.Chunking
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-chunking")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("slidingChunks: coverage, overlap, trailing partial, empty doc") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks
      (2L, "solo"),                                   // 1 tok
      (3L, ""),                                       // 0 toks -> no chunks
      (4L, (1 to 8).map(i => s"t$i").mkString(" "))   // exactly 2 windows
    ).toDF("doc_id", "text")
    val out = Chunking.slidingChunks(docs, window = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))

    // doc 1: starts 0,3,6,9 — last is a 1-token tail
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(d1.head._5 == "w1 w2 w3 w4")
    assert(d1(1)._5 == "w4 w5 w6 w7") // stride 3 < window 4 => overlap
    assert(d1.last._5 == "w10")
    // every token of doc 1 appears in some chunk (coverage)
    val covered = d1.flatMap(c => (c._3 until c._3 + c._4)).toSet
    assert(covered == (0L until 10L).toSet)

    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0L, 1L, "solo")))
    assert(!out.exists(_._1 == 3L))
    val d4 = out.filter(_._1 == 4L)
    assert(d4.map(_._4).toSeq == Seq(4L, 4L, 2L) ||
      d4.map(_._3).toSeq == Seq(0L, 3L, 6L)) // starts 0,3,6 at n=8
  }

  test("slidingChunks: stride == window gives disjoint exact blocks") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 9).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.slidingChunks(docs, window = 3, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 3L, 6L))
    assert(out.map(_.getString(4)).toSeq ==
      Seq("w1 w2 w3", "w4 w5 w6", "w7 w8 w9"))
    // disjoint: each token exactly once
    val all = out.flatMap(_.getString(4).split(" "))
    assert(all.length == all.distinct.length && all.length == 9)
  }

  test("slidingChunks rejects stride > window (silent token loss)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(docs, window = 2, stride = 3)
    }
  }
}
