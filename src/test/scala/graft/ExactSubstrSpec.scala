package graft

import graft.ops.ExactSubstr
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExactSubstrSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-exactsubstr")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(docs: Seq[(Long, String)], k: Int = 8): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    ExactSubstr.dedupSubstrings(docs.toDF("doc_id", "text"), k = k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("cross-doc shared 8-gram: non-first occurrence removed, keeper untouched") {
    spark.sparkContext.setLogLevel("WARN")
    val shared = "a b c d e f g h"
    val out = run(Seq(
      1L -> s"$shared i j",       // keeper (lowest (doc, pos))
      2L -> s"x y $shared z"))    // loses positions 2..9
    assert(out(1L) == ((10L, 0L, s"$shared i j")))
    assert(out(2L) == ((11L, 8L, "x y z")))
  }

  test("intra-doc repeat: second occurrence removed, first kept") {
    val half = "p q r s t u v w"
    val out = run(Seq(3L -> s"$half $half"))
    assert(out(3L) == ((16L, 8L, half)))
  }

  test("short and empty docs pass through untouched") {
    val out = run(Seq(4L -> "one two three", 5L -> "", 6L -> "   "))
    assert(out(4L) == ((3L, 0L, "one two three")))
    assert(out(5L) == ((0L, 0L, "")))
    assert(out(6L) == ((0L, 0L, "")))
  }

  test("tokenization is the corpus rule: lowercase, \\W+ split") {
    // same 8 tokens modulo case/punctuation => still a duplicate
    val out = run(Seq(
      7L -> "Alpha, beta; GAMMA delta epsilon zeta eta theta",
      8L -> "alpha beta gamma delta epsilon zeta eta theta!"))
    assert(out(7L)._2 == 0L)
    assert(out(8L) == ((8L, 8L, "")))
  }

  test("matches an in-memory brute-force of the same rule on a mixed corpus") {
    val k = 5
    // deterministic corpus with heavy templating so grams collide
    val vocab = Vector("spark", "scan", "join", "agg", "sort", "row", "key", "hash")
    val docs = (0L until 60L).map { i =>
      val len = 6 + (i % 13).toInt
      val toks = (0 until len).map(j => vocab(((i * 7 + j * j + j) % vocab.size).toInt))
      i -> toks.mkString(" ")
    }
    // brute force: global first occurrence per k-gram keeps; others cover
    val tokenized = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\W+").filter(_.nonEmpty).toVector
    }
    val occ = for {
      (id, toks) <- tokenized
      i <- 0 to toks.length - k
    } yield (toks.slice(i, i + k).mkString(" "), id, i)
    val byGram = occ.groupBy(_._1)
    val dup = byGram.values.filter(_.size > 1).flatMap(_.sortBy(o => (o._2, o._3)).tail)
      .map(o => (o._2, o._3)).toSet
    val expect = tokenized.map { case (id, toks) =>
      val covered = toks.indices.filter(j => dup.exists {
        case (d, s) => d == id && s <= j && j < s + k
      })
      id -> ((toks.length.toLong, covered.size.toLong,
        toks.indices.filterNot(covered.contains).map(toks).mkString(" ")))
    }.toMap
    assert(run(docs, k) == expect)
  }
}
