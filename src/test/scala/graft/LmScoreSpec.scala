package graft

import graft.ops.LmScore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lmscore")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("unigram cross-entropy matches the hand-computed Laplace model; OOV > in-vocab; empty ref defined") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // reference: "a a b" -> counts a=2, b=1; total=3, V=2, denom=5
    val ref = Seq((100L, "a a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a"),      // -ln(3/5)
      (2L, "b"),      // -ln(2/5)
      (3L, "zz"),     // OOV: -ln(1/5)
      (4L, "a b zz")  // mean of the three
    ).toDF("doc_id", "text")
    val out = LmScore.unigramCrossEntropy(docs, ref)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    assert(out(1L) == (1L, r4(-math.log(3.0 / 5))))
    assert(out(2L) == (1L, r4(-math.log(2.0 / 5))))
    assert(out(3L) == (1L, r4(-math.log(1.0 / 5))))
    assert(out(4L)._1 == 3L)
    assert(math.abs(out(4L)._2 -
      r4((-math.log(3.0 / 5) - math.log(2.0 / 5) - math.log(1.0 / 5)) / 3)) <= 0.0001)
    // the reference-likeness ordering the filter exists for
    assert(out(3L)._2 > out(1L)._2 && out(3L)._2 > out(2L)._2)
    // empty reference: denom clamps to 1, every token scores -ln(1) = 0
    val e = LmScore.unigramCrossEntropy(docs, ref.limit(0))
      .collect().map(r => r.getDouble(2))
    assert(e.forall(_ == 0.0))
  }

  test("bigram cross-entropy matches the hand-computed conditional Laplace model; short docs drop") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // reference "a b a b c": bigrams ab, ba, ab, bc
    //   c2: (a,b)=2 (b,a)=1 (b,c)=1; ctx: a=2, b=2; V=3 (a,b,c)
    val ref = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),   // p(b|a) = (2+1)/(2+3) = 3/5
      (2L, "b c"),   // p(c|b) = (1+1)/(2+3) = 2/5
      (3L, "c a"),   // unseen bigram, seen ctx? ctx(c)=0 -> (0+1)/(0+3) = 1/3
      (4L, "zz qq"), // OOV everything: (0+1)/(0+3) = 1/3
      (5L, "a"),     // single token: no bigrams -> row drops
      (6L, "")       // empty: drops
    ).toDF("doc_id", "text")
    val out = LmScore.bigramCrossEntropy(docs, ref)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    assert(out(1L) == (1L, r4(-math.log(3.0 / 5))))
    assert(out(2L) == (1L, r4(-math.log(2.0 / 5))))
    assert(out(3L) == (1L, r4(-math.log(1.0 / 3))))
    assert(out(4L) == (1L, r4(-math.log(1.0 / 3))))
    assert(!out.contains(5L) && !out.contains(6L))
    // seen bigram scores better (lower) than unseen — the ordering
    // the quality filter exists for
    assert(out(1L)._2 < out(3L)._2)
  }
}
