package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class EntropySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-entropy")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def r6(x: Double) = math.round(x * 1e6) / 1e6

  test("charEntropy: hand-computed values; empty and null text report 0 over 0 chars") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = Seq(
      (1L, "aaaa"),        // one symbol -> H = 0
      (2L, "abab"),        // two equiprobable -> ln 2
      (3L, "abcd"),        // four equiprobable -> ln 4
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, 4L, 0.0, true),
      (2L, 4L, r6(math.log(2)), true),
      (3L, 4L, r6(math.log(4)), true),
      (4L, 0L, 0.0, true),
      (5L, 0L, 0.0, true)))
  }

  test("charEntropy: threshold splits template runs from prose; partitioning-invariant") {
    import spark.implicits._
    val prose = "The quick brown fox jumps over the lazy dog, twice."
    val docs = Seq((1L, prose), (2L, "spark " * 40)).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(got(0)._2 > 2.5 && !got(0)._3, "prose is well above the 2-nat bar")
    assert(got(1)._2 < 2.0 && got(1)._3, "6-char template run flags low")
    val rep = TextAnalysis.charEntropy(docs.repartition(7)).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(rep.toSeq == got.toSeq)
  }
}
