package graft

import graft.ops.Dsir
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dsir")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // the operator's bucket hash, replicated bit-for-bit: first 8 hex
  // chars of md5, mod B — so expectations hold even under collisions
  private def bucket(bg: String, b: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bg.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % b
  }

  private def feats(text: String, b: Long): Seq[Long] = {
    val t = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    t.zip(t.drop(1)).map { case (x, y) => bucket(s"$x $y", b) }.toSeq
  }

  test("DSIR weights: exact replica of the smoothed log-ratio, target-like docs rank higher, short docs absent") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val b = 4096L
    val target = Seq(
      (100L, "the theory of relativity explains gravity"),
      (101L, "quantum theory explains atomic structure")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the theory of relativity explains gravity"), // verbatim target-like
      (2L, "buy cheap watches online free shipping now"), // spam-like
      (3L, "quantum structure of gravity"),
      (4L, "hi") // single token -> no bigram features -> absent
    ).toDF("doc_id", "text")
    val out = Dsir.importanceWeights(raw, target, buckets = b.toInt)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(4L), "a featureless doc is absent from the output")
    // exact expectation from the replicated hash + Laplace formula
    val rawTexts = Map(
      1L -> "the theory of relativity explains gravity",
      2L -> "buy cheap watches online free shipping now",
      3L -> "quantum structure of gravity")
    val tgtF = target.collect().flatMap(r => feats(r.getString(1), b))
    val rawF = rawTexts.values.flatMap(feats(_, b)).toSeq
    val tc = tgtF.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rc = rawF.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (tt, tr) = (tgtF.length.toLong, rawF.length.toLong)
    def expLogW(text: String): Double = {
      val s = feats(text, b).map { f =>
        math.log((tc.getOrElse(f, 0L) + 1).toDouble / (tt + b)) -
          math.log((rc.getOrElse(f, 0L) + 1).toDouble / (tr + b))
      }.sum
      math.round(s * 10000) / 10000.0
    }
    for ((id, text) <- rawTexts) {
      assert(out(id)._1 == feats(text, b).length.toLong, s"n_feats for doc $id")
      assert(out(id)._2 == expLogW(text), s"log_w for doc $id")
    }
    // the verbatim-target doc outranks the spam doc
    assert(out(1L)._2 > out(2L)._2)
  }
}
