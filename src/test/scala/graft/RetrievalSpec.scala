package graft

import graft.ops.Retrieval
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-retrieval")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("BM25 matches the hand-computed Okapi score; ranking favors rarer terms; k truncates") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // 4 docs; 'rare' appears in doc 1 only, 'common' in all
    val docs = Seq(
      (1L, "rare common x x"),       // len 4
      (2L, "common common y y"),     // len 4, tf(common)=2
      (3L, "common z z z"),
      (4L, "w w w w")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq("rare", "common"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val N = 4.0; val avg = 4.0
    def idf(df: Int) = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Int, len: Int) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avg))
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    val s1 = r4(idf(1) * w(1, 4) + idf(3) * w(1, 4))
    val s2 = r4(idf(3) * w(2, 4))
    val s3 = r4(idf(3) * w(1, 4))
    assert(out.length == 3, "k truncates")
    assert(out(0) == ((1L, s1, 2L)), "doc with the rare term ranks first")
    assert(out(1) == ((2L, s2, 1L)))
    assert(out(2) == ((3L, s3, 1L)))
    assert(!out.exists(_._1 == 4L), "no-probe-term doc never appears")
  }
}
