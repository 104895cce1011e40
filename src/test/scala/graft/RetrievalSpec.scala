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

  test("rankBiasedOverlap: identical rankings 1-p^k, disjoint 0, hand-computed partial") {
    import spark.implicits._
    val a = Seq((1L, 30.0), (2L, 20.0), (3L, 10.0)).toDF("doc_id", "score")
    val sameOrder = Seq((1L, 99.0), (2L, 50.0), (3L, 1.0)).toDF("doc_id", "score")
    val ident = Retrieval.rankBiasedOverlap(a, sameOrder, k = 3, p = 0.5).collect().head
    // identical rankings: overlap_d = d -> rbo = (1-p) sum p^(d-1) = 1 - p^k
    assert(ident.getInt(0) == 3 && ident.getLong(2) == 3L)
    assert(ident.getDouble(3) == math.rint((1.0 - math.pow(0.5, 3)) * 1e6) / 1e6)
    val disjoint = Seq((7L, 5.0), (8L, 4.0), (9L, 3.0)).toDF("doc_id", "score")
    val dj = Retrieval.rankBiasedOverlap(a, disjoint, k = 3, p = 0.5).collect().head
    assert(dj.getLong(2) == 0L && dj.getDouble(3) == 0.0)
    // A = [1,2,3], B = [1,3,4]: entries 1 and 3 -> overlaps 1,1,2
    // rbo = 0.5*(1 + 0.5*1/2 + 0.25*2/3) = 0.708333
    val b = Seq((1L, 9.0), (3L, 8.0), (4L, 7.0)).toDF("doc_id", "score")
    val h = Retrieval.rankBiasedOverlap(a, b, k = 3, p = 0.5).collect().head
    assert(h.getLong(2) == 2L && h.getDouble(3) == 0.708333)
  }
}
