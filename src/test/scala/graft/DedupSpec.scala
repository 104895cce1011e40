package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dedup")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) = {
    spark.sparkContext.setLogLevel("WARN")
    spark.createDataFrame(rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
  }

  test("exact dedup groups case/whitespace-normalized duplicates, keeper = min id") {
    val d = docs(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "HELLO\nWORLD"),
      (4L, "something else"))
    val out = Dedup.exact(d).collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(out.toSeq == Seq((3L, 1L), (1L, 4L))) // (n, keeper)
  }

  test("shingles: word 3-grams, distinct, short docs degrade to one shingle") {
    val d = docs((1L, "a b c d"), (2L, "x y"))
    val out = d.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).toSet == Set("a b c", "b c d"))
    assert(out(2L) == Seq("x y"))
  }

  test("minhash LSH finds a planted near-duplicate pair and skips unrelated docs") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "CHANGED" else s"word$i").mkString(" ")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, base)) // 4 = exact dup of 1
    val pairs = Dedup.minhashLsh(d, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup not found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated doc paired: $pairs")
    // exact duplicate collapsed to representative 1 — no (1,4) pair emitted
    assert(!pairs.contains((1L, 4L)))
  }

  test("minhash estimate tracks true jaccard (planted overlap)") {
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = ((1 to 15).map(i => s"w$i") ++ (1 to 15).map(i => s"v$i")).mkString(" ")
    val d = docs((1L, a), (2L, b))
    val est = Dedup.minhashLsh(d, threshold = 0.0, bands = 32) // bucket everything
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .collect().headOption.map(_.getDouble(2))
    val truth = Dedup.ngramJaccard(d, docs().sparkSession.createDataFrame(
      Seq((1L, 2L))).toDF("id_a", "id_b"), n = 3)
      .collect().head.getDouble(2)
    est.foreach(e => assert(math.abs(e - truth) < 0.35,
      s"minhash estimate $e too far from true jaccard $truth"))
  }

  test("simhash: identical texts collide, near texts close, unrelated far") {
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val near = (1 to 50).map(i => if (i % 25 == 0) "flip" else s"tok$i").mkString(" ")
    val far = (1 to 50).map(i => s"zzz$i").mkString(" ")
    val d = docs((1L, base), (2L, near), (3L, far))
    val sh = d.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      s"near ${ham(sh(1L), sh(2L))} !< far ${ham(sh(1L), sh(3L))}")
  }

  test("brute-force cosine top-k: self-similar vector ranks first") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, Seq(1.0f, 0.0f, 0.0f), k = 2).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(top.head.getDouble(1) == 1.0)
  }

  test("ann lsh candidates rank by cosine within buckets") {
    import spark.implicits._
    val vecs = (0 until 64).map { i =>
      (i.toLong, Seq.tabulate(8)(d => (graft.util.Det.double01(
        graft.util.Det.at(42L + i, d.toLong)) - 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.annTopK(vecs, vecs.filter(col("vec_id") < 3), dim = 8, k = 3, planes = 4)
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.sameElements(sims.sorted.reverse)) // rank order = sim desc
    }
  }
}
