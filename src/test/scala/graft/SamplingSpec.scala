package graft

import graft.ops.Sampling
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sampling")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stratifiedSample == the naive per-stratum window; exact quotas; salt-count invariant") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // whale stratum (5000 docs) + tiny strata incl. one below quota
    val rows = (0 until 5000).map(i => (i.toLong, "whale")) ++
      (5000 until 5040).map(i => (i.toLong, "mid")) ++
      (5040 until 5043).map(i => (i.toLong, "tiny"))
    val df = rows.toDF("doc_id", "lang")
    val k = 10
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(Sampling.detRank(col("doc_id")), col("doc_id"))
    val naive = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("lang"), col("doc_id"), col("rn"))
      .orderBy(col("lang"), col("rn")).collect().map(_.toSeq).toSeq
    for (salts <- Seq(1, 4, 64)) {
      val got = Sampling.stratifiedSample(df, "lang", k, salts = salts)
        .orderBy(col("lang"), col("rn")).collect().map(_.toSeq).toSeq
      assert(got == naive, s"salts=$salts diverged from the naive window")
    }
    // quotas: full strata give exactly k, the below-quota stratum all 3
    val counts = naive.groupBy(_.head).view.mapValues(_.size).toMap
    assert(counts == Map("whale" -> k, "mid" -> k, "tiny" -> 3))
    // deterministic: same sample on a rerun
    val again = Sampling.stratifiedSample(df, "lang", k)
      .orderBy(col("lang"), col("rn")).collect().map(_.toSeq).toSeq
    assert(again == naive)
  }

  test("proportionalSample == the naive window with ceil(rate*n) quotas; rate 0 and 1 edges; parts invariant") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // whale stratum with a HIGH rate (the case the salted top-k can't
    // bound), plus small strata at rate edges
    val rows = (0 until 4000).map(i => (i.toLong, "whale")) ++
      (4000 until 4031).map(i => (i.toLong, "mid")) ++      // 31 docs
      (4031 until 4036).map(i => (i.toLong, "none")) ++     // rate 0
      (4036 until 4043).map(i => (i.toLong, "all"))         // rate 1
    val df = rows.toDF("doc_id", "lang")
    val rate = when(col("lang") === "whale", 0.9)
      .when(col("lang") === "mid", 0.25)
      .when(col("lang") === "none", 0.0)
      .otherwise(1.0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(Sampling.detRank(col("doc_id")), col("doc_id"))
    val n = Window.partitionBy(col("lang"))
    val naive = df
      .withColumn("rn", row_number().over(w))
      .withColumn("__q", ceil(rate * count(lit(1)).over(n)))
      .filter(col("rn") <= col("__q"))
      .select(col("lang"), col("doc_id"), col("rn"))
      .orderBy(col("lang"), col("rn")).collect().map(_.toSeq).toSeq
    for (parts <- Seq(0, 1, 7)) {
      val got = Sampling.proportionalSample(df, "lang", rate, parts = parts)
        .orderBy(col("lang"), col("rn")).collect().map(_.toSeq).toSeq
      assert(got == naive, s"parts=$parts diverged from the naive window")
    }
    val counts = naive.groupBy(_.head).view.mapValues(_.size).toMap
    assert(counts == Map("whale" -> 3600, "mid" -> 8, "all" -> 7))
    assert(!counts.contains("none"))
  }

  test("rankBands: ntile-exact sizes (differ by <= 1), monotone in the order key, parts invariant") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // 503 rows: 10 bands of 50/51 — and a tie-heavy key to force the
    // id tiebreak to matter
    val df = (0 until 503).map(i => (i.toLong, (i % 13).toLong)).toDF("doc_id", "score")
    val out = Sampling.rankBands(df, Seq(col("score"), col("doc_id")), bands = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.length == 503)
    val sizes = out.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes.keySet == (1 to 10).toSet)
    assert(sizes.values.forall(s => s == 50 || s == 51))
    assert(sizes.values.sum == 503)
    // band is monotone in pos, and pos follows (score, doc_id) order
    val byPos = out.sortBy(_._3)
    assert(byPos.map(r => (r._2, r._1)).toSeq == byPos.map(r => (r._2, r._1)).sortBy(identity).toSeq)
    assert(byPos.map(_._4).toSeq == byPos.map(_._4).sorted.toSeq)
    // parts invariance
    val p1 = Sampling.rankBands(df, Seq(col("score"), col("doc_id")), 10, parts = 1)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val p7 = Sampling.rankBands(df, Seq(col("score"), col("doc_id")), 10, parts = 7)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(p1 == p7)
  }

  test("prioritySample == the brute-force A-ES formula; nonpositive weights excluded; weight dominance") {
    import spark.implicits._
    val docs = (1 to 500).map(i =>
      (s"d$i", if (i % 7 == 0) 0L else (i % 20 + 1).toLong)).toDF("doc_id", "w")
    val out = Sampling.prioritySample(docs, col("w"), k = 50).collect()
    assert(out.length == 50)
    assert(out.map(_.getInt(3)).toSeq == (1 to 50))
    // brute-force twin of the exact formula (md5 head -> u -> ln(u)/w)
    def pr(id: String, w: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).take(4)
        .foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      val u = (h + 1).toDouble / 4294967296.0
      math.round(math.log(u) / w * 1e9) / 1e9
    }
    val expect = (1 to 500).map(i => (s"d$i", (i % 20 + 1).toLong))
      .filter { case (id, _) => id.drop(1).toInt % 7 != 0 }
      .map { case (id, w) => (id, pr(id, w)) }
      .sortBy { case (id, p) => (-p, id) }
      .take(50)
    assert(out.map(r => (r.getString(0), r.getDouble(2))).toSeq == expect,
      "Spark top-k == the brute-force A-ES ranking, priorities bit-equal")
    // no excluded-weight row survives
    assert(out.forall(_.getDouble(1) > 0.0))
    // dominance: weight 10000 vs 500 weight-1 rows -> the heavy row is
    // expected in any top-50 with overwhelming probability (its
    // inclusion probability is ~1 - (1-10000/10500)^50); deterministic
    // here because the hash draw is fixed
    val skewed = (1 to 500).map(i => (s"s$i", 1L)) :+ ("whale", 10000L)
    val top = Sampling.prioritySample(skewed.toDF("doc_id", "w"), col("w"), k = 50)
      .collect().map(_.getString(0)).toSet
    assert(top.contains("whale"))
  }
}
