package graft

import graft.ops.Packing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {

  test("paddingWaste: min-cap pick, exact-power boundary, truncation above top cap, zero-token doc") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = Seq(
      (1L, 3L),    // -> 4 bucket, waste 1/4
      (2L, 4L),    // exactly 4 -> 4 bucket, zero waste
      (3L, 5L),    // -> 8
      (4L, 100L),  // above top cap 16 -> truncates to 16
      (5L, 0L)     // zero tokens -> smallest bucket, full waste
    ).toDF("doc_id", "n")
    val got = Packing.paddingWaste(docs, col("n"), caps = Seq(4L, 8L, 16L))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (4L, 3L, 7L, 0L, 12L, 0.416667),   // docs 1,2,5: kept 3+4+0
      (8L, 1L, 5L, 0L, 8L, 0.375),
      (16L, 1L, 16L, 84L, 16L, 0.0)))    // doc 4 truncated by 84
    intercept[IllegalArgumentException] {
      Packing.paddingWaste(docs, col("n"), caps = Seq(8L, 4L))
    }
  }

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-packing")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("packByBudget == the naive global running-sum window; invariant to partition count") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new scala.util.Random(11)
    // 500 docs, token counts 0..99, plus one 10x-budget monster and a
    // zero-token doc — the boundary-skip and empty-doc edges
    val rows = (0 until 500).map(i => (i.toLong, rnd.nextInt(100).toLong)) ++
      Seq((500L, 1000L), (501L, 0L), (502L, 7L))
    val df = rows.toDF("doc_id", "n")
    val budget = 100L
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // naive oracle: one global window (the thing that does NOT scale)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = canon(df
      .withColumn("n_tokens", col("n"))
      .withColumn("run", sum(col("n")).over(w))
      .withColumn("shard", ((col("run") - col("n")) - pmod(col("run") - col("n"), lit(budget))) / budget)
      .select(col("doc_id"), col("n_tokens"), col("shard").cast("long")))
    for (parts <- Seq(1, 3, 7, 32)) {
      val got = canon(Packing.packByBudget(df, budget, col("n"), parts = parts))
      assert(got == naive, s"parts=$parts diverged from the global-window oracle")
    }
    // shard boundaries: consecutive docs, shard never decreases, and
    // the monster doc advances the shard counter by ~10
    val shards = naive.map(_._3)
    assert(shards.zip(shards.tail).forall { case (a, b) => b >= a })
    val monsterIdx = naive.indexWhere(_._1 == 500L)
    assert(naive(monsterIdx + 2)._3 - naive(monsterIdx)._3 >= 9)
  }
}
