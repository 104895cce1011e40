package graft

import graft.functions.{Fingerprint64, GraftFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fn")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fpRef(s: String): Long = {
    var h = 0L
    s.getBytes("UTF-8").foreach(b => h = h * 1000003L + (b & 0xffL))
    h
  }

  test("Fingerprint64 interpreted eval matches the reference fold") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val data = Seq("", "a", "hello world", "Ünïcödé ok", "x" * 5000)
    val out = data.toDF("s")
      .select(GraftFunctions.fingerprint64(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == data.map(fpRef))
  }

  test("Fingerprint64 participates in whole-stage codegen and agrees with eval") {
    import spark.implicits._
    val df = spark.range(0, 100000, 1, 4)
      .select(concat(lit("doc "), col("id")).as("s"))
      .select(col("s"), GraftFunctions.fingerprint64(col("s")).as("h"))
    df.collect() // finalize plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen:\n$plan")
    // spot check values against the reference fold
    df.limit(5).collect().foreach(r => assert(r.getLong(1) == fpRef(r.getString(0))))
    // distinctness sanity: 100k inputs, no mass collisions
    assert(df.select(countDistinct(col("h"))).head().getLong(0) > 99000L)
  }

  test("registered SQL function graft_fingerprint64 works and null-propagates") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("a", 1)).toDF("s", "i").createOrReplaceTempView("t_fn")
    val r = spark.sql("SELECT graft_fingerprint64(s), graft_fingerprint64(NULL) FROM t_fn")
      .collect()(0)
    assert(r.getLong(0) == fpRef("a"))
    assert(r.isNullAt(1))
  }

  test("type check rejects non-string input") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(1).toDF("i").select(GraftFunctions.fingerprint64(col("i"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }

  // ---- SimHash64 ----

  /** Reference vote fold mirroring the declarative twin's semantics. */
  private def shRef(hs: Seq[Long]): Long = {
    val votes = new Array[Int](64)
    hs.foreach(h => (0 until 64).foreach(b =>
      votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)))
    (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
  }

  test("SimHash64 native expression == declarative twin == reference fold (codegen on)") {
    import spark.implicits._
    val data = Seq(
      Seq.empty[Long], Seq(0L), Seq(-1L), Seq(Long.MinValue, Long.MaxValue),
      (1L to 100L).map(i => i * 0x9e3779b97f4a7c15L))
    val df = data.toDF("hs").select(
      col("hs"),
      GraftFunctions.simhash64(col("hs")).as("native"),
      graft.ops.Dedup.simhashFromHashes(col("hs")).as("twin"))
    df.collect().foreach { r =>
      val hs = r.getSeq[Long](0)
      assert(r.getLong(1) == shRef(hs), s"native vs ref for $hs")
      assert(r.getLong(1) == r.getLong(2), s"native vs declarative twin for $hs")
    }
  }

  test("MinHashSig native expression == declarative twin (codegen on)") {
    import spark.implicits._
    val data = Seq(Seq.empty[Long], Seq(7L), (1L to 50L).map(i => (i * 2654435761L) & 0x7fffffffL))
    val df = data.toDF("hs").select(
      GraftFunctions.minhashSig(col("hs"), 16).as("native"),
      graft.ops.Dedup.minhashSignature(col("hs"), 16).as("twin"))
    df.collect().foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1), s"native ${r.getSeq[Any](0)} != twin ${r.getSeq[Any](1)}")
    }
  }

  test("SimHash64 agrees between codegen and interpreted paths on random token sets") {
    import spark.implicits._
    val df = spark.range(0, 2000, 1, 4)
      .select(transform(sequence(lit(1), (col("id") % 37 + 1).cast("int")),
        i => xxhash64(concat(col("id"), i))).as("hs"))
      .select(col("hs"), GraftFunctions.simhash64(col("hs")).as("h"))
    df.collect() // codegen path
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen:\n$plan")
    df.limit(50).collect().foreach(r => assert(r.getLong(1) == shRef(r.getSeq[Long](0))))
  }
}
