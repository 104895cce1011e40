package graft

import graft.ops.Profile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-profile")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("profile: nulls, exact distinct under k, min/max, arrays row-counted only") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val df = Seq(
      (1L, Some("alpha"), Seq(1, 2)),
      (2L, Some("beta"), Seq.empty[Int]),
      (3L, None, Seq(3)),
      (4L, Some("alpha"), Seq(4)))
      .toDF("id", "name", "xs")
    val p = Profile.columns(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "name", "xs"))
    val id = p("id")
    assert(id.getString(1) == "bigint" && id.getLong(2) == 4L && id.getLong(3) == 0L)
    assert(id.getLong(4) == 4L) // exact under k
    assert(id.getString(5) == "1" && id.getString(6) == "4")
    val name = p("name")
    assert(name.getLong(2) == 3L && name.getLong(3) == 1L)
    assert(name.getLong(4) == 3L) // alpha, beta, null-sentinel
    assert(name.getString(5) == "alpha" && name.getString(6) == "beta")
    val xs = p("xs")
    assert(xs.getLong(2) == 4L && xs.getLong(3) == 0L)
    assert(xs.getLong(4) == -1L && xs.getString(5) == "" && xs.getString(6) == "")
    // a literal dotted column name must profile as-is, not as a
    // nested-field access
    val dotted = Seq((1L, "x"), (2L, "y")).toDF("id", "a.b")
    val pd = Profile.columns(dotted).collect().map(r => r.getString(0) -> r).toMap
    assert(pd("a.b").getLong(2) == 2L && pd("a.b").getLong(4) == 2L)
  }

  test("profile runs on the real corpus tables (schema-dynamic)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // k=1024 > 500 distinct doc_ids -> exact; default k=256 estimates
    val p = Profile.columns(docs, kmvK = 1024).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("doc_id").getLong(2) == 500L && p("doc_id").getLong(4) == 500L)
    val est = Profile.columns(docs).collect()
      .map(r => r.getString(0) -> r).toMap.apply("doc_id").getLong(4)
    assert(math.abs(est - 500.0) / 500.0 < 0.2, s"estimate $est off by >20%")
    assert(p("lang").getLong(4) >= 2L)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val pe = Profile.columns(ev).collect().map(r => r.getString(0) -> r).toMap
    assert(pe("event_type").getLong(4) == 5L)
  }
}
