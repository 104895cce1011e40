package graft

import graft.pipe.SpanAudit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpanAuditSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-span-audit")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def relational = {
    import spark.implicits._
    Seq(
      // doc 1: clean — text 0,1 + media 2
      (1L, "text", "a", "", 0), (1L, "text", "b", "", 1), (1L, "media", "", "m://1", 2),
      // doc 2: gap (offset 1 missing) and doesn't start at 0? starts at 0, hole at 1
      (2L, "text", "a", "", 0), (2L, "text", "c", "", 2),
      // doc 3: duplicate offset 0
      (3L, "text", "a", "", 0), (3L, "text", "a2", "", 0), (3L, "media", "", "m://3", 1),
      // doc 4: media without ref + text with stray ref
      (4L, "text", "a", "m://oops", 0), (4L, "media", "", "", 1),
      // doc 5: bad kind + first offset nonzero
      (5L, "blob", "x", "", 1), (5L, "text", "y", "", 2)
    ).toDF("doc_id", "kind", "text", "media_ref", "offset")
  }

  test("audit flags each violation class; clean doc is clean") {
    spark.sparkContext.setLogLevel("WARN")
    val got = SpanAudit.audit(relational).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(got(0) == ((1L, 3L, 0L, 0L, 0L, 0L, 0L, true)))
    assert(got(1) == ((2L, 2L, 0L, 1L, 0L, 0L, 0L, false)))  // one hole
    assert(got(2) == ((3L, 3L, 1L, 0L, 0L, 0L, 0L, false)))  // one dup
    assert(got(3) == ((4L, 2L, 0L, 0L, 0L, 2L, 0L, false)))  // both media faults
    // doc 5: offsets {1,2} -> max+1 - 2 = 1 missing, first=1, one bad kind
    assert(got(4) == ((5L, 2L, 0L, 1L, 1L, 0L, 1L, false)))
  }

  test("auditNested == audit on the same spans; empty array is unclean") {
    import spark.implicits._
    val nested = relational
      .groupBy("doc_id")
      .agg(collect_list(struct(col("kind"), col("text"),
        col("media_ref"), col("offset"))).as("spans"))
    val a = SpanAudit.audit(relational).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val b = SpanAudit.auditNested(nested).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    val empty = Seq((9L, Seq.empty[(String, String, String, Int)]))
      .toDF("doc_id", "raw")
      .select(col("doc_id"), transform(col("raw"), x => struct(
        x("_1").as("kind"), x("_2").as("text"),
        x("_3").as("media_ref"), x("_4").as("offset"))).as("spans"))
    val e = SpanAudit.auditNested(empty).collect().head
    assert(e.getLong(1) == 0L && !e.getBoolean(7) && e.isNullAt(4))
  }

  test("the flagship text-branch span output audits clean") {
    import spark.implicits._
    // x18-shaped construction: dense offsets from 0, text-only spans
    val docs = Seq(
      (1L, (1 to 25).map(i => s"w$i").mkString(" ")),
      (2L, "one two three")).toDF("doc_id", "text")
    val toks = graft.functions.GraftFunctions.tokenizeWords(col("text"))
    val spans = docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor((size(col("toks")) - 1) / lit(10)).cast("int"))).as("i"),
        col("toks"))
      .select(col("doc_id"), lit("text").as("kind"),
        array_join(slice(col("toks"), col("i") * 10 + 1, lit(10)), " ").as("text"),
        lit("").as("media_ref"), col("i").cast("int").as("offset"))
    val out = SpanAudit.audit(spans).collect()
    assert(out.nonEmpty && out.forall(_.getBoolean(7)))
  }
}
