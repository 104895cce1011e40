package graft

import graft.gen.Corpus
import graft.nav.Nav
import graft.pipe.{ExtractJob, StructureJob}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Navigation as a query surface over the extracted output table —
  * the batch reformulation of the reference's cursor endpoints
  * (SURVEY.md §2.6): clamped moves are pure expressions, "current
  * unit" is element_at, column navigation is the id semi-join.
  */
class NavSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-nav")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val extracted = {
    spark.sparkContext.setLogLevel("WARN")
    ExtractJob.run(spark,
      Corpus.documents(spark, sfDir).toDF(),
      Corpus.media(spark, sfDir).toDF()).cache()
  }

  test("span navigation: next/prev/goto clamp against the real span counts") {
    val nav = extracted.select(
      col("doc_id"), size(col("spans")).as("total"),
      Nav.next(lit(0), size(col("spans"))).as("n1"),
      Nav.previous(lit(0)).as("p0"),
      Nav.goto(lit(999), size(col("spans"))).as("glast"),
      Nav.spanAt(col("spans"), lit(999))("offset").as("last_offset"))
      .collect()
    nav.foreach { r =>
      val total = r.getInt(1)
      assert(r.getInt(2) == math.min(1, total - 1))
      assert(r.getInt(3) == 0)
      assert(r.getInt(4) == total - 1)
      assert(r.getInt(5) == total - 1) // offsets dense 0..n-1: clamp hits last span
    }
  }

  test("get-current-span via element_at returns the span at the clamped cursor") {
    val row = extracted.orderBy("doc_id").limit(1)
      .select(Nav.spanAt(col("spans"), lit(0)).as("s"), col("spans")(0).as("first"))
      .collect()(0)
    assert(row.getStruct(0) == row.getStruct(1))
  }

  test("column navigation: paragraphsOfColumn is the id semi-join (app.py:1810-1812)") {
    val structs = StructureJob.run(spark, Corpus.media(spark, sfDir).toDF().limit(10))
    val exploded = structs.select(
      col("media_ref"),
      col("structure.paragraphs").as("paragraphs"),
      explode(col("structure.columns")).as("c"))
    val out = exploded.select(
      col("media_ref"), col("c.id").as("col_id"),
      Nav.paragraphsOfColumn(col("paragraphs"), col("c.paragraphs")).as("colParas"),
      col("c.paragraphs").as("ids"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val kept = r.getSeq[org.apache.spark.sql.Row](2).map(_.getInt(0)) // paragraph ids
      val want = r.getSeq[Int](3)
      assert(kept.sorted == want.sorted, s"${r.getString(0)} col ${r.getInt(1)}")
      // every kept paragraph's column field equals this column id
      r.getSeq[org.apache.spark.sql.Row](2).foreach { p =>
        assert(p.getInt(p.fieldIndex("column")) == r.getInt(1))
      }
    }
  }
}
