package graft

import graft.ops.Html
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-html")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def strip(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.stripHtml(col("h"))).collect()(0).getString(0)
  }

  test("stripHtml drops script/style bodies and comments, removes tags, collapses whitespace") {
    spark.sparkContext.setLogLevel("WARN")
    assert(strip("<p>hello   <b>world</b></p>") == "hello world")
    assert(strip("<script>var a = 1 < 2; document.x('</div>');</script>ok") == "ok")
    assert(strip("a<style type=\"text/css\">p { color: red; }</style>b") == "a b")
    assert(strip("x<!-- hidden <b>comment</b> -->y") == "x y")
    assert(strip("  \n\t  spaced\n\nout  ") == "spaced out")
    assert(strip("") == "")
  }

  test("stripHtml decodes entities after tag removal, amp last (no double decode)") {
    assert(strip("fish &amp; chips") == "fish & chips")
    assert(strip("&lt;b&gt; is text") == "<b> is text")
    // double-encoded: &amp;lt; must decode to the TEXT "&lt;", not "<"
    assert(strip("&amp;lt;") == "&lt;")
    assert(strip("&quot;q&quot; &#39;a&#39;") == "\"q\" 'a'")
    assert(strip("a&nbsp;b") == "a b")
    // unknown entities pass through
    assert(strip("&copy; 2026") == "&copy; 2026")
  }

  private val page =
    SparkEntry.pageHead + "alpha beta gamma delta epsilon zeta" +
      SparkEntry.pageMid + SparkEntry.pageTail

  test("blocks: split on closing block tags with per-block word/link stats") {
    import spark.implicits._
    val b = Html.blocks(Seq((7L, page)).toDF("id", "html"), col("html"), col("id"))
      .orderBy(col("block_pos")).collect()
    assert(b.length == 6)
    // head+nav chrome: title word + 5 nav words = 6+ words, 3 links
    assert(b(0).getAs[Int]("n_links") == 3)
    assert(b(0).getAs[Int]("n_words") >= 5)
    // first content paragraph: the document text is in it, zero links
    assert(b(1).getAs[String]("block_text").contains("alpha beta gamma"))
    assert(b(1).getAs[String]("block_text").startsWith("Fish & chips <b> today:"))
    assert(b(1).getAs[Int]("n_links") == 0)
    // empty seam between </p> and </div>
    assert(b(3).getAs[String]("block_text") == "" && b(3).getAs[Int]("n_words") == 0)
    // footer: short and linked
    assert(b(4).getAs[Int]("n_links") == 1 && b(4).getAs[Int]("n_words") == 3)
  }

  test("mainContent keeps body copy, drops nav (link rule) and footer (min-words rule)") {
    import spark.implicits._
    val out = Html.mainContent(Seq((7L, page)).toDF("id", "html"),
      col("html"), col("id")).collect()(0)
    assert(out.getAs[Long]("n_blocks") == 6L)
    assert(out.getAs[Long]("n_kept") == 2L)
    val main = out.getAs[String]("main_text")
    assert(main ==
      "Fish & chips <b> today: alpha beta gamma delta epsilon zeta\n\n" +
        "This closing paragraph carries enough plain words to stay.")
    assert(!main.contains("home") && !main.contains("terms"))
    // a page with nothing that qualifies yields an empty main_text row
    val none = Html.mainContent(
      Seq((1L, "<nav><a href=\"/\">x</a></nav>")).toDF("id", "html"),
      col("html"), col("id")).collect()(0)
    assert(none.getAs[Long]("n_kept") == 0L && none.getAs[String]("main_text") == "")
  }
}
