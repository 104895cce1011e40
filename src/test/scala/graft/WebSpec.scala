package graft

import graft.ops.Web
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WebSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-web")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    urls.toDF("u").select(Web.canonicalizeUrl(col("u"))).collect().map(_.getString(0)).toSeq
  }

  test("scheme/host lowercase; path and query case preserved") {
    assert(canon("HTTPS://WWW.Site.COM/Path/File?Q=Val") ==
      Seq("https://site.com/Path/File?Q=Val"))
  }

  test("fragment, default ports, www stripped; non-default port kept") {
    assert(canon(
      "https://site.com:443/a#sec",
      "http://site.com:80/a",
      "https://site.com:8443/a",
      "http://www.site.com/a?x=1#f") ==
      Seq("https://site.com/a", "http://site.com/a",
        "https://site.com:8443/a", "http://site.com/a?x=1"))
  }

  test("tracking params drop in runs; real params survive; dangling separators tidied") {
    assert(canon(
      "https://s.com/p?utm_source=a&utm_campaign=b&id=7&gclid=x",
      "https://s.com/p?id=7&utm_a=1&utm_b=2&lang=en",
      "https://s.com/p?utm_only=1",
      "https://s.com/p?fbclid=9",
      "https://s.com/p?xref=keep&ref=drop") ==
      Seq("https://s.com/p?id=7",
        "https://s.com/p?id=7&lang=en",
        "https://s.com/p",
        "https://s.com/p",
        "https://s.com/p?xref=keep"))
  }

  test("host and registered domain extraction, incl. two-part ccTLD suffixes") {
    import spark.implicits._
    val rows = Seq(
      "https://a.b.site.com/x",
      "https://news.site.co.uk/x",
      "https://site.com",
      "https://localhost/x").toDF("u")
      .select(Web.hostOf(col("u")).as("h"))
      .withColumn("d", Web.registeredDomainOf(col("h")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(
      ("a.b.site.com", "site.com"),
      ("news.site.co.uk", "site.co.uk"),
      ("site.com", "site.com"),
      ("localhost", "localhost")))
  }
}
