package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WebClean

class WebCleanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(WebClean.extractHtmlText($"h").as("t"))
      .as[String].head()

  test("extractHtmlText drops script/style WITH contents, keeps body text") {
    val html = "<html><head><style>p{color:red}</style>" +
      "<script type=\"text/javascript\">if (1 < 2) alert('x');</script>" +
      "</head><body><p>Hello world</p></body></html>"
    assert(extract(html) == "Hello world")
  }

  test("extractHtmlText: multi-line containers, any casing, comments") {
    val html = "a<SCRIPT>\nvar x = 1;\nvar y = 2;\n</ScRiPt>b" +
      "<!-- multi\nline\ncomment -->c<StYlE>\n.x { }\n</style>d"
    assert(extract(html) == "abcd")
  }

  test("extractHtmlText: tags become spaces so block boundaries don't glue words") {
    assert(extract("<p>one</p><p>two</p>") == "one two")
    assert(extract("line<br/>break") == "line break")
  }

  test("extractHtmlText decodes the five core entities, &amp; last") {
    assert(extract("Tom &amp; Jerry") == "Tom & Jerry")
    assert(extract("&lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end")
      == "<tag> \"q\" 's' end")
    // literal "&amp;lt;" must render as the TEXT "&lt;", not "<"
    assert(extract("&amp;lt;") == "&lt;")
  }

  test("extractHtmlText collapses whitespace runs and trims") {
    assert(extract("  a \n\t b  \r\n c  ") == "a b c")
  }

  test("blocklistHits counts whole words only, case-insensitively") {
    val df = Seq(
      ("the THE The theater", 3L), // "theater" must NOT match "the"
      ("spam SPAM spammer", 2L),
      ("clean text here", 0L)).toDF("t", "want")
    val got = df.select(
      WebClean.blocklistHits($"t", Seq("spam", "the")).cast("long").as("got"),
      $"want").collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("blocklistSignals keep verdict is hits == 0") {
    val df = Seq((1L, "all clean"), (2L, "some spam here")).toDF("doc_id", "text")
    val got = WebClean.blocklistSignals(df, "doc_id", "text", Seq("spam"))
      .orderBy("doc_id").collect()
    assert(got(0).getBoolean(2) && !got(1).getBoolean(2))
  }

  test("blocklist words must be alphanumeric literals") {
    intercept[IllegalArgumentException] {
      WebClean.blocklistHits(lit("x"), Seq("a.b"))
    }
  }

  test("urlHost strips scheme, userinfo, www, port, path, query, fragment") {
    val cases = Seq(
      ("https://www.Example.COM/path?q=1#f", "example.com"),
      ("http://user:pw@sub.example.org:8080/x", "sub.example.org"),
      ("https://example.co.uk", "example.co.uk"),
      ("ftp://files.example.net/pub", "files.example.net"),
      ("not a url", ""))
    val df = cases.toDF("u", "want")
    val got = df.select(WebClean.urlHost($"u").as("got"), $"want").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("urlSite takes two labels, three under two-label public suffixes") {
    val cases = Seq(
      ("sub.deep.example.com", "example.com"),
      ("news.bbc.co.uk", "bbc.co.uk"),
      ("a.b.gov.au", "b.gov.au"),
      ("example.org", "example.org"))
    val df = cases.toDF("h", "want")
    val got = df.select(WebClean.urlSite($"h").as("got"), $"want").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("parseUrls composes host+site for domain-level policy joins") {
    val df = Seq((7L, "https://www.shop.example.co.uk/cart")).toDF("doc_id", "url")
    val row = WebClean.parseUrls(df, "doc_id", "url").head()
    assert(row.getString(1) == "shop.example.co.uk")
    assert(row.getString(2) == "example.co.uk")
  }
}
