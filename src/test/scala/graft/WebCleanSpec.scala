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

  test("extractHtmlText decodes numeric character references: decimal, " +
    "hex (either marker case), the HTML5 C1→cp1252 remap, and " +
    "whitespace-producing refs collapse") {
    assert(extract("caf&#233; r&#xE9;sum&#XE9;") == "café résumé")
    assert(extract("curly&#8217;s &#x2019;") == "curly’s ’")
    // HTML5 numeric rule: 0x80-0x9F go through windows-1252 —
    // &#151; is an em dash in every browser, not a C1 control
    assert(extract("a&#151;b") == "a—b")
    assert(extract("a&#145;x&#146;") == "a‘x’")
    // undefined cp1252 slots stay identity; the C1 control survives
    // (0x81 is not in the whitespace-collapse class)
    assert(extract("a&#129;b") == "ab")
    // newline/tab refs decode then COLLAPSE with the whitespace pass
    assert(extract("a&#10;&#9;b") == "a b")
    // NBSP — named, numeric, or a raw U+00A0 byte — normalizes to a
    // plain space (the collapse class includes \xA0)
    assert(extract("a&nbsp;&#160;&#xA0;b") == "a b")
    assert(extract("a b   c") == "a b c")
  }

  test("extractHtmlText numeric refs: invalid values become U+FFFD, " +
    "truncated/overlong runs stay literal, double-escapes single-pass") {
    assert(extract("x&#0;y") == "x�y")
    assert(extract("x&#xD800;y &#xDFFF;") == "x�y �")
    assert(extract("x&#x110000;y &#1114112;") == "x�y �")
    assert(extract("max&#x10FFFF;") == "max" + new String(Character.toChars(0x10FFFF)))
    // no semicolon -> literal, incl. at end-of-string
    assert(extract("x&#12 y") == "x&#12 y")
    assert(extract("x&#xE9") == "x&#xE9")
    // digit run past the cap (8 dec / 6 hex) -> literal
    assert(extract("x&#123456789;") == "x&#123456789;")
    assert(extract("x&#x1234567;") == "x&#x1234567;")
    // single pass: &amp;#233; is the LITERAL text &#233;
    assert(extract("x&amp;#233;y") == "x&#233;y")
    assert(extract("&amp;amp;") == "&amp;")
  }

  test("extractHtmlText named references: HTML4 set + apos, " +
    "case-sensitive, unknown names and bare ampersands stay literal") {
    assert(extract("acc&eacute;nt &Eacute; &hellip; &mdash; &euro;100")
      == "accént É … — €100")
    assert(extract("&alpha;&Omega; &apos;q&apos;") == "αΩ 'q'")
    // case-SENSITIVE: &EACUTE; is not an entity
    assert(extract("&EACUTE; &unknown; &x;") == "&EACUTE; &unknown; &x;")
    assert(extract("a & b &c") == "a & b &c")
    assert(extract("&eacute") == "&eacute") // missing semicolon
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

  test("canonicalizeUrl: fragment/tracking dropped, case/port/slash " +
    "normalized, params sorted — variants collide on one key") {
    val cases = Seq(
      ("HTTPS://WWW.Example.COM:443/Path/To/Item/?b=2&utm_source=x&a=1#top",
        "https://www.example.com/Path/To/Item?a=1&b=2"),
      ("https://www.example.com/Path/To/Item?a=1&b=2",
        "https://www.example.com/Path/To/Item?a=1&b=2"),
      ("http://Host.net:80/", "http://host.net"),
      ("http://host.net:8080/x", "http://host.net:8080/x"), // non-default port kept
      ("https://host.net:80/x", "https://host.net:80/x"),   // 80 not default for https
      ("https://h.io/p?ref=rss&gclid=abc&fbclid=z", "https://h.io/p"),
      ("https://h.io/CaseSensitive/Path", "https://h.io/CaseSensitive/Path"),
      // userinfo: case PRESERVED (RFC 3986), and a ':' inside it must
      // not defeat the default-port strip on the host:port segment
      ("http://alice:PW@Example.com:80/x", "http://alice:PW@example.com/x"),
      ("HTTPS://Bob@Example.com:443/y", "https://Bob@example.com/y"))
    val got = cases.toDF("u", "want")
      .select(WebClean.canonicalizeUrl($"u").as("got"), $"want").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got ${r.getString(0)} want ${r.getString(1)}"))
    // the point: all tracking/case/port/order variants of one page
    // collapse to ONE dedup key
    val variants = Seq(
      "https://shop.example.com/item?color=red&size=m",
      "HTTPS://shop.example.com:443/item/?size=m&color=red#reviews",
      "https://Shop.Example.Com/item?utm_campaign=q3&color=red&size=m")
    val keys = variants.toDF("u")
      .select(WebClean.canonicalizeUrl($"u").as("c")).as[String].collect()
    assert(keys.distinct.length == 1, keys.mkString(" | "))
  }

  test("canonicalizeUrl: schemeless / non-URL rows pass through " +
    "unchanged instead of gaining a malformed '://' prefix") {
    val cases = Seq(
      "example.com/path?a=1",       // schemeless URL-ish
      "not a url at all",           // prose
      "",                           // empty
      "ftp.example.com#frag")       // no scheme, fragment-looking tail
    val got = cases.toDF("u")
      .select($"u", WebClean.canonicalizeUrl($"u").as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach(u => assert(got(u) == u, s"input '$u' -> '${got(u)}'"))
    // schemed inputs still canonicalize (the guard keys on the scheme
    // match, not on content heuristics)
    val ok = Seq("HTTP://X.io:80/a/").toDF("u")
      .select(WebClean.canonicalizeUrl($"u")).as[String].head()
    assert(ok == "http://x.io/a")
  }

  test("Psl.parse reads the standard format: comments, sections, " +
    "wildcards, exceptions; bundled subset loads") {
    val psl = graft.functions.Psl.parse(Iterator(
      "// a comment", "", "com", "  co.uk  ", "*.ck", "!www.ck",
      "// ===BEGIN PRIVATE DOMAINS===", "github.io", "*"))
    assert(psl.normal == Set("com", "co.uk", "github.io"))
    assert(psl.wildcardBases == Set("ck"))
    assert(psl.exceptions == Set("www.ck"))
    val subset = graft.functions.Psl.subset
    assert(subset.normal.contains("co.uk") && subset.normal.contains("github.io"))
    assert(subset.wildcardBases.contains("kawasaki.jp"))
    assert(subset.exceptions.contains("city.kawasaki.jp"))
  }

  test("Psl.suffixLabelCount implements the published algorithm: " +
    "longest rule, wildcard = one label, exception prevails, default *") {
    val psl = graft.functions.Psl.subset
    val cases = Seq(
      // (host, expected public-suffix label count)
      ("example.com", 1),               // normal 1-label rule
      ("shop.example.co.uk", 2),        // multi-label rule beats 'uk'
      ("example.jp", 1),
      ("foo.sub.kawasaki.jp", 3),       // *.kawasaki.jp consumes 'sub'
      ("sub.kawasaki.jp", 3),           // host IS the wildcard suffix
      ("city.kawasaki.jp", 2),          // !exception: rule minus lead label
      ("u.city.kawasaki.jp", 2),
      ("example.ck", 2),                // *.ck: whole host is the suffix
      ("u.example.ck", 2),
      ("www.ck", 1),                    // !www.ck
      ("u.www.ck", 1),
      ("pages.github.io", 2),           // private-section rule
      ("example.unknown", 1),           // default rule *
      ("", 0))
    cases.foreach { case (h, want) =>
      assert(psl.suffixLabelCount(h) == want, s"host=$h") }
  }

  test("Psl production-path hardening: Unicode IDN rules match " +
    "punycode hosts, mixed-case hosts match rules") {
    // the published list writes IDN rules in Unicode; crawl hosts are
    // punycoded — parse-time IDN.toASCII keys rules on the wire form
    val psl = graft.functions.Psl.parse(Iterator(
      "com", "рф", "*.テスト", "!exempt.テスト"))
    assert(psl.normal.contains("xn--p1ai"), psl.normal)
    assert(psl.suffixLabelCount("site.xn--p1ai") == 1)
    assert(psl.suffixLabelCount("a.b.xn--zckzah") == 2)  // *.テスト
    assert(psl.suffixLabelCount("exempt.xn--zckzah") == 1) // exception
    // hosts from arbitrary upstream extraction may be mixed-case
    assert(psl.suffixLabelCount("Site.COM") == 1)
    assert(graft.functions.Psl.subset.suffixLabelCount("Shop.Example.CO.UK") == 2)
  }

  test("parseUrlsPsl keys the registrable site from PSL rules, NULL " +
    "when the host is itself a public suffix or nothing URL-shaped") {
    val psl = graft.functions.Psl.subset
    val df = Seq(
      (1L, "https://www.shop.example.co.uk/cart"),
      (2L, "https://a.city.kawasaki.jp/"),
      (3L, "https://example.ck/x"),       // host == public suffix
      (4L, "https://me.pages.github.io"), // private-section suffix
      (5L, "not a url"),
      (6L, "https://shop.example.co.uk./x") // trailing-dot FQDN form
    ).toDF("doc_id", "url")
    val got = WebClean.parseUrlsPsl(df, "doc_id", "url", psl)
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) == "shop.example.co.uk" &&
      got(0).getString(2) == "example.co.uk" && got(0).getString(3) == "co.uk")
    assert(got(1).getString(2) == "city.kawasaki.jp" &&
      got(1).getString(3) == "kawasaki.jp")
    assert(got(2).getString(1) == "example.ck" && got(2).isNullAt(2) &&
      got(2).getString(3) == "example.ck")
    assert(got(3).getString(2) == "pages.github.io" &&
      got(3).getString(3) == "github.io")
    assert(got(4).isNullAt(2) && got(4).isNullAt(3))
    // FQDN trailing dot normalizes away: same keys as the dotless form
    assert(got(5).getString(1) == "shop.example.co.uk" &&
      got(5).getString(2) == "example.co.uk" && got(5).getString(3) == "co.uk")
    // still a zero-shuffle projection: the rule set is a codegen
    // reference object, not a join
    val plan = WebClean.parseUrlsPsl(df, "doc_id", "url", psl)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PSL parse shuffled:\n$plan")
  }
  // ---- Aho-Corasick blocklist scan (round 13) -----------------------------

  private def acCounts(text: String, terms: Seq[String]): Seq[Long] =
    new graft.functions.AcAutomaton(terms.toArray).scan(text).toSeq

  test("AcAutomaton counts ALL occurrences: overlapping, nested, and " +
    "suffix-link hits (the ushers classic)") {
    // he/she/his/hers over "ushers": she at 2-4, he at 3-4, hers at 3-6
    assert(acCounts("ushers", Seq("he", "she", "his", "hers")) ==
      Seq(1L, 1L, 0L, 1L))
    // overlapping occurrences of one term
    assert(acCounts("aaa", Seq("aa")) == Seq(2L))
    // nested term inside a longer match, both counted
    assert(acCounts("window", Seq("window", "in")) == Seq(1L, 1L))
    // empty text, no hits
    assert(acCounts("", Seq("x")) == Seq(0L))
  }

  test("extractLinks: both quote styles + unquoted, case-insensitive " +
    "attr, document-order pos, relative/mailto dropped without a base, " +
    "attrs before href ok, <area>/data-href decoys never match") {
    val html = """<html><body>
      |<a class="x" href="http://a.example/1">1</a>
      |<A HREF='https://b.example/2?q=1#f'>2</A>
      |<a href="/relative">r</a>
      |<a href='mailto:x@example.org'>m</a>
      |<a name="anchor-without-href">n</a>
      |<a href="HTTPS://C.example/3">3</a>
      |<a href=http://d.example/4>4</a>
      |<area href="http://decoy.example/x">
      |<article href="http://decoy.example/y">t</article>
      |<a data-href="http://decoy.example/z">z</a>
      |</body></html>""".stripMargin
    val got = WebClean.extractLinks(
        Seq((7L, html)).toDF("id", "html"), "id", "html")
      .orderBy("pos").select($"pos", $"url")
      .as[(Int, String)].collect().toSeq
    assert(got == Seq(
      (0, "http://a.example/1"),
      (1, "https://b.example/2?q=1#f"),
      // pos 2 = relative (dropped: no base), pos 3 = mailto (dropped)
      (4, "HTTPS://C.example/3"),
      (5, "http://d.example/4")))
    // no anchors -> no rows; null html -> no rows
    assert(WebClean.extractLinks(Seq((1L, "<p>none</p>"))
      .toDF("id", "html"), "id", "html").count() == 0)
  }

  test("extractLinks with a base URL resolves relative hrefs (RFC 3986 " +
    "merge, dot-segment normalization, protocol-relative, query-only, " +
    "fragment-only self-link dropped)") {
    val html = """<a href="/rooted">a</a>
      |<a href="sibling.html">b</a>
      |<a href="../up/x">c</a>
      |<a href="?page=2">d</a>
      |<a href="//other.example/m">e</a>
      |<a href="#frag">f</a>
      |<a href="./same/./y">g</a>
      |<a href="http://abs.example/z">h</a>""".stripMargin
    val got = WebClean.extractLinks(
        Seq((1L, "http://base.example:8080/dir/sub/page.html?old=1#top", html))
          .toDF("id", "base", "html"),
        "id", "html", baseUrlCol = Some("base"))
      .orderBy("pos").select($"pos", $"url")
      .as[(Int, String)].collect().toSeq
    assert(got == Seq(
      (0, "http://base.example:8080/rooted"),
      (1, "http://base.example:8080/dir/sub/sibling.html"),
      (2, "http://base.example:8080/dir/up/x"),
      (3, "http://base.example:8080/dir/sub/page.html?page=2"),
      (4, "http://other.example/m"),
      // pos 5 = fragment-only self-link, dropped
      (6, "http://base.example:8080/dir/sub/same/y"),
      (7, "http://abs.example/z")))
    // null base: relative links drop, absolute ones survive
    val nb = WebClean.extractLinks(
        Seq((1L, null.asInstanceOf[String],
          "<a href=\"/r\">r</a><a href=\"http://abs.example/z\">z</a>"))
          .toDF("id", "base", "html"),
        "id", "html", baseUrlCol = Some("base"))
      .select($"pos", $"url").as[(Int, String)].collect().toSeq
    assert(nb == Seq((1, "http://abs.example/z")))
    // leading ../ beyond root clamps; deep chains normalize to depth 4
    val deep = WebClean.extractLinks(
        Seq((1L, "http://b.example/d1/d2/page",
          "<a href=\"../../../clamped\">c</a>"))
          .toDF("id", "base", "html"),
        "id", "html", baseUrlCol = Some("base"))
      .select($"url").as[String].collect().toSeq
    assert(deep == Seq("http://b.example/clamped"))
  }

  test("extractLinks honors the FIRST <base href> element: relative " +
    "bases resolve against the page URL first, absolute bases replace " +
    "scheme+authority, pages without one keep the page URL") {
    val rows = Seq(
      // root-relative base element
      (1L, "http://h.example/p/page.html",
        "<head><base href=\"/bd/sub/\"></head>" +
          "<a href=\"x.html\">a</a><a href=\"/rooted\">b</a>"),
      // RELATIVE base element (resolves against the page dir first)
      (2L, "http://h.example/p/q/page.html",
        "<head><base href=\"../b2/\"></head><a href=\"y\">c</a>"),
      // absolute base on another host; protocol-relative link takes
      // ITS scheme, root-relative ITS authority
      (3L, "https://h.example/p/",
        "<head><base href='http://other.example/x/'></head>" +
          "<a href=\"/r\">d</a><a href=\"//m.example/z\">e</a>"),
      // a SECOND base element must be ignored (first wins)
      (4L, "http://h.example/p/",
        "<base href=\"/first/\"><base href=\"/second/\">" +
          "<a href=\"f\">f</a>"),
      // no base element -> page URL
      (5L, "http://h.example/p/page.html", "<a href=\"g\">g</a>")
    ).toDF("id", "page", "html")
    val got = WebClean.extractLinks(rows, "id", "html",
        baseUrlCol = Some("page"))
      .orderBy($"id", $"pos").select($"id", $"url")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "http://h.example/bd/sub/x.html"),
      (1L, "http://h.example/rooted"),
      (2L, "http://h.example/p/b2/y"),
      (3L, "http://other.example/r"),
      (3L, "http://m.example/z"),
      (4L, "http://h.example/first/f"),
      (5L, "http://h.example/p/g")))
  }

  // ---- parseHttpResponse / httpResponses ---------------------------------

  private def http(payload: Array[Byte]) =
    Seq(Tuple1(payload)).toDF("content")
      .select(WebClean.parseHttpResponse($"content").as("p"))
      .select($"p.status_code", $"p.http_version", $"p.headers",
        $"p.content_type", $"p.charset", $"p.body")
      .head()

  test("parseHttpResponse: status line, headers (first-colon split, " +
    "duplicates kept in order), content-type params, body bytes") {
    val payload = ("HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: http://example.com/a:b\r\n" +
      "Content-Type: Text/HTML; charset=\"UTF-8\"; boundary=x\r\n" +
      "Set-Cookie: a=1\r\n" +
      "Set-Cookie: b=2\r\n" +
      "\r\nhello").getBytes("ISO-8859-1")
    val r = http(payload)
    assert(r.getInt(0) == 301 && r.getString(1) == "1.1")
    val hdrs = r.getSeq[org.apache.spark.sql.Row](2)
      .map(h => (h.getString(0), h.getString(1)))
    assert(hdrs == Seq(
      ("location", "http://example.com/a:b"), // value keeps later colons
      ("content-type", "Text/HTML; charset=\"UTF-8\"; boundary=x"),
      ("set-cookie", "a=1"), ("set-cookie", "b=2")))
    assert(r.getString(3) == "text/html" && r.getString(4) == "utf-8")
    assert(new String(r.getAs[Array[Byte]](5), "US-ASCII") == "hello")
  }

  test("parseHttpResponse: no CRLFCRLF terminator degrades to " +
    "whole-payload body with null status/headers") {
    val r = http("HTTP/1.1 200 OK\r\nTruncated: yes".getBytes("ISO-8859-1"))
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    assert(new String(r.getAs[Array[Byte]](5), "ISO-8859-1")
      .startsWith("HTTP/1.1 200 OK"))
  }

  test("parseHttpResponse: non-HTTP head yields null status but parsed " +
    "headers; empty body allowed") {
    val r = http("ICY 200 OK\r\nX-H: v\r\n\r\n".getBytes("ISO-8859-1"))
    assert(r.isNullAt(0) && r.isNullAt(1))
    val hdrs = r.getSeq[org.apache.spark.sql.Row](2)
      .map(h => (h.getString(0), h.getString(1)))
    assert(hdrs == Seq(("x-h", "v")))
    assert(r.getAs[Array[Byte]](5).length == 0)
  }

  test("httpResponses: charset-aware body_text (latin-1, cp1252, utf-8 " +
    "default), binary body without content-type never decoded, and the " +
    "WET step fires only for HTML") {
    def payload(head: String, body: Array[Byte]) =
      head.getBytes("ISO-8859-1") ++ body
    val rows = Seq(
      (1L, payload("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=iso-8859-1\r\n\r\n",
        "café".getBytes("ISO-8859-1"))),
      (2L, payload("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=windows-1252\r\n\r\n",
        Array(0x93.toByte, 'q'.toByte, 0x94.toByte))), // cp1252 curly quotes
      (3L, payload("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
        "<p>café</p>".getBytes("UTF-8"))), // no charset -> utf-8
      (4L, payload("HTTP/1.1 200 OK\r\n\r\n",
        Array(0x89.toByte, 0xff.toByte, 0x00.toByte))), // binary, no CT
      // WHATWG prescan: no header charset, in-body meta declares it
      (5L, payload("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
        "<meta charset=\"iso-8859-1\"><p>café</p>"
          .getBytes("ISO-8859-1"))),
      (6L, payload("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
        ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
          "charset=windows-1252\"><p>“q”</p>")
          .getBytes("windows-1252"))),
      // the header charset WINS over a contradicting in-body meta
      (7L, payload("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n",
        "<meta charset=\"iso-8859-1\"><p>café</p>".getBytes("UTF-8")))
    ).toDF("id", "content")
    val got = WebClean.httpResponses(rows)
      .select($"id", $"body_text", $"wet_text").orderBy("id").collect()
    assert(got(0).getString(1) == "café" && got(0).isNullAt(2))
    assert(got(1).getString(1) == "“q”" && got(1).isNullAt(2))
    assert(got(2).getString(1) == "<p>café</p>")
    assert(got(2).getString(2) == "café") // the WET extraction
    assert(got(3).isNullAt(1) && got(3).isNullAt(2))
    assert(got(4).getString(2) == "café")   // sniffed latin-1
    assert(got(5).getString(2) == "“q”")    // sniffed cp1252, http-equiv
    assert(got(6).getString(2) == "café")   // header beats meta
  }

  test("httpResponses: legacy CJK charsets decode through the JVM kernel " +
    "under the WHATWG label remaps; unknown labels fall back to utf-8; " +
    "malformed bytes degrade to U+FFFD") {
    def payload(cs: String, body: Array[Byte]) =
      s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=$cs\r\n\r\n"
        .getBytes("ISO-8859-1") ++ body
    val rows = Seq(
      // shift_jis label decodes as windows-31j (the WHATWG mapping)
      (1L, payload("shift_jis", "こんにちは 日本語".getBytes("windows-31j"))),
      // ...including the CP932 extension rows plain Shift_JIS lacks
      (2L, payload("sjis", "①㈱".getBytes("windows-31j"))),
      (3L, payload("euc-jp", "日本語テスト".getBytes("EUC-JP"))),
      // euc-kr IS windows-949: 똠 is a UHC extension syllable outside
      // KS X 1001 that plain EUC-KR cannot encode
      (4L, payload("euc-kr", "한국어 똠".getBytes("x-windows-949"))),
      (5L, payload("ks_c_5601-1987", "한글".getBytes("x-windows-949"))),
      // gb2312 label gets the GBK superset decode: 镕 is GBK-only
      (6L, payload("gb2312", "中文 镕".getBytes("GBK"))),
      (7L, payload("gb18030", "中文𠀀".getBytes("GB18030"))), // 4-byte form
      (8L, payload("big5", "中文字".getBytes("Big5"))),
      // WHATWG big5 includes HKSCS (lead bytes plain Big5 leaves out)
      (9L, payload("big5", "香港嘅".getBytes("Big5-HKSCS"))),
      (10L, payload("koi8-r", "Привет".getBytes("KOI8-R"))),
      (11L, payload("windows-1251", "Привет".getBytes("windows-1251"))),
      (12L, payload("tis-620", "ไทย".getBytes("x-windows-874"))),
      (13L, payload("iso-2022-jp", "日本".getBytes("ISO-2022-JP"))),
      // unknown label: utf-8 body must survive via the WHATWG default
      (14L, payload("x-bogus", "fallback ✓".getBytes("UTF-8"))),
      // malformed under the declared charset: replacement, not error
      (15L, payload("shift_jis", Array(0x82.toByte))), // dangling lead
      (16L, payload("utf-16le", "hi".getBytes("UTF-16LE")))
    ).toDF("id", "content")
    val got = WebClean.httpResponses(rows)
      .select($"id", $"body_text").orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "こんにちは 日本語")
    assert(got(2L) == "①㈱")
    assert(got(3L) == "日本語テスト")
    assert(got(4L) == "한국어 똠")
    assert(got(5L) == "한글")
    assert(got(6L) == "中文 镕")
    assert(got(7L) == "中文𠀀")
    assert(got(8L) == "中文字")
    assert(got(9L) == "香港嘅")
    assert(got(10L) == "Привет")
    assert(got(11L) == "Привет")
    assert(got(12L) == "ไทย")
    assert(got(13L) == "日本")
    assert(got(14L) == "fallback ✓")
    assert(got(15L) == "�")
    assert(got(16L) == "hi")
  }

  test("Charsets.forLabel: WHATWG remaps, JVM passthrough, unknown null") {
    import graft.functions.Charsets
    assert(Charsets.forLabel("shift_jis").name == "windows-31j")
    assert(Charsets.forLabel("ms_kanji").name == "windows-31j")
    assert(Charsets.forLabel("gb2312").name == "GBK")
    assert(Charsets.forLabel("euc-kr").name == "x-windows-949")
    assert(Charsets.forLabel("big5").name == "Big5-HKSCS")
    assert(Charsets.forLabel("unicode").name == "UTF-16LE")
    // JVM passthrough for families the alias table does not list
    assert(Charsets.forLabel("iso-8859-2").name == "ISO-8859-2")
    assert(Charsets.forLabel("windows-1250").name == "windows-1250")
    // a REAL ascii label is a positive hit, not the negative marker
    assert(Charsets.forLabel("us-ascii") != null)
    // unknown and illegal labels yield null (twice: the cached path)
    assert(Charsets.forLabel("x-bogus") == null)
    assert(Charsets.forLabel("x-bogus") == null)
    assert(Charsets.forLabel("not a charset!") == null)
  }

  // ---- robotsRules / robotsAllowed ---------------------------------------

  test("robots: group selection (specific beats *), longest-match " +
    "precedence, allow wins ties, wildcards and $ anchor, empty " +
    "Disallow ignored, no-rule default allow") {
    val robots = Seq(
      // specific group blocks /private; * group would block everything
      ("a.com", "User-agent: megabot\nUser-agent: graftbot\n" +
        "Disallow: /private\n# c\nUser-agent: *\nDisallow: /"),
      // fallback to *: longest-match allow override + empty disallow
      ("b.com", "User-agent: *\nDisallow: /p\nAllow: /p/ok\nDisallow:"),
      // wildcard + $ anchor; tie-break allow-vs-disallow at equal length
      ("c.com", "User-agent: *\nDisallow: /x*y$\nAllow: /a/b\nDisallow: /a/c"),
      // no group for us at all (other agent only)
      ("d.com", "User-agent: serpbot\nDisallow: /"),
      // RFC §2.2.1 most-specific-agent: the exact token beats the
      // shorter prefix token; the prefix group's rules must NOT apply
      ("e2.com", "User-agent: graft\nDisallow: /p\n\n" +
        "User-agent: graftbot\nAllow: /\n\nUser-agent: *\nDisallow: /"),
      // selection via PREFIX alone ('graft' matches agent 'graftbot')
      ("f.com", "User-agent: graft\nDisallow: /p\n\nUser-agent: *\nAllow: /"),
      // a token LONGER than the agent is not a prefix — falls to *
      ("g.com", "User-agent: graftbotx\nDisallow: /\n\n" +
        "User-agent: *\nDisallow: /q"),
      // a matched group whose only directive is an empty Disallow
      // claims the agent: default allow, NEVER the blocking * group
      ("h.com", "User-agent: graftbot\nDisallow:\n\nUser-agent: *\nDisallow: /")
    ).toDF("site", "txt")
    val rules = WebClean.robotsRules(robots, "site", "txt", "graftbot")
    val urls = Seq(
      (1L, "http://a.com/private/x", "a.com"),  // specific disallow
      (2L, "http://a.com/public", "a.com"),     // specific group, no match
      (3L, "http://b.com/p/no", "b.com"),       // /p disallow
      (4L, "http://b.com/p/ok/1", "b.com"),     // allow override (longer)
      (5L, "http://c.com/xAAy", "c.com"),       // * + $ anchor hits
      (6L, "http://c.com/xAAyz", "c.com"),      // $ anchor misses
      (7L, "http://d.com/anything", "d.com"),   // no applicable group
      (8L, "http://c.com/a/b", "c.com"),        // allow matches, disallow doesn't
      (9L, "http://e2.com/p/x", "e2.com"),      // exact beats prefix: allowed
      (10L, "http://f.com/p/x", "f.com"),       // prefix group's disallow
      (11L, "http://f.com/ok", "f.com"),        // prefix group, no match
      (12L, "http://g.com/q/1", "g.com"),       // longer token no match -> *
      (13L, "http://h.com/anything", "h.com")   // empty-Disallow claim
    ).toDF("doc_id", "url", "site")
    val got = WebClean.robotsAllowed(urls, rules, "doc_id", "url", "site")
      .select($"doc_id", $"allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true,
      5L -> false, 6L -> true, 7L -> true, 8L -> true, 9L -> true,
      10L -> false, 11L -> true, 12L -> false, 13L -> true))
    // the compiled patterns escape metachars: '.' in a rule is literal
    val dot = WebClean.robotsRules(
      Seq(("e.com", "User-agent: *\nDisallow: /a.b")).toDF("site", "txt"),
      "site", "txt", "graftbot")
    val v = WebClean.robotsAllowed(
      Seq((1L, "http://e.com/aXb", "e.com"),
          (2L, "http://e.com/a.b", "e.com")).toDF("doc_id", "url", "site"),
      dot, "doc_id", "url", "site")
      .select($"doc_id", $"allowed").as[(Long, Boolean)].collect().toMap
    assert(v == Map(1L -> true, 2L -> false))
  }

  test("robotsDirectives: global sitemaps, selected-group crawl-delay " +
    "(prefix precedence), minimum of applicable values, try_cast " +
    "garbage to null") {
    val robots = Seq(
      // sitemaps are global; delay in the * group applies to us
      ("a.com", "Sitemap: https://a.com/s2.xml\nUser-agent: *\n" +
        "Disallow: /x\nCrawl-delay: 4\nSitemap: https://a.com/s1.xml"),
      // the SELECTED (exact) group's delay wins over the prefix group's
      ("b.com", "User-agent: graft\nCrawl-delay: 9\n\n" +
        "User-agent: graftbot\nCrawl-delay: 2.5\n\nUser-agent: *\n" +
        "Crawl-delay: 1"),
      // garbage delay -> null, not an ANSI cast error
      ("c.com", "User-agent: *\nCrawl-delay: soon"),
      // nothing at all
      ("d.com", "User-agent: *\nDisallow:")
    ).toDF("site", "txt")
    val got = WebClean.robotsDirectives(robots, "site", "txt", "graftbot")
      .orderBy("site")
      .as[(String, Option[Double], Int, Option[String])].collect().toSeq
    assert(got == Seq(
      ("a.com", Some(4.0), 2, Some("https://a.com/s1.xml")),
      ("b.com", Some(2.5), 0, None),
      ("c.com", None, 0, None),
      ("d.com", None, 0, None)))
  }

  test("metaRobots: multi-tag union, unquoted values, both attribute " +
    "orders, none alias, non-robots decoy never matches") {
    val pages = Seq(
      // split directives across two tags: both must surface
      (1L, "<meta name=\"robots\" content=\"noindex\">" +
        "<meta name=\"robots\" content=\"nofollow\">"),
      // unquoted name and content values
      (2L, "<meta name=robots content=noindex>"),
      // unquoted comma-list, content-first attribute order
      (3L, "<meta content=noindex,nofollow name=robots>"),
      // decoy metas only: viewport + a robots-valued OTHER name
      (4L, "<meta name=\"viewport\" content=\"noindex\">" +
        "<meta name=\"author\" content=\"nofollow\">"),
      // none alias, uppercase, single quotes
      (5L, "<META NAME='ROBOTS' CONTENT='NONE'>"),
      // explicit index,follow stays all-false
      (6L, "<meta name=robots content=\"index, follow\">"),
      // data-* attribute decoys: without the whitespace anchor these
      // match as name=/content= and plant false directives
      (7L, "<meta data-name=\"robots\" data-content=\"noindex\">" +
        "<meta data-content=\"nofollow\" data-name=\"robots\">")
    ).toDF("id", "html")
    val got = pages.select($"id", WebClean.metaRobots($"html").as("m"))
      .select($"id", $"m.noindex", $"m.nofollow")
      .as[(Long, Boolean, Boolean)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    assert(got == Map(1L -> (true, true), 2L -> (true, false),
      3L -> (true, true), 4L -> (false, false), 5L -> (true, true),
      6L -> (false, false), 7L -> (false, false)))
  }

  test("mainContent: link-dense nav/footer and short blocks drop, long " +
    "low-density article blocks survive in document order") {
    val long1 = "This is the first long paragraph of genuine article " +
      "content that easily clears the minimum length threshold."
    val long2 = "A second paragraph of real content follows with more " +
      "than enough characters to be kept as well."
    val html =
      "<html><head><title>T</title><style>p{}</style></head><body>" +
        "<nav><ul><li><a href=\"/\">Home</a></li>" +
        "<li><a href=\"/about\">About</a></li></ul></nav>" +
        s"<article><p>$long1</p><p>$long2</p></article>" +
        // long enough but majority-anchor -> dropped by link density
        "<div>Share or forward this: " +
        "<a href=\"/fb\">The Facebook page</a> " +
        "<a href=\"/tw\">The Twitter feed</a> " +
        "<a href=\"/nl\">The Email newsletter</a></div>" +
        "<footer><a href=\"/t\">Terms of service</a> " +
        "<a href=\"/p\">Privacy policy</a></footer></body></html>"
    val got = WebClean.mainContent(
        Seq((1L, html)).toDF("id", "html"), "id", "html")
      .select($"n_blocks", $"n_good", $"main_text")
      .as[(Int, Int, String)].collect().head
    // nonempty blocks: title, Home, About, long1, long2, share, footer
    assert(got._1 == 7)
    assert(got._2 == 2)
    assert(got._3 == long1 + "\n" + long2)
    // a block kept despite containing SOME anchor text (low density)
    val mixed = "<p>An otherwise long and healthy paragraph of article " +
      "text that happens to contain one small <a href=\"/x\">link</a> " +
      "inside it and must still be kept.</p>"
    val g2 = WebClean.mainContent(
        Seq((1L, mixed)).toDF("id", "html"), "id", "html")
      .select($"n_good").as[Int].collect().head
    assert(g2 == 1)
    // entities decode, script contents never leak
    val ent = "<p>Tom &amp; Jerry stay friends for a very long time " +
      "indeed &lt;3 and this block is long enough.</p>" +
      "<script>var x = 'this long script body must never appear';</script>"
    val g3 = WebClean.mainContent(
        Seq((1L, ent)).toDF("id", "html"), "id", "html")
      .select($"main_text").as[String].collect().head
    assert(g3.contains("Tom & Jerry") && g3.contains("<3"))
    assert(!g3.contains("script body"))
  }

  test("xRobotsTag: multi-header union, agent scoping, the " +
    "unavailable_after colon trap, decoy header names") {
    val mk = (vs: Seq[(String, String)]) => vs.map { case (n, v) => (n, v) }
    val rows = Seq(
      (1L, Seq("x-robots-tag" -> "noindex")),
      (2L, Seq("x-robots-tag" -> "noarchive, NOFOLLOW")),
      (3L, Seq("x-robots-tag" -> "graftbot: noindex")),   // scoped to us
      (4L, Seq("x-robots-tag" -> "otherbot: noindex")),   // not us
      (5L, Seq("x-robots-tag" -> "unavailable_after: 2026-01-01")),
      (6L, Seq("x-robots-tag" -> "noindex",
               "x-robots-tag" -> "nofollow")),            // union
      (7L, Seq("x-powered-by" -> "noindex")),             // decoy name
      (8L, Seq("x-robots-tag" -> "none"))
    ).map { case (id, hs) => (id, mk(hs)) }.toDF("id", "headers")
    val got = rows.select($"id",
        WebClean.xRobotsTag($"headers".cast(
          "array<struct<name:string,value:string>>"), agent = "graftbot")
          .as("x"))
      .select($"id", $"x.noindex", $"x.nofollow")
      .as[(Long, Boolean, Boolean)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    assert(got == Map(1L -> (true, false), 2L -> (false, true),
      3L -> (true, false), 4L -> (false, false), 5L -> (false, false),
      6L -> (true, true), 7L -> (false, false), 8L -> (true, true)))
  }

  test("blocklistScan: signals, translate case folding, null text") {
    val docs = Seq((1L, "Spark IN the wINdow"), (2L, "nothing here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = WebClean.blocklistScan(docs, "doc_id", "text",
      Seq("spark", "par", "ark", "in", "window", "the"))
      .orderBy("doc_id").collect()
    // doc 1 lowered "spark in the window": spark 1, par 1 (inside
    // spark), ark 1, in 2 (standalone + inside window), window 1,
    // the 1 -> 7 hits over 6 terms
    assert(got(0).getLong(1) == 7L && got(0).getInt(2) == 6 &&
      got(0).getBoolean(3))
    // doc 2 "nothing here": only "in" (inside nothing) -> 1 hit, 1 term
    assert(got(1).getLong(1) == 1L && got(1).getInt(2) == 1 &&
      got(1).getBoolean(3))
    assert(got(2).isNullAt(1))
  }

  // ---- sitemapEntries / sitemapFrontier ----------------------------------

  test("sitemapEntries: urlset fields, loc trim + entity decode, loc-less " +
    "decoy holds pos, garbage priority nulls, container tags never match") {
    val xml = "<?xml version=\"1.0\"?>" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>" +
      "<lastmod>2025-06-15</lastmod><changefreq>daily</changefreq>" +
      "<priority>0.8</priority></url>" +
      "<url><lastmod>2020-01-01</lastmod></url>" + // decoy: no loc
      "<url><loc>https://a.com/q&#47;r</loc><priority>bogus</priority></url>" +
      "</urlset>"
    val got = WebClean.sitemapEntries(Seq((1L, xml)).toDF("id", "xml"), "xml")
      .select($"pos", $"kind", $"loc", $"lastmod", $"changefreq", $"priority")
      .orderBy("pos").collect()
    assert(got.length == 2)
    assert(got(0).getInt(0) == 0 && got(0).getString(1) == "url")
    assert(got(0).getString(2) == "https://a.com/p?x=1&y=2") // trimmed+decoded
    assert(got(0).getString(3) == "2025-06-15" &&
      got(0).getString(4) == "daily" && got(0).getDouble(5) == 0.8)
    assert(got(1).getInt(0) == 2) // the decoy held pos 1
    assert(got(1).getString(2) == "https://a.com/q/r") // numeric ref
    assert(got(1).isNullAt(3) && got(1).isNullAt(4) && got(1).isNullAt(5))
  }

  test("sitemapEntries: sitemapindex blocks, mixed-kind doc orders urls " +
    "before sitemap blocks") {
    val xml = "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>" +
      "<lastmod>2025-01-02</lastmod></sitemap>" +
      "<sitemap><loc>https://a.com/s2.xml</loc></sitemap></sitemapindex>"
    val got = WebClean.sitemapEntries(Seq((1L, xml)).toDF("id", "xml"), "xml")
      .select($"pos", $"kind", $"loc", $"lastmod").orderBy("pos").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((0, "sitemap", "https://a.com/s1.xml"),
        (1, "sitemap", "https://a.com/s2.xml")))
    assert(got(0).getString(3) == "2025-01-02" && got(1).isNullAt(3))
    // a (protocol-invalid) mixed doc: url blocks take the leading pos
    val mixed = "<x><url><loc>https://a.com/p</loc></url>" +
      "<sitemap><loc>https://a.com/s.xml</loc></sitemap></x>"
    val m = WebClean.sitemapEntries(Seq((1L, mixed)).toDF("id", "xml"), "xml")
      .select($"pos", $"kind").orderBy("pos").collect()
    assert(m.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((0, "url"), (1, "sitemap")))
  }

  test("sitemapFrontier: depth-0 urlsets, one-level index recursion over " +
    "fetched children only, index-typed child ignored") {
    val fetched = Seq(
      ("https://h.com/root.xml",
        "<sitemapindex>" +
          "<sitemap><loc>https://h.com/a.xml</loc></sitemap>" +
          "<sitemap><loc>https://h.com/unfetched.xml</loc></sitemap>" +
          "<sitemap><loc>https://h.com/idx2.xml</loc></sitemap>" +
          "</sitemapindex>"),
      ("https://h.com/a.xml",
        "<urlset><url><loc>https://h.com/p1</loc></url>" +
          "<url><loc>https://h.com/p2</loc></url></urlset>"),
      // an index referenced BY an index: its sitemap-kind entries must
      // not recurse further (the one-level sitemaps.org bound)
      ("https://h.com/idx2.xml",
        "<sitemapindex><sitemap><loc>https://h.com/a.xml</loc>" +
          "</sitemap></sitemapindex>")
    ).toDF("sitemap_url", "xml")
    val got = WebClean.sitemapFrontier(fetched, "sitemap_url", "xml")
      .select($"root_sitemap", $"depth", $"url").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    // idx2 contributes depth-1 rows AS a fetched top-level doc; what
    // must NOT appear is a depth-2 hop root.xml -> idx2 -> a.xml (no
    // root-rooted row via idx2 beyond the ones root reaches directly),
    // and the unfetched child yields nothing
    assert(got == Set(
      ("https://h.com/a.xml", 0, "https://h.com/p1"),
      ("https://h.com/a.xml", 0, "https://h.com/p2"),
      ("https://h.com/root.xml", 1, "https://h.com/p1"),
      ("https://h.com/root.xml", 1, "https://h.com/p2"),
      ("https://h.com/idx2.xml", 1, "https://h.com/p1"),
      ("https://h.com/idx2.xml", 1, "https://h.com/p2")))
  }

  test("sitemapFrontier composes with canonicalizeUrl + robotsAllowed " +
    "into the admission-filtered frontier") {
    val fetched = Seq(
      ("https://h.com/sm.xml",
        "<urlset><url><loc>HTTPS://H.com/Private/x#frag</loc></url>" +
          "<url><loc>https://h.com/ok?b=2&amp;a=1</loc></url></urlset>")
    ).toDF("sitemap_url", "xml")
    val frontier = WebClean.sitemapFrontier(fetched, "sitemap_url", "xml")
      .withColumn("url_c", WebClean.canonicalizeUrl($"url"))
      .withColumn("site",
        WebClean.urlSite(WebClean.urlHost($"url_c")))
    val rules = WebClean.robotsRules(
      Seq(("h.com", "User-agent: *\nDisallow: /Private")).toDF("site", "txt"),
      "site", "txt")
    val got = WebClean.robotsAllowed(frontier, rules, "url_c", "url_c", "site")
      .select($"url_c", $"allowed").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(got("https://h.com/Private/x") == false) // canon keeps path case
    assert(got.keys.exists(_.startsWith("https://h.com/ok")) &&
      got.filter(_._1.startsWith("https://h.com/ok")).values.head)
  }
}
