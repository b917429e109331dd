package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus cleaning: the pre-filter stages a crawl-derived training
  * pipeline runs BEFORE the quality/dedup operators — HTML → text
  * extraction (the WARC→WET step), URL parsing for domain-level
  * policies, and blocklist filtering (the C4 §2.2 "bad words" drop).
  *
  * Everything is composed from codegen'd built-in expressions with
  * RE2-safe regexes (no backrefs, no lookaround), so each stage is a
  * narrow zero-shuffle projection at any corpus size AND the DuckDB
  * oracle replays the identical pattern chain.
  */
object WebClean {

  /** HTML → visible text, the trafilatura-lite extraction chain:
    *  1. script / style containers removed WITH their contents
    *     (non-greedy spans, `(?is)` so they cross lines and match any
    *     tag casing);
    *  2. comments removed;
    *  3. every remaining tag becomes a space (block boundaries must
    *     not glue words together);
    *  4. character references decoded ([[graft.functions
    *     .HtmlEntities]]: numeric `&#D;`/`&#xH;` with the HTML5
    *     value rules, the HTML4 named set + apos; ONE left-to-right
    *     pass, so literal `&amp;lt;` correctly becomes `&lt;` text
    *     instead of `<` — `&#8217;`-class references are ubiquitous
    *     in CMS output and used to survive into wet_text, dedup keys,
    *     and n-gram features);
    *  5. whitespace runs collapsed to single spaces, ends trimmed
    *     (explicit class: Java \s and RE2 \s disagree on \x0b) —
    *     AFTER entity decode, so `&#10;`-style refs collapse too; the
    *     class includes U+00A0, so `&nbsp;`/`&#160;` (and raw NBSP
    *     bytes) normalize to plain spaces like every WET pipeline
    *     emits (the oracle's literal `'&nbsp;' -> ' '` replace models
    *     the same decode→collapse composition).
    *
    * One projection, zero shuffles; at 100 TB this fuses into the
    * ingest scan. RE2-safe `regexp_replace` steps replay verbatim in
    * the oracle; the entity pass replays as literal `replace`/chr()
    * of each PLANTED reference (the corpus carries no ambient `&`). */
  def extractHtmlText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val entities = graft.plans.WebTextExpressions.htmlEntityDecode(noTags)
    trim(regexp_replace(entities, "[ \\t\\n\\x0b\\f\\r\\xA0]+", " "))
  }

  /** HTTP response split for WARC `response` records. A crawl WARC's
    * `response` content is NOT the page: it is `status line CRLF
    * header lines CRLF CRLF body`, and every WARC→WET pipeline first
    * splits them, reads Content-Type/charset, and drops non-HTML
    * before text extraction (reference surface: a CC response record
    * per ISO 28500 §6.3 carries the full HTTP message). This is that
    * split as ONE codegen projection over the binary payload — no
    * UDF, no shuffle, fuses into the ingest scan at any corpus size.
    *
    * Mechanics: the payload is viewed through ISO-8859-1 (bytes map
    * 1:1 to chars, so char positions ARE byte offsets); the header
    * block is scanned on the string view and the body is sliced from
    * the RAW bytes — bodies are routinely binary and must not pass
    * through a lossy decode.
    *
    * Returns a struct:
    *  - `status_code` INT / `http_version` STRING — null unless the
    *    first line parses as `HTTP/x.y NNN`;
    *  - `headers` ARRAY<STRUCT<name,value>> — names lowercased,
    *    values trimmed after the FIRST colon (later colons belong to
    *    the value); an ARRAY, not a map, because duplicate header
    *    names are legal HTTP (Set-Cookie et al.);
    *  - `content_type` STRING — lowercased media type before any `;`
    *    parameter, null when the header is absent;
    *  - `charset` STRING — lowercased `charset=` parameter, null when
    *    absent;
    *  - `body` BINARY — bytes after the first CRLFCRLF; a payload
    *    with NO header terminator yields null status/headers and the
    *    WHOLE payload as body (defensive: truncated records should
    *    degrade to "unparsed bytes", not vanish). */
  def parseHttpResponse(content: Column): Column = {
    val s = decode(content, "ISO-8859-1")
    val sep = locate("\r\n\r\n", s) // 1-based; 0 when absent
    val head = when(sep > 0, s.substr(lit(1), sep - 1))
    val statusLine = substring_index(head, "\r\n", 1)
    val isHttp = statusLine.rlike("^HTTP/[0-9]+\\.[0-9]+ [0-9]{3}")
    val httpVersion =
      when(isHttp, regexp_extract(statusLine, "^HTTP/([0-9]+\\.[0-9]+)", 1))
    val statusCode = when(isHttp,
      regexp_extract(statusLine, "^HTTP/[0-9]+\\.[0-9]+ ([0-9]{3})", 1)
        .cast("int"))
    val lines = split(head, "\r\n")
    val hdrLines = filter(
      slice(lines, lit(2), greatest(size(lines) - 1, lit(0))),
      l => instr(l, ":") > 0)
    val headers = transform(hdrLines, l => struct(
      lower(trim(substring_index(l, ":", 1))).as("name"),
      trim(l.substr(instr(l, ":") + 1, length(l))).as("value")))
    val ctRaw = get(filter(headers,
      h => h.getField("name") === "content-type"), lit(0)).getField("value")
    val mediaType = lower(trim(substring_index(ctRaw, ";", 1)))
    val contentType = when(mediaType =!= "", mediaType)
    val csRaw =
      lower(regexp_extract(ctRaw, "(?i)charset=\"?([A-Za-z0-9_.:-]+)", 1))
    val charset = when(csRaw =!= "", csRaw)
    val body = when(sep > 0,
        content.substr(sep + 4, length(content) - sep - lit(3)))
      .otherwise(content)
    struct(statusCode.as("status_code"), httpVersion.as("http_version"),
      headers.as("headers"), contentType.as("content_type"),
      charset.as("charset"), body.as("body"))
  }

  /** Charset-aware text decode of an HTTP body — only for declared
    * text-bearing media types (binary bodies stay null; a CASE branch
    * is evaluated per-row only when taken, so image bytes never reach
    * a decoder). Charset precedence is the WHATWG order real pages
    * require: the TRANSPORT-layer declaration (Content-Type charset
    * param) wins; absent that, the in-body `<meta charset=…>` /
    * `<meta http-equiv … content="…charset=…">` declaration is
    * SNIFFED from the first 1024 bytes (the WHATWG prescan window,
    * viewed through latin-1 so bytes map 1:1 — one regex covers both
    * meta forms because both carry a `charset=` token); absent both,
    * UTF-8. Decode routing: the three charsets that dominate crawl
    * traffic stay built-in codegen fast paths — UTF-8, latin-1 (also
    * the stand-in for us-ascii — its byte-superset, so a lying
    * ascii-declared page degrades instead of erroring), and
    * windows-1252, which Spark 4's 7-charset `decode` whitelist lacks
    * and is therefore expressed as its exact definition: a latin-1
    * decode plus the 27-entry C1→glyph translate ([[graft.functions
    * .Normalize.cp1252Pairs]], the entire difference between the two
    * charsets) applied in the decode direction. EVERY other declared
    * label — Shift_JIS, EUC-JP/KR, GBK, Big5, KOI8, the windows-125x
    * / iso-8859-x families — routes through the JVM-charset kernel
    * ([[graft.plans.CharsetDecode]]) under the WHATWG label remaps
    * (`shift_jis`→windows-31j, `gb2312`→GBK, `euc-kr`→windows-949,
    * `big5`→Big5-HKSCS — the supersets browsers actually decode
    * with); a label neither the alias table nor the JVM knows yields
    * null there and coalesces to UTF-8, the WHATWG default —
    * previously those pages ALL fell to utf-8 and mojibaked, which
    * poisoned lang-ID and quality signals downstream. One codegen
    * projection either way; the CASE evaluates the kernel only for
    * rows that reach its branch. */
  def httpBodyText(contentType: Column, charset: Column,
                   body: Column): Column = {
    val prescan = decode(substring(body, 1, 1024), "ISO-8859-1")
    val sniffedRaw = lower(regexp_extract(prescan,
      "(?i)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)", 1))
    val sniffed = when(sniffedRaw =!= "", sniffedRaw)
    val textual = contentType.startsWith("text/") ||
      contentType.isin("application/xhtml+xml", "application/json",
        "application/xml")
    val cs = lower(coalesce(charset, sniffed, lit("utf-8")))
    val c1 = graft.functions.Normalize.cp1252Pairs.map(_._2).mkString
    val glyphs = graft.functions.Normalize.cp1252Pairs.map(_._1).mkString
    when(textual,
      when(cs.isin("iso-8859-1", "iso8859-1", "latin-1", "latin1",
          "us-ascii", "ascii"), decode(body, "ISO-8859-1"))
        .when(cs.isin("windows-1252", "cp1252"),
          translate(decode(body, "ISO-8859-1"), c1, glyphs))
        .when(cs.isin("utf-8", "utf8"), decode(body, "UTF-8"))
        .otherwise(coalesce(
          graft.plans.WebTextExpressions.charsetDecode(body, cs),
          decode(body, "UTF-8"))))
  }

  /** The WARC→WET projection over a [[graft.sources.WarcSource]]
    * frame: HTTP split + charset-aware `body_text` + `wet_text` (the
    * [[extractHtmlText]] chain, HTML media types only — the
    * "drop non-HTML before extraction" step every real pipeline
    * runs). Adds columns; zero shuffles. */
  def httpResponses(df: DataFrame,
                    contentCol: String = "content"): DataFrame = {
    val p = parseHttpResponse(col(contentCol))
    df
      .withColumn("status_code", p.getField("status_code"))
      .withColumn("http_version", p.getField("http_version"))
      .withColumn("headers", p.getField("headers"))
      .withColumn("content_type", p.getField("content_type"))
      .withColumn("charset", p.getField("charset"))
      .withColumn("body", p.getField("body"))
      .withColumn("body_text",
        httpBodyText(col("content_type"), col("charset"), col("body")))
      .withColumn("wet_text",
        when(col("content_type").isin("text/html", "application/xhtml+xml"),
          extractHtmlText(col("body_text"))))
  }

  /** MAIN-CONTENT extraction (jusText-lite, [[graft.functions.WebText
    * .mainContent]]): block-segmented length/link-density
    * classification between the WET text step and the quality battery
    * — nav/footer/menu blocks drop by layout signals the line-level
    * C4 rules and whole-page extraction cannot see. Composes after
    * [[httpResponses]] on the raw HTML (`body_text` for HTML media
    * types), BEFORE [[extractHtmlText]]-style whole-page flattening.
    * Returns (id, n_blocks, n_good, main_text); one codegen kernel
    * projection, zero shuffles. */
  def mainContent(docs: DataFrame, idCol: String, htmlCol: String,
                  minChars: Int = 25): DataFrame =
    docs
      .select(col(idCol),
        graft.plans.WebTextExpressions
          .mainContent(col(htmlCol), minChars).as("__mc"))
      .select(col(idCol), col("__mc.n_blocks").as("n_blocks"),
        col("__mc.n_good").as("n_good"),
        col("__mc.main_text").as("main_text"))

  /** Case-insensitive whole-word blocklist hits: the count of
    * occurrences of any listed word (word-boundary anchored, so
    * "class" never matches a blocklisted "ass"). The alternation of
    * literals compiles to a DFA under RE2 and stays linear under
    * Java's engine — at a realistic ~400-word list this is still one
    * scan-fused `regexp_count`. */
  def blocklistHits(c: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "blocklist must be non-empty")
    require(words.forall(_.matches("[A-Za-z0-9]+")),
      "blocklist words must be alphanumeric literals (they are spliced into a regex)")
    graft.plans.RegexCountExpression.regexCount(c,
      "(?i)\\b(" + words.mkString("|") + ")\\b")
  }

  /** Per-doc blocklist signals: hit count + keep verdict. The filter
    * form is `.filter(col("kept"))`; this returns every doc with its
    * signals so thresholds can be tuned from the measurement (the
    * same signals-then-verdict shape as the Gopher rule battery). */
  def blocklistSignals(docs: DataFrame, idCol: String, textCol: String,
                       words: Seq[String]): DataFrame =
    docs.select(col(idCol),
      blocklistHits(col(textCol), words).as("hits"))
      .withColumn("kept", col("hits") === 0)

  /** Substring blocklist scan at TERM-LIST scale: one Aho-Corasick
    * pass per document whatever the list size
    * ([[graft.functions.AcAutomaton]] — real curation lists carry
    * hundreds of terms, where [[blocklistHits]]'s regex alternation
    * degrades linearly and becomes the scan bottleneck). Counts every
    * occurrence of every term, overlapping and nested included
    * (substring semantics — the whole-word policy stays with
    * [[blocklistHits]]); case folding is the engine-exact ASCII
    * `translate`, applied to the INPUT (terms must arrive lowercase).
    *
    * Returns (id, hits_total, n_terms_hit, flagged) — one codegen
    * projection, zero shuffles. */
  def blocklistScan(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String]): DataFrame = {
    require(terms.forall(t => t.nonEmpty && t == t.toLowerCase),
      "blocklist terms must be non-empty lowercase literals")
    val ac = new graft.functions.AcAutomaton(terms.toArray)
    val lowered = translate(col(textCol),
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
    docs
      .select(col(idCol),
        graft.plans.AcExpression.acScan(lowered, ac).as("__c"))
      .select(col(idCol),
        aggregate(col("__c"), lit(0L), (a, x) => a + x).as("hits_total"),
        size(filter(col("__c"), x => x > 0L)).as("n_terms_hit"))
      .withColumn("flagged", col("hits_total") > 0L)
  }

  /** The anchor-href pattern [[extractLinks]] and its oracles share:
    * the tag name is ANCHORED (`<a` must be followed by whitespace —
    * `<area>`, `<article href=...>`, `<audio>` must not match) and
    * `href` must be preceded by whitespace (the greedy `[^>]*\s`
    * guarantees the char before `href` is a space char, so
    * `data-href="..."` never matches — RE2 has no lookbehind, this is
    * the lookbehind-free equivalent); values are double-quoted,
    * single-quoted, or UNQUOTED (run to the next whitespace / `>`). */
  private[graft] val hrefPattern: String =
    "(?i)<a\\s(?:[^>]*\\s)?href\\s*=\\s*" +
      "(\"[^\"]*\"|'[^']*'|[^\\s>\"'][^\\s>]*)"

  /** The `<base href>` element pattern — same tag-anchor and value
    * forms as [[hrefPattern]]; only the FIRST match counts (the HTML
    * spec's rule for multiple base elements). */
  private[graft] val baseHrefPattern: String =
    "(?i)<base\\s(?:[^>]*\\s)?href\\s*=\\s*" +
      "(\"[^\"]*\"|'[^']*'|[^\\s>\"'][^\\s>]*)"

  /** RFC 3986 §5 reference resolution as a zero-shuffle Column chain —
    * the step that turns raw anchor hrefs into link-graph edges
    * (relative hrefs are the MAJORITY of real anchors; dropping them
    * wholesale mis-shapes any real link graph):
    *
    *  - absolute references (any `scheme:` prefix) pass through;
    *  - `//authority/...` takes the base scheme;
    *  - `/rooted` takes the base scheme://authority;
    *  - `?query` replaces the base query (base path kept);
    *  - empty and `#fragment`-only references are SELF-links — null
    *    here, since a link graph wants no self-edge from them;
    *  - anything else merges with the base path's directory
    *    (everything through the last `/`);
    *  - dot segments are then normalized on the path part (`/./` and
    *    `/seg/../` collapse, leading `/../` clamps to root) to a
    *    bounded depth of 4 — RFC remove_dot_segments is a loop, and a
    *    fixed unrolling keeps the chain replayable in any SQL engine;
    *    residues deeper than 4 levels survive (documented bound, not
    *    silent truncation: they stay visibly `/../` in the output).
    *
    * Null when `base` is null / not absolute-hierarchical (no
    * `scheme://`) and the reference is not itself absolute.
    *
    * SHAPE: a DataFrame transform binding each derivation step
    * (scheme/authority/merged/path/normalized path) to an
    * intermediate column, NOT one nested Column expression — the
    * steps reference each other several times, and nesting would copy
    * the whole upstream regex tree at every reference (the measured
    * cost: a 6× wall regression on q_domain_rank before the
    * restructure; Catalyst's CollapseProject keeps multi-use
    * non-cheap aliases bound, so each step evaluates once per row).
    * Still one zero-shuffle projection pipeline. */
  def resolveUrl(df: DataFrame, baseCol: String, hrefCol: String,
                 outCol: String): DataFrame = {
    val base = col(baseCol)
    val h = trim(col(hrefCol))
    val d1 = df
      .withColumn("__ru_sch",
        regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
      .withColumn("__ru_auth",
        regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
      .withColumn("__ru_bpath",
        regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
    val scheme = col("__ru_sch")
    val auth = col("__ru_auth")
    val bpath = col("__ru_bpath")
    val pathOrRoot = when(bpath === "", lit("/")).otherwise(bpath)
    val baseDir = when(bpath === "", lit("/"))
      .otherwise(regexp_replace(bpath, "[^/]*$", ""))
    val d2 = d1.withColumn("__ru_merged",
      when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), h)
        .when(scheme === "", lit(null))
        .when(h.startsWith("//"), concat(scheme, lit(":"), h))
        .when(h.startsWith("/"), concat(scheme, lit("://"), auth, h))
        .when(h.startsWith("?"), concat(scheme, lit("://"), auth,
          pathOrRoot, h))
        .when(h === "" || h.startsWith("#"), lit(null))
        .otherwise(concat(scheme, lit("://"), auth, baseDir, h)))
    val merged = col("__ru_merged")
    // dot-segment normalization on the PATH substring only: the
    // query/fragment may legally contain '/..' and must pass through,
    // and the authority must be out of reach (a leading '/../' next
    // to 'scheme://host' would otherwise let the up-segment regex eat
    // the host). Non-hierarchical absolute refs (mailto:) untouched.
    val d3 = d2
      .withColumn("__ru_pre", regexp_extract(merged, "^([^?#]*)", 1))
      .withColumn("__ru_hier",
        regexp_extract(merged, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val pre = col("__ru_pre")
    val hier = col("__ru_hier")
    val d4 = d3
      .withColumn("__ru_post",
        substr(merged, length(pre) + lit(1), length(merged)))
      .withColumn("__ru_path",
        substr(pre, length(hier) + lit(1), length(pre)))
    // the normalization passes are one LINEAR chain (each replace
    // feeds the next exactly once), safe to nest
    val noDot1 = (1 to 3).foldLeft(col("__ru_path"))((p, _) =>
      regexp_replace(p, "/\\./", "/"))
    val noDot = regexp_replace(noDot1, "/\\.$", "/")
    val noUp = (1 to 4).foldLeft(noDot)((p, _) =>
      regexp_replace(regexp_replace(regexp_replace(p,
        "^/\\.\\./", "/"), "/[^/]+/\\.\\./", "/"), "/[^/]+/\\.\\.$", "/"))
    val normPath = regexp_replace(noUp, "^/\\.\\.$", "/")
    d4
      .withColumn(outCol,
        when(merged.isNull, lit(null))
          .when(hier === "", merged)
          .otherwise(concat(hier, normPath, col("__ru_post"))))
      .drop("__ru_sch", "__ru_auth", "__ru_bpath", "__ru_merged",
        "__ru_pre", "__ru_hier", "__ru_post", "__ru_path")
  }

  /** Anchor-href extraction — the LINK-GRAPH input step of a crawl
    * pipeline (what Common Crawl publishes as WAT link records, and
    * what [[graft.operators.Graph.pageRank]]/hits consume after the
    * host/site rollup): every `<a ... href=...>` target in document
    * order — attribute name case-insensitive, both quote styles plus
    * unquoted values, tag-anchored so `<area>`/`<article>` and
    * `data-href` never produce false rows ([[hrefPattern]]). With
    * `baseUrlCol` set, each href is RESOLVED against the page URL
    * ([[resolveUrl]]), so relative links — the majority of real
    * anchors — become edges too; without it only absolute targets
    * survive. `pos` is the anchor's 0-based index among ALL extracted
    * hrefs (a dropped fragment-only link still holds its position);
    * only http(s) targets survive the final filter. One RE2-safe
    * `regexp_extract_all` + a narrow explode; zero shuffles, fuses
    * into the scan at any corpus size.
    *
    * A page's FIRST `<base href>` element overrides the page URL as
    * the resolution base (the HTML contract real crawl pages rely
    * on), itself resolved against the page URL first — base hrefs may
    * be relative. Derived per PAGE, before the anchor explode, so the
    * base resolution costs once per document, not per link. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String,
                   baseUrlCol: Option[String] = None,
                   carryCols: Seq[String] = Nil): DataFrame = {
    // carryCols ride the extraction unchanged (one value per page,
    // repeated per link) so a caller that needs page-level columns
    // next to the links — the domain-rank site edges — gets them in
    // the SAME pass instead of re-scanning the corpus and joining on
    // the id (a corpus-sized shuffle at 100 TB)
    val carry = carryCols.map(col)
    val basePrep: DataFrame = baseUrlCol match {
      case Some(bc) =>
        val bh0 = regexp_extract(col(htmlCol), baseHrefPattern, 1)
        val bh = when(bh0.rlike("^[\"']"),
          bh0.substr(lit(2), length(bh0) - 2)).otherwise(bh0)
        val pages = df.select(col(idCol) +: carry ++: Seq(
          col(htmlCol).as("__html"), col(bc).as("__page"), bh.as("__bh")): _*)
        resolveUrl(pages, "__page", "__bh", "__eff")
          .withColumn("__base", coalesce(col("__eff"), col("__page")))
      case None =>
        df.select(col(idCol) +: carry ++: Seq(
          col(htmlCol).as("__html"), lit(null).as("__base")): _*)
    }
    val raw = basePrep.select(col(idCol) +: carry ++: Seq(col("__base"),
        posexplode(regexp_extract_all(col("__html"),
          lit(hrefPattern), lit(1)))
          .as(Seq("pos", "q"))): _*)
      .select(col(idCol) +: carry ++: Seq(col("pos"),
        when(col("q").rlike("^[\"']"),
          expr("substring(q, 2, length(q) - 2)")).otherwise(col("q"))
          .as("href"),
        col("__base")): _*)
    baseUrlCol match {
      case Some(_) =>
        // the http(s) admission is decided on (href, base) BEFORE
        // resolution — provably the same row set as filtering the
        // resolved url (a non-absolute reference inherits the base
        // scheme; merged is null exactly for empty/#-only refs or a
        // schemeless base), and crucially CHEAP: a predicate on the
        // resolved url would be pushed below the staged resolution
        // projections with the whole resolution tree INLINED into the
        // Filter, re-evaluating it per extracted row (measured: the
        // dominant cost of the resolving form before this reorder).
        // Filtering first also means dropped refs are never resolved.
        val h = trim(col("href"))
        val absHttp = h.rlike("^(?i)https?://")
        val abs = h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")
        val baseHttp = lower(regexp_extract(col("__base"),
          "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)).isin("http", "https")
        val kept = raw.where(absHttp ||
          (!abs && baseHttp && h =!= "" && !h.startsWith("#")))
        resolveUrl(kept, "__base", "href", "url")
          .select(col(idCol) +: carry ++: Seq(col("pos"), col("url")): _*)
      case None =>
        raw.select(col(idCol) +: carry ++: Seq(col("pos"),
            col("href").as("url")): _*)
          .where(lower(col("url")).rlike("^https?://"))
    }
  }

  /** Lowercased host of a URL: authority after `scheme://`, userinfo
    * stripped, stopping at port / path / query / fragment; a leading
    * `www.` removed. Empty string when nothing URL-shaped matches. */
  def urlHost(c: Column): Column =
    regexp_replace(
      regexp_extract(lower(c),
        "^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([a-z0-9.-]+)", 1),
      "^www\\.", "")

  /** Registrable-site heuristic: the host's last two labels, or three
    * under the common two-label public suffixes (co/ac/gov/com/org/net
    * . uk/au/nz/jp/br/in). Deterministic and oracle-replayable; a
    * production pipeline swaps in the full Public Suffix List as a
    * broadcast dim joined on the candidate suffixes — same shape, a
    * data-driven suffix table instead of this regex. */
  def urlSite(host: Column): Column = {
    val multi = "\\.(co|ac|gov|com|org|net)\\.(uk|au|nz|jp|br|in)$"
    when(host.rlike(multi),
      regexp_extract(host, "([a-z0-9-]+\\.[a-z0-9-]+\\.[a-z0-9-]+)$", 1))
      .otherwise(regexp_extract(host, "([a-z0-9-]+\\.[a-z0-9-]+)$", 1))
  }

  /** Per-row URL parse: (host, site) for domain-level policy joins —
    * per-domain caps ([[Sampling.capPerGroup]]), domain blocklists
    * (broadcast anti-join on `site`), domain-stratified sampling. One
    * projection, zero shuffles. [[urlSite]]'s two-vs-three-label
    * HEURISTIC keys the site — the no-dependency fallback; the
    * production path is [[parseUrlsPsl]] with a real Public Suffix
    * List. */
  def parseUrls(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val host = urlHost(col(urlCol))
    df.select(col(idCol), host.as("host"), urlSite(host).as("site"))
  }

  /** Meta-robots directives — the IN-PAGE counterpart of robots.txt
    * (a page the crawler was allowed to fetch can still say
    * `noindex`, and corpus pipelines drop such pages): the `content`
    * of EVERY `<meta name="robots" ...>` tag on the page (real pages
    * carry split directives — one noindex tag and a separate nofollow
    * tag — and the published semantics union them), attribute order
    * either way, case-insensitive, values double-quoted,
    * single-quoted, or UNQUOTED (`content=noindex` — HTML allows it
    * and crawl pages use it; an unquoted value runs to the next
    * whitespace or `>`); token lists split on commas with whitespace
    * ignored, unioned across all matched tags; `none` implies both
    * noindex and nofollow. Returns a struct (noindex, nofollow); a
    * page without the tag — or with explicit `index,follow` — is
    * (false, false). One codegen-expression projection (the array
    * lambdas run over per-page tag lists, not corpus rows), zero
    * shuffles. */
  def metaRobots(html: Column): Column = {
    val h = lower(html)
    // attribute value: "..." | '...' | unquoted-run (no ws, no '>',
    // not starting with a quote)
    val v = "(\"[^\"]*\"|'[^']*'|[^\\s>\"'][^\\s>]*)"
    // attribute names are WHITESPACE-anchored (the hrefPattern rule):
    // without the \s, 'data-name="robots"' / 'data-content=...'
    // match as the real attributes and plant false directives
    val nameRobots = "\\sname\\s*=\\s*[\"']?robots\\b[\"']?"
    val c1 = regexp_extract_all(h,
      lit("<meta[^>]*" + nameRobots + "[^>]*\\scontent\\s*=\\s*" + v), lit(1))
    val c2 = regexp_extract_all(h,
      lit("<meta[^>]*\\scontent\\s*=\\s*" + v + "[^>]*" + nameRobots), lit(1))
    val vals = transform(concat(c1, c2), x =>
      when(x.rlike("^[\"']"), x.substr(lit(2), length(x) - 2)).otherwise(x))
    val toks = flatten(transform(vals, x =>
      split(regexp_replace(x, "[ \\t\\n\\x0b\\f\\r]+", ""), ",")))
    struct(
      (array_contains(toks, "noindex") || array_contains(toks, "none"))
        .as("noindex"),
      (array_contains(toks, "nofollow") || array_contains(toks, "none"))
        .as("nofollow"))
  }

  /** Directive tokens X-Robots-Tag defines (the published set) — a
    * leading `token:` prefix that is NOT one of these is a USER-AGENT
    * scope (`X-Robots-Tag: googlebot: noindex`); `unavailable_after:
    * <date>` is the directive that makes naive colon-splitting wrong. */
  private val XRobotsDirectives = Seq("all", "noindex", "nofollow", "none",
    "noarchive", "nosnippet", "notranslate", "noimageindex",
    "indexifembedded", "max-snippet", "max-image-preview",
    "max-video-preview", "unavailable_after")

  /** X-Robots-Tag directives — the HTTP-HEADER counterpart of
    * [[metaRobots]] (servers set it for non-HTML responses and at the
    * CDN layer; a corpus pipeline honors either source): every
    * `X-Robots-Tag` header in the [[parseHttpResponse]] headers array
    * (names arrive lowercased there), token lists split on commas and
    * UNIONED across headers, `none` implying noindex+nofollow. An
    * optional leading `token:` prefix that is not a known directive
    * name is a USER-AGENT scope: its directives apply only when the
    * scope equals `agent` (exact token, case-insensitive — the
    * documented subset; `unavailable_after: <date>` parses as the
    * directive it is, never as a scope). Returns struct (noindex,
    * nofollow); one projection over the per-row headers array, zero
    * shuffles. */
  def xRobotsTag(headers: Column, agent: String = ""): Column = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val vals = filter(headers, h => h.getField("name") === "x-robots-tag")
    val toks = flatten(transform(vals, h => {
      val v = trim(lower(h.getField("value")))
      val pfx = regexp_extract(v, "^([a-z0-9_.-]+)\\s*:", 1)
      val isScope = pfx =!= "" && !pfx.isin(XRobotsDirectives: _*)
      val body = when(isScope,
        trim(v.substr(instr(v, ":") + 1, length(v)))).otherwise(v)
      val applies = !isScope || pfx === lit(agentLc)
      when(applies,
        split(regexp_replace(body, "[ \\t\\n\\x0b\\f\\r]+", ""), ","))
        .otherwise(array())
    }))
    struct(
      (array_contains(toks, "noindex") || array_contains(toks, "none"))
        .as("noindex"),
      (array_contains(toks, "nofollow") || array_contains(toks, "none"))
        .as("nofollow"))
  }

  /** robots.txt parsing (RFC 9309 core) — the crawl-admission dim a
    * pipeline applies before (re)fetching or before keeping fetched
    * pages whose robots later said no. The whole parse is declarative
    * (split/window/agg — no UDF), so it runs AS the dim-prep join
    * side at any site count:
    *
    *  - lines: `\r` and `#`-comments stripped, trimmed;
    *  - GROUPS: a maximal run of `User-agent:` lines owns the rules
    *    until the next run (the running-count-of-run-starts window);
    *  - group selection per RFC 9309 §2.2.1: a group's user-agent
    *    token matches when it is a case-insensitive PREFIX of the
    *    crawler's product token (the `googlebot` group matches agent
    *    `googlebot-news`); among matching tokens the LONGEST (most
    *    specific) wins, and every group carrying a winning token
    *    combines. Only when NO token prefix-matches do the `*` groups
    *    apply. Selection is decided from the GROUPS themselves, not
    *    from their path-bearing rules — a matched group whose sole
    *    directive is an empty `Disallow:` (RFC allow-all) still
    *    claims the agent, yielding zero applicable rules (default
    *    allow), never a fallback to `*`;
    *  - rules: `Allow:` / `Disallow:` with non-empty paths (an empty
    *    `Disallow:` imposes nothing); specificity = rule OCTET length
    *    (RFC §2.2.2);
    *  - each rule is compiled to the equivalent anchored regex —
    *    metacharacters escaped, `*` → `.*`, a TRAILING `$` kept as
    *    the end anchor — which is exactly the RFC matcher and
    *    replayable by any regex engine.
    *
    * Returns one row per applicable rule:
    * (site, allow, path, spec, pattern). */
  /** The robots.txt line/group parse shared by [[robotsRules]] and
    * [[robotsDirectives]]: one row per line with (site, pos, line,
    * is_ua, ua, kind, path, value, grp) — `value` is the raw text
    * after the first `:` (any directive's argument, case preserved),
    * `grp` the UA-run group index. */
  private def robotsGrouped(robots: DataFrame, siteCol: String,
                            txtCol: String): DataFrame = {
    val lines = robots.select(col(siteCol).as("site"),
        posexplode(split(col(txtCol), "\n")).as(Seq("pos", "raw")))
      .select(col("site"), col("pos"),
        trim(regexp_replace(regexp_replace(col("raw"), "\\r$", ""),
          "#.*$", "")).as("line"))
    val value =
      trim(expr("substring(line, instr(line, ':') + 1, length(line))"))
    val tagged = lines
      .withColumn("is_ua", lower(col("line")).rlike("^user-agent\\s*:"))
      .withColumn("ua", when(col("is_ua"), lower(value)))
      .withColumn("kind",
        when(lower(col("line")).rlike("^allow\\s*:"), lit("allow"))
          .when(lower(col("line")).rlike("^disallow\\s*:"), lit("disallow")))
      .withColumn("path", when(col("kind").isNotNull, value))
      .withColumn("value", value)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("site")).orderBy(col("pos"))
    tagged
      .withColumn("ua_start", (col("is_ua") &&
        !coalesce(lag(col("is_ua"), 1).over(w), lit(false))).cast("int"))
      .withColumn("grp", sum(col("ua_start")).over(w))
  }

  /** RFC 9309 §2.2.1 group selection over a [[robotsGrouped]] frame:
    * the (site, grp) pairs whose directives apply to `agent` —
    * most-specific prefix-matching token, `*` groups only when no
    * token prefix-matches. Decided from the AGENTS frame, so a
    * selected group with no path-bearing rules still suppresses the
    * `*` fallback (default allow, not `*` rules). */
  private def robotsSelected(grouped: DataFrame, agent: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // one row per (site, grp, ua); `m_spec` marks tokens that
    // prefix-match the crawler's product token (RFC §2.2.1 — `*` is
    // the fallback, never a prefix match)
    val agents = grouped.where(col("is_ua"))
      .select(col("site"), col("grp"), col("ua"))
      .distinct()
      .withColumn("m_spec",
        col("ua") =!= "*" && lit(agentLc).startsWith(col("ua")))
    // most-specific match per site = the longest prefix-matching token
    val best = agents.where(col("m_spec"))
      .groupBy(col("site")).agg(max(length(col("ua"))).as("best_len"))
    val selSpec = agents.where(col("m_spec")).join(best, "site")
      .where(length(col("ua")) === col("best_len"))
      .select(col("site"), col("grp"))
    val selWild = agents.where(col("ua") === "*")
      .join(best, Seq("site"), "left_anti")
      .select(col("site"), col("grp"))
    selSpec.union(selWild).distinct()
  }

  def robotsRules(robots: DataFrame, siteCol: String, txtCol: String,
                  agent: String = "*"): DataFrame = {
    val grouped = robotsGrouped(robots, siteCol, txtCol)
    val selected = robotsSelected(grouped, agent)
    val rules = grouped
      .where(col("kind").isNotNull && length(col("path")) > 0)
      .join(selected, Seq("site", "grp"))
    val ends = col("path").endsWith("$")
    val body = when(ends,
        expr("substring(path, 1, length(path) - 1)")).otherwise(col("path"))
    val esc = regexp_replace(body,
      "([.\\[\\]{}()+?^$|\\\\])", "\\\\$1")
    val pattern = concat(lit("^"), replace(esc, lit("*"), lit(".*")),
      when(ends, lit("$")).otherwise(lit("")))
    rules
      .select(col("site"), (col("kind") === "allow").as("allow"),
        col("path"), length(col("path")).as("spec"), pattern.as("pattern"))
  }

  /** Robots admission verdict per URL: join the (small, broadcast)
    * rule dim on `site`, match rules against the URL's path+query
    * (fragment excluded — it never reaches the server), and decide by
    * the RFC longest-match rule — highest specificity wins, an
    * allow/disallow TIE goes to allow, and a URL no rule matches is
    * allowed. Returns the input plus (path, allowed, rule) where
    * `rule` is the winning rule's path (null when none matched). */
  def robotsAllowed(urls: DataFrame, rules: DataFrame, idCol: String,
                    urlCol: String, siteCol: String): DataFrame = {
    val r = rules.select(col("site").as(siteCol), col("allow"),
      col("path").as("rule_path"), col("spec"), col("pattern"))
    val rawPath = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val withPath = urls.withColumn("path",
      when(rawPath === "", lit("/")).otherwise(rawPath))
    withPath.join(broadcast(r), Seq(siteCol), "left")
      // the winner is the max (spec, allowFlag, rule) struct over the
      // MATCHED rules: longest rule first, allow beating disallow on
      // equal length — exactly RFC 9309 §2.2.2's precedence
      .withColumn("m",
        when(col("pattern").isNotNull && expr("path RLIKE pattern"),
          struct(col("spec"), col("allow").cast("int").as("a"),
            col("rule_path"))))
      .groupBy(col(idCol), col(siteCol), col("path"))
      .agg(max(col("m")).as("win"))
      .select(col(idCol), col(siteCol), col("path"),
        coalesce(col("win.a") === 1, lit(true)).as("allowed"),
        col("win.rule_path").as("rule"))
  }

  /** robots.txt POLITENESS + DISCOVERY directives — the two non-rule
    * signals a crawl pipeline harvests from the same file: `Sitemap:`
    * URLs (the sitemaps.org extension — GLOBAL per the protocol,
    * independent of user-agent groups; the crawl frontier's seed
    * discovery channel) and `Crawl-delay:` (the de-facto politeness
    * directive — GROUP-scoped like rules, so the value is read from
    * the groups RFC 9309 §2.2.1 selects for `agent`, most-specific
    * prefix precedence included; several applicable values take the
    * MINIMUM — the conservative politeness choice — and a
    * non-numeric value yields null via the cast). Returns one row per
    * input site: (site, crawl_delay DOUBLE nullable, n_sitemaps,
    * first_sitemap nullable — the lexicographic min, deterministic).
    * Same declarative parse frame as [[robotsRules]]; everything is
    * per-site metadata-sized. */
  def robotsDirectives(robots: DataFrame, siteCol: String, txtCol: String,
                       agent: String = "*"): DataFrame = {
    val grouped = robotsGrouped(robots, siteCol, txtCol)
    val selected = robotsSelected(grouped, agent)
    val sm = grouped
      .where(lower(col("line")).rlike("^sitemap\\s*:"))
      .groupBy(col("site"))
      .agg(count(lit(1)).cast("int").as("n_sitemaps"),
        min(col("value")).as("first_sitemap"))
    val cd = grouped
      .where(lower(col("line")).rlike("^crawl-delay\\s*:"))
      .join(selected, Seq("site", "grp"))
      .groupBy(col("site"))
      // try_cast: a malformed delay is null, never an ANSI cast error
      .agg(min(expr("try_cast(value AS DOUBLE)")).as("crawl_delay"))
    robots.select(col(siteCol).as("site")).distinct()
      .join(cd, Seq("site"), "left")
      .join(sm, Seq("site"), "left")
      .select(col("site"), col("crawl_delay"),
        coalesce(col("n_sitemaps"), lit(0)).as("n_sitemaps"),
        col("first_sitemap"))
  }

  /** URL canonicalization — the URL-DEDUP KEY step of a crawl
    * pipeline (Common-Crawl-style corpora carry the same page under
    * fragment/tracking-param/case/port variants; URL-level dedup
    * before fetch or before content dedup keys on this form):
    *
    *  1. fragment dropped (`#…` never reaches the server);
    *  2. scheme + host:port lowercased (path case AND RFC-3986
    *     userinfo case are preserved — both are case-sensitive);
    *  3. default ports stripped (`http://…:80`, `https://…:443`);
    *  4. tracking parameters dropped (utm_*, gclid, fbclid, msclkid,
    *     ref) and the REMAINING query params sorted — param order is
    *     not semantic, so `?a=1&b=2` and `?b=2&a=1` must collide;
    *  5. trailing slashes stripped from the path (`/a/` == `/a`,
    *     root `/` == no path).
    *
    * One zero-shuffle projection of RE2-safe regex/array built-ins;
    * the array lambda steps (filter/sort over the split param list)
    * replay as DuckDB list_filter/list_sort. Compose with
    * `sha2(canon, 256)` + [[Dedup]] for URL-level dedup. */
  def canonicalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val pre = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = substr(base, length(pre) + lit(1), length(base))
    // lowercase ONLY scheme and host:port — RFC 3986 userinfo is
    // case-sensitive and must pass through untouched (it also may
    // contain ':', which is why the default-port strip anchors on the
    // host:port segment, not on the whole authority)
    val scheme = lower(regexp_extract(pre, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val userinfo = regexp_extract(pre, "^[A-Za-z][A-Za-z0-9+.-]*://([^/@]*@)", 1)
    val hostPort = lower(regexp_extract(pre, "://(?:[^/@]*@)?([^/?#]*)$", 1))
    val hostPortNoDefault =
      when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
        .otherwise(hostPort)
    val preLc = concat(scheme, lit("://"), userinfo, hostPortNoDefault)
    val restClean = regexp_replace(rest, "/+$", "")
    val params = array_sort(filter(split(query, "&"), p =>
      !(p.rlike("^(utm_[a-z0-9]*|gclid|fbclid|msclkid|ref)=") || p === "")))
    val q = array_join(params, "&")
    // schemeless input (pre matches nothing) must pass through
    // unchanged, not gain a malformed '://' prefix — mirrors urlHost's
    // empty-on-no-match contract; a non-URL row keeps a stable,
    // harmless canon key (itself)
    when(pre === "", c).otherwise(
      concat(preLc, restClean,
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** [[parseUrls]] with REAL Public Suffix List semantics
    * (publicsuffix.org rules: multi-label suffixes, `*.` wildcards,
    * `!` exceptions, private-section entries) — the upgrade every
    * domain-level policy inherits, since the heuristic mis-keys any
    * registrable domain outside its hardcoded ccSLD pattern.
    *
    * Plan shape is unchanged: still ONE zero-shuffle projection. The
    * rule set rides as a codegen reference object inside
    * [[graft.plans.PslSuffixLabels]] (≤ label-count hash probes per
    * row — cheaper than a broadcast join, and nothing to co-partition)
    * and the suffix/site strings derive from the label COUNT with
    * built-in slice/array_join, so the whole parse replays in the SQL
    * oracle. Returns (id, host, site, suffix); `site` is NULL when the
    * host is itself a public suffix (nothing registrable to key on),
    * and both are NULL when nothing URL-shaped matched. */
  /** Sitemap XML parsing (sitemaps.org protocol: `<urlset>` documents
    * list page URLs, `<sitemapindex>` documents list child sitemaps —
    * the documents the `Sitemap:` robots.txt directives
    * ([[robotsDirectives]]) point a crawler at, and the natural
    * producer of a URL frontier). One zero-shuffle projection:
    * `<url>`/`<sitemap>` blocks via `regexp_extract_all` (tag-anchored
    * with `\b`, so `<urlset>`/`<sitemapindex>` themselves never match
    * as entry blocks) + a narrow `posexplode`, per-block field
    * extraction for `loc`/`lastmod`/`changefreq`/`priority`.
    *
    * Semantics:
    *  - `loc` values are XML-unescaped ([[graft.plans
    *    .WebTextExpressions.htmlEntityDecode]] — covers the five
    *    predefined XML entities plus numeric character references,
    *    both of which sitemaps.org REQUIRES producers to escape) and
    *    whitespace-trimmed; a block with no (or empty) `loc` is
    *    dropped but HOLDS its `pos` (same contract as
    *    [[extractLinks]]) — `pos` is the block's 0-based document
    *    order, `<url>` blocks before `<sitemap>` blocks (a valid
    *    document carries only one kind);
    *  - `lastmod`/`changefreq` are trimmed strings (lastmod is W3C
    *    datetime in either date or datetime form — kept textual, the
    *    forms are not one castable type);
    *  - `priority` casts to double only when numeric (ANSI mode would
    *    throw on garbage; a malformed priority is null, the row
    *    survives);
    *  - CDATA sections are not interpreted (documented limit: real
    *    sitemap producers entity-escape, per the protocol).
    *
    * Every column of `docs` other than `xmlCol` is carried through,
    * so callers can thread ids/root URLs into the explode. */
  def sitemapEntries(docs: DataFrame, xmlCol: String): DataFrame = {
    def field(tag: String): Column = {
      val v = regexp_extract(col("__sm_block"),
        s"(?is)<$tag\\b[^>]*>\\s*(.*?)\\s*</$tag\\s*>", 1)
      when(v =!= "", v)
    }
    val xml = col(xmlCol)
    val tagged = concat(
      transform(
        regexp_extract_all(xml, lit("(?is)<url\\b[^>]*>(.*?)</url\\s*>"),
          lit(1)),
        b => struct(lit("url").as("kind"), b.as("block"))),
      transform(
        regexp_extract_all(xml,
          lit("(?is)<sitemap\\b[^>]*>(.*?)</sitemap\\s*>"), lit(1)),
        b => struct(lit("sitemap").as("kind"), b.as("block"))))
    val pr = field("priority")
    docs
      .select(col("*"), posexplode(tagged).as(Seq("pos", "__sm_e")))
      .withColumn("__sm_block", col("__sm_e.block"))
      .withColumn("kind", col("__sm_e.kind"))
      .withColumn("loc",
        graft.plans.WebTextExpressions.htmlEntityDecode(field("loc")))
      .withColumn("lastmod", field("lastmod"))
      .withColumn("changefreq", field("changefreq"))
      .withColumn("priority",
        when(pr.rlike("^[0-9]+(\\.[0-9]+)?$"), pr.cast("double")))
      .where(col("loc").isNotNull)
      .drop(xmlCol, "__sm_e", "__sm_block")
  }

  /** The URL-frontier composition over a frame of FETCHED sitemap
    * documents `(urlCol, xmlCol)`: page URLs listed directly by
    * `<urlset>` documents (depth 0) plus, one level through
    * `<sitemapindex>` documents, the page URLs of child sitemaps that
    * are themselves in the fetched frame (depth 1 — an index entry
    * whose child was not fetched yields no rows: the frontier reports
    * what the crawl HAS, and the child reference itself is already a
    * depth-0-style fetch task). One level is the sitemaps.org shape —
    * indexes may not reference other indexes, so a deeper recursion
    * has nothing legal to find; an index-typed child that does appear
    * is ignored by the same rule.
    *
    * Returns `(root_sitemap, depth, pos, url, lastmod, changefreq,
    * priority)` — compose with [[canonicalizeUrl]] and
    * [[robotsAllowed]] for the admission-filtered frontier.
    *
    * Plan shape: the parsed entry frame is persisted (it feeds both
    * the depth-0 projection and the index→child join, and re-running
    * the block-extraction regexes per consumer is the
    * re-extraction-per-consumer defect the round-15 plan work fixed
    * elsewhere); the child join hash-joins index entries against the
    * fetched frame on the child URL — the index side is tiny (one row
    * per child sitemap, never per page). A sitemap corpus is
    * metadata-sized next to the page corpus it describes (one
    * document per ~50k pages), so the persist holds at crawl scale. */
  def sitemapFrontier(fetched: DataFrame, urlCol: String,
                      xmlCol: String): DataFrame = {
    val entries = sitemapEntries(
      fetched.select(col(urlCol).as("root_sitemap"),
        col(xmlCol).as("__sm_xml")), "__sm_xml")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = Seq(col("root_sitemap"), col("depth"), col("pos"),
      col("url"), col("lastmod"), col("changefreq"), col("priority"))
    val direct = entries.where(col("kind") === "url")
      .withColumn("depth", lit(0))
      .withColumn("url", col("loc"))
      .select(out: _*)
    val childDocs = entries.where(col("kind") === "sitemap")
      .select(col("root_sitemap"), col("loc").as("__child"))
      .join(fetched.select(col(urlCol).as("__child"),
        col(xmlCol).as("__sm_xml")), Seq("__child"))
    val viaIndex = sitemapEntries(childDocs, "__sm_xml")
      .where(col("kind") === "url")
      .withColumn("depth", lit(1))
      .withColumn("url", col("loc"))
      .select(out: _*)
    direct.unionByName(viaIndex)
  }

  def parseUrlsPsl(df: DataFrame, idCol: String, urlCol: String,
                   psl: graft.functions.Psl): DataFrame = {
    // trailing root dots stripped (FQDN form "example.com." == the
    // canonical "example.com"): the kernel's label split drops
    // trailing empties, so the derivation's split must see the same
    // label count or site/suffix would mis-slice
    val host = regexp_replace(urlHost(col(urlCol)), "\\.+$", "")
    df.select(col(idCol), host.as("host"))
      .withColumn("__labs", split(col("host"), "\\."))
      .withColumn("__n", size(col("__labs")))
      .withColumn("__ps",
        graft.plans.PslExpressions.pslSuffixLabels(col("host"), psl))
      .select(col(idCol), col("host"),
        when(col("__ps") > 0 && col("__n") > col("__ps"),
          array_join(slice(col("__labs"), -(col("__ps") + lit(1)),
            col("__ps") + lit(1)), ".")).as("site"),
        when(col("__ps") > 0,
          array_join(slice(col("__labs"), -col("__ps"), col("__ps")), "."))
          .as("suffix"))
  }
}
