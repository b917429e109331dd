package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** MAIN-CONTENT extraction — the block-level text/link-density pass
  * (jusText / trafilatura family, Pomikálek 2011) every WET-quality
  * pipeline runs between raw HTML→text and the quality battery:
  * whole-page tag stripping ([[graft.operators.WebClean
  * .extractHtmlText]]) keeps nav/footer/menu boilerplate, and the
  * line-level C4 rules judge lines, not layout blocks. This kernel
  * segments the page at BLOCK-LEVEL tag boundaries and classifies
  * each block by two layout signals:
  *
  *  - length: a block whose visible text is shorter than `minChars`
  *    is boilerplate (menu items, button labels, titles);
  *  - link density: a block where anchor text is more than half the
  *    visible text is navigation (`2·|anchor| > |text|` — an integer
  *    comparison, exactly replayable).
  *
  * The classification is deliberately the two-signal "lite" core of
  * jusText (no stopword-density tiers, no short/near-good context
  * propagation) so the whole chain is a deterministic regex/arith
  * pipeline any SQL engine replays verbatim; the Gopher/C4 batteries
  * downstream supply the language-model-ish signals.
  *
  * Pipeline (identical, step by step, to the q_main_content oracle):
  *  1. script/style containers and comments removed with contents;
  *  2. the page splits at every block-level tag (open, close, or
  *     self-closing; attributes allowed) — [[BlockTagRegex]];
  *  3. per block: visible text = tags→space, the five core entities
  *     decoded (&amp; last), whitespace collapsed, trimmed; anchor
  *     text = the same over the concatenated `<a …>…</a>` inner
  *     spans;
  *  4. good = `len(text) >= minChars AND 2·len(anchor) <= len(text)`;
  *  5. outputs: `n_blocks` (blocks with nonempty visible text),
  *     `n_good`, and `main_text` = good blocks joined by `\n` in
  *     document order.
  *
  * One kernel call per row inside the scan projection — no explode,
  * no shuffle; at 100 TB this fuses into the WARC→WET ingest scan
  * right after [[graft.operators.WebClean.httpResponses]]. */
object WebText {

  /** Block-level HTML tags: a match is a block BOUNDARY. Open/close/
    * self-closing, attributes allowed; the tail `(\s[^>]*)?/?>`
    * anchors the name so `<param>`/`<prev>` never match `p`/`pre`.
    * `private[graft]` so the q_main_content oracle splices the SAME
    * pattern into its SQL replay. */
  private[graft] val BlockTagRegex: String =
    "(?i)</?(p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|" +
      "td|th|section|article|header|footer|nav|aside|main|blockquote|" +
      "pre|form|fieldset|figure|figcaption|br|hr|title|head|body|html)" +
      "(\\s[^>]*)?/?>"

  private val BlockTag = Pattern.compile(BlockTagRegex)
  private val Script = Pattern.compile("(?is)<script[^>]*>.*?</script>")
  private val Style = Pattern.compile("(?is)<style[^>]*>.*?</style>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  private val AnchorInner = Pattern.compile("(?is)<a(\\s[^>]*)?>(.*?)</a>")
  private val AnyTag = Pattern.compile("(?s)<[^>]*>")
  private val Ws = Pattern.compile("[ \\t\\n\\x0B\\f\\r]+")

  /** Visible text of an HTML fragment — the [[graft.operators
    * .WebClean.extractHtmlText]] chain minus the container strip
    * (already done page-wide): tags→space, entities, collapse, trim. */
  private def visible(fragment: String): String = {
    val noTags = AnyTag.matcher(fragment).replaceAll(" ")
    val entities = noTags
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&nbsp;", " ").replace("&amp;", "&")
    val collapsed = Ws.matcher(entities).replaceAll(" ")
    // trim U+0020 ONLY — SQL trim() semantics on both engines (Java's
    // strip/trim also eat chars the oracle's trim would keep)
    var s = 0
    var e = collapsed.length
    while (s < e && collapsed.charAt(s) == ' ') s += 1
    while (e > s && collapsed.charAt(e - 1) == ' ') e -= 1
    collapsed.substring(s, e)
  }

  /** The kernel: (n_blocks, n_good, main_text) — see object doc. */
  def mainContent(html: UTF8String, minChars: Int): InternalRow = {
    val page = Comment.matcher(
      Style.matcher(
        Script.matcher(html.toString).replaceAll(""))
        .replaceAll(""))
      .replaceAll("")
    val blocks = BlockTag.split(page, -1)
    var nBlocks = 0
    var nGood = 0
    val main = new java.lang.StringBuilder
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      val t = visible(b)
      if (t.nonEmpty) {
        nBlocks += 1
        val am = AnchorInner.matcher(b)
        val anchors = new java.lang.StringBuilder
        while (am.find()) {
          if (anchors.length() > 0) anchors.append(' ')
          anchors.append(am.group(2))
        }
        val a = visible(anchors.toString)
        // char counts, not bytes — the SQL length() both engines use
        if (t.codePointCount(0, t.length) >= minChars &&
            2L * a.codePointCount(0, a.length) <=
              t.codePointCount(0, t.length)) {
          nGood += 1
          if (main.length() > 0) main.append('\n')
          main.append(t)
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nBlocks, nGood,
      UTF8String.fromString(main.toString)))
  }
}
