package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding — the step between tag-strip and
  * whitespace-collapse in [[graft.operators.WebClean.extractHtmlText]]
  * (reference surface: WHATWG HTML §13.2.5 character references;
  * numeric-value mapping per the "numeric character reference end
  * state", named set = the published HTML 4.01 entity list + `apos`).
  * Real CMS output is FULL of numeric references (`&#8217;`,
  * `&#x2019;`) — left undecoded they leak literal `&#...;` runs into
  * wet_text, dedup keys, and n-gram features.
  *
  * One left-to-right pass (never re-scans its own output, so
  * double-escaped `&amp;#233;` decodes to the LITERAL text `&#233;`
  * — the published semantics):
  *  - `&#D+;` / `&#xH+;` (hex marker case-insensitive): decoded by
  *    the HTML5 numeric rules — 0x00, surrogates (0xD800–0xDFFF) and
  *    values > 0x10FFFF become U+FFFD; 0x80–0x9F map through the
  *    HTML5 windows-1252 table (`&#151;` is an em dash in every
  *    browser, not a C1 control — the 5 bytes cp1252 leaves undefined
  *    stay identity); everything else is the code point itself;
  *  - `&name;`: the HTML4 252-name set plus `apos`, case-SENSITIVE
  *    (`&Eacute;` ≠ `&eacute;` — distinct entities);
  *  - anything else — unknown name, out-of-alphabet char, missing
  *    semicolon (truncated `&#12` / `&eacute` / end-of-string) —
  *    stays LITERAL: the conservative form (HTML5 would decode some
  *    semicolon-less legacy names; a crawl pipeline prefers
  *    deterministic under-decoding to guessing).
  *
  * Digit runs cap at 8 (dec) / 6 (hex) characters — any in-range code
  * point fits, and a longer run is garbage that stays literal rather
  * than silently saturating. */
object HtmlEntities {

  /** name -> code point; the HTML 4.01 table (24.2–24.4) + apos. */
  private val namedPairs: Array[(String, Int)] = Array(
    ("AElig", 0xC6),
    ("Aacute", 0xC1),
    ("Acirc", 0xC2),
    ("Agrave", 0xC0),
    ("Alpha", 0x391),
    ("Aring", 0xC5),
    ("Atilde", 0xC3),
    ("Auml", 0xC4),
    ("Beta", 0x392),
    ("Ccedil", 0xC7),
    ("Chi", 0x3A7),
    ("Dagger", 0x2021),
    ("Delta", 0x394),
    ("ETH", 0xD0),
    ("Eacute", 0xC9),
    ("Ecirc", 0xCA),
    ("Egrave", 0xC8),
    ("Epsilon", 0x395),
    ("Eta", 0x397),
    ("Euml", 0xCB),
    ("Gamma", 0x393),
    ("Iacute", 0xCD),
    ("Icirc", 0xCE),
    ("Igrave", 0xCC),
    ("Iota", 0x399),
    ("Iuml", 0xCF),
    ("Kappa", 0x39A),
    ("Lambda", 0x39B),
    ("Mu", 0x39C),
    ("Ntilde", 0xD1),
    ("Nu", 0x39D),
    ("OElig", 0x152),
    ("Oacute", 0xD3),
    ("Ocirc", 0xD4),
    ("Ograve", 0xD2),
    ("Omega", 0x3A9),
    ("Omicron", 0x39F),
    ("Oslash", 0xD8),
    ("Otilde", 0xD5),
    ("Ouml", 0xD6),
    ("Phi", 0x3A6),
    ("Pi", 0x3A0),
    ("Prime", 0x2033),
    ("Psi", 0x3A8),
    ("Rho", 0x3A1),
    ("Scaron", 0x160),
    ("Sigma", 0x3A3),
    ("THORN", 0xDE),
    ("Tau", 0x3A4),
    ("Theta", 0x398),
    ("Uacute", 0xDA),
    ("Ucirc", 0xDB),
    ("Ugrave", 0xD9),
    ("Upsilon", 0x3A5),
    ("Uuml", 0xDC),
    ("Xi", 0x39E),
    ("Yacute", 0xDD),
    ("Yuml", 0x178),
    ("Zeta", 0x396),
    ("aacute", 0xE1),
    ("acirc", 0xE2),
    ("acute", 0xB4),
    ("aelig", 0xE6),
    ("agrave", 0xE0),
    ("alefsym", 0x2135),
    ("alpha", 0x3B1),
    ("amp", 0x26),
    ("and", 0x2227),
    ("ang", 0x2220),
    ("aring", 0xE5),
    ("asymp", 0x2248),
    ("atilde", 0xE3),
    ("auml", 0xE4),
    ("bdquo", 0x201E),
    ("beta", 0x3B2),
    ("brvbar", 0xA6),
    ("bull", 0x2022),
    ("cap", 0x2229),
    ("ccedil", 0xE7),
    ("cedil", 0xB8),
    ("cent", 0xA2),
    ("chi", 0x3C7),
    ("circ", 0x2C6),
    ("clubs", 0x2663),
    ("cong", 0x2245),
    ("copy", 0xA9),
    ("crarr", 0x21B5),
    ("cup", 0x222A),
    ("curren", 0xA4),
    ("dArr", 0x21D3),
    ("dagger", 0x2020),
    ("darr", 0x2193),
    ("deg", 0xB0),
    ("delta", 0x3B4),
    ("diams", 0x2666),
    ("divide", 0xF7),
    ("eacute", 0xE9),
    ("ecirc", 0xEA),
    ("egrave", 0xE8),
    ("empty", 0x2205),
    ("emsp", 0x2003),
    ("ensp", 0x2002),
    ("epsilon", 0x3B5),
    ("equiv", 0x2261),
    ("eta", 0x3B7),
    ("eth", 0xF0),
    ("euml", 0xEB),
    ("euro", 0x20AC),
    ("exist", 0x2203),
    ("fnof", 0x192),
    ("forall", 0x2200),
    ("frac12", 0xBD),
    ("frac14", 0xBC),
    ("frac34", 0xBE),
    ("frasl", 0x2044),
    ("gamma", 0x3B3),
    ("ge", 0x2265),
    ("gt", 0x3E),
    ("hArr", 0x21D4),
    ("harr", 0x2194),
    ("hearts", 0x2665),
    ("hellip", 0x2026),
    ("iacute", 0xED),
    ("icirc", 0xEE),
    ("iexcl", 0xA1),
    ("igrave", 0xEC),
    ("image", 0x2111),
    ("infin", 0x221E),
    ("int", 0x222B),
    ("iota", 0x3B9),
    ("iquest", 0xBF),
    ("isin", 0x2208),
    ("iuml", 0xEF),
    ("kappa", 0x3BA),
    ("lArr", 0x21D0),
    ("lambda", 0x3BB),
    ("lang", 0x2329),
    ("laquo", 0xAB),
    ("larr", 0x2190),
    ("lceil", 0x2308),
    ("ldquo", 0x201C),
    ("le", 0x2264),
    ("lfloor", 0x230A),
    ("lowast", 0x2217),
    ("loz", 0x25CA),
    ("lrm", 0x200E),
    ("lsaquo", 0x2039),
    ("lsquo", 0x2018),
    ("lt", 0x3C),
    ("macr", 0xAF),
    ("mdash", 0x2014),
    ("micro", 0xB5),
    ("middot", 0xB7),
    ("minus", 0x2212),
    ("mu", 0x3BC),
    ("nabla", 0x2207),
    ("nbsp", 0xA0),
    ("ndash", 0x2013),
    ("ne", 0x2260),
    ("ni", 0x220B),
    ("not", 0xAC),
    ("notin", 0x2209),
    ("nsub", 0x2284),
    ("ntilde", 0xF1),
    ("nu", 0x3BD),
    ("oacute", 0xF3),
    ("ocirc", 0xF4),
    ("oelig", 0x153),
    ("ograve", 0xF2),
    ("oline", 0x203E),
    ("omega", 0x3C9),
    ("omicron", 0x3BF),
    ("oplus", 0x2295),
    ("or", 0x2228),
    ("ordf", 0xAA),
    ("ordm", 0xBA),
    ("oslash", 0xF8),
    ("otilde", 0xF5),
    ("otimes", 0x2297),
    ("ouml", 0xF6),
    ("para", 0xB6),
    ("part", 0x2202),
    ("permil", 0x2030),
    ("perp", 0x22A5),
    ("phi", 0x3C6),
    ("pi", 0x3C0),
    ("piv", 0x3D6),
    ("plusmn", 0xB1),
    ("pound", 0xA3),
    ("prime", 0x2032),
    ("prod", 0x220F),
    ("prop", 0x221D),
    ("psi", 0x3C8),
    ("quot", 0x22),
    ("rArr", 0x21D2),
    ("radic", 0x221A),
    ("rang", 0x232A),
    ("raquo", 0xBB),
    ("rarr", 0x2192),
    ("rceil", 0x2309),
    ("rdquo", 0x201D),
    ("real", 0x211C),
    ("reg", 0xAE),
    ("rfloor", 0x230B),
    ("rho", 0x3C1),
    ("rlm", 0x200F),
    ("rsaquo", 0x203A),
    ("rsquo", 0x2019),
    ("sbquo", 0x201A),
    ("scaron", 0x161),
    ("sdot", 0x22C5),
    ("sect", 0xA7),
    ("shy", 0xAD),
    ("sigma", 0x3C3),
    ("sigmaf", 0x3C2),
    ("sim", 0x223C),
    ("spades", 0x2660),
    ("sub", 0x2282),
    ("sube", 0x2286),
    ("sum", 0x2211),
    ("sup", 0x2283),
    ("sup1", 0xB9),
    ("sup2", 0xB2),
    ("sup3", 0xB3),
    ("supe", 0x2287),
    ("szlig", 0xDF),
    ("tau", 0x3C4),
    ("there4", 0x2234),
    ("theta", 0x3B8),
    ("thetasym", 0x3D1),
    ("thinsp", 0x2009),
    ("thorn", 0xFE),
    ("tilde", 0x2DC),
    ("times", 0xD7),
    ("trade", 0x2122),
    ("uArr", 0x21D1),
    ("uacute", 0xFA),
    ("uarr", 0x2191),
    ("ucirc", 0xFB),
    ("ugrave", 0xF9),
    ("uml", 0xA8),
    ("upsih", 0x3D2),
    ("upsilon", 0x3C5),
    ("uuml", 0xFC),
    ("weierp", 0x2118),
    ("xi", 0x3BE),
    ("yacute", 0xFD),
    ("yen", 0xA5),
    ("yuml", 0xFF),
    ("zeta", 0x3B6),
    ("zwj", 0x200D),
    ("zwnj", 0x200C),
    ("apos", 0x27))

  private val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](512)
    namedPairs.foreach { case (n, cp) =>
      m.put(n, new String(Character.toChars(cp))) }
    m
  }

  /** HTML5 numeric-reference C1 remap: index = cp - 0x80, value = the
    * windows-1252 glyph ([[Normalize.cp1252Pairs]] inverted; the five
    * undefined bytes stay identity). */
  private val c1Map: Array[Char] = {
    val a = new Array[Char](32)
    var i = 0
    while (i < 32) { a(i) = (0x80 + i).toChar; i += 1 }
    Normalize.cp1252Pairs.foreach { case (glyph, c1) =>
      a(c1 - 0x80) = glyph }
    a
  }

  private def appendCodePoint(sb: java.lang.StringBuilder, cp: Int): Unit = {
    if (cp == 0 || (cp >= 0xD800 && cp <= 0xDFFF) || cp > 0x10FFFF)
      sb.append('\uFFFD')
    else if (cp >= 0x80 && cp <= 0x9F) sb.append(c1Map(cp - 0x80))
    else sb.appendCodePoint(cp)
  }

  /** Decode character references in `s` (see object doc). The
    * ampersand-free fast path returns the input buffer unchanged. */
  def decode(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('&') < 0) return u
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        var consumed = 0 // chars consumed past '&' when a ref decodes
        if (i + 1 < n && s.charAt(i + 1) == '#') {
          val hex = i + 2 < n && (s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X')
          val digStart = if (hex) i + 3 else i + 2
          var j = digStart
          val cap = digStart + (if (hex) 6 else 8)
          var v = 0L
          while (j < n && j < cap && isDigit(s.charAt(j), hex)) {
            v = v * (if (hex) 16 else 10) + digitVal(s.charAt(j))
            j += 1
          }
          // decodes only when ≥1 digit was read AND the very next
          // char is ';' — a run longer than the cap stops on a digit
          // and stays literal, as does truncation at end-of-string
          if (j > digStart && j < n && s.charAt(j) == ';') {
            appendCodePoint(sb, if (v > 0x10FFFFL) 0x110001 else v.toInt)
            consumed = j - i + 1
          }
        } else {
          var j = i + 1
          val cap = i + 33
          while (j < n && j < cap && isNameChar(s.charAt(j))) j += 1
          if (j > i + 1 && j < n && s.charAt(j) == ';') {
            val rep = named.get(s.substring(i + 1, j))
            if (rep != null) {
              sb.append(rep)
              consumed = j - i + 1
            }
          }
        }
        if (consumed == 0) { sb.append('&'); i += 1 }
        else i += consumed
      }
    }
    UTF8String.fromString(sb.toString)
  }

  private def isDigit(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
      (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))

  private def digitVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c <= 'F') c - 'A' + 10
    else c - 'a' + 10

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
}
