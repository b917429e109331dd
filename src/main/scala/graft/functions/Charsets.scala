package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.Charset
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.unsafe.types.UTF8String

/** Legacy-charset decoding for the WET path (reference surface: WHATWG
  * Encoding "get an encoding" label table; the labels below are the
  * WHATWG names for the encodings that carry essentially all non-
  * UTF-8/latin-1 crawl traffic — Shift_JIS, EUC-JP, ISO-2022-JP, GBK,
  * GB18030, Big5, EUC-KR, KOI8, windows-874, plus the single-byte
  * windows-125x / iso-8859-x families the JVM names identically).
  *
  * Browsers do NOT decode by the literal label: WHATWG maps
  * `shift_jis` to windows-31j (the CP932 superset), `gb2312` to GBK,
  * `euc-kr` to windows-949, and `big5` to Big5 WITH the HKSCS
  * extension — a crawl pipeline that decodes by the literal label
  * mojibakes exactly the pages a browser renders fine. The alias
  * table applies those remaps; any label it does not list falls
  * through to `Charset.isSupported` (which catches the iso-8859 /
  * windows-125x families and their JVM aliases), and a label the JVM
  * does not know yields NULL so the caller can apply the WHATWG
  * default (UTF-8) as an explicit Column-level fallback.
  *
  * Decode semantics: malformed and unmappable sequences become U+FFFD
  * (`Charset.decode`'s REPLACE action — the browser behavior), never
  * an error: at 100 TB a hostile page must degrade, not kill a task.
  * Resolved charsets are cached per label (ConcurrentHashMap with a
  * negative-hit marker); `Charset.decode` allocates a fresh decoder
  * per call, so the shared objects are thread-safe across the 32
  * executor threads. */
object Charsets {

  /** WHATWG label -> JVM charset name, for every label whose WHATWG
    * encoding differs from (or is unknown to) the JVM's own alias
    * table. Labels already lowercased by the caller. */
  private val whatwgAliases: Map[String, String] = Map(
    // WHATWG "shift_jis" IS windows-31j / CP932 (the MS superset)
    "shift_jis" -> "windows-31j",
    "shift-jis" -> "windows-31j",
    "sjis" -> "windows-31j",
    "x-sjis" -> "windows-31j",
    "ms_kanji" -> "windows-31j",
    "csshiftjis" -> "windows-31j",
    "ms932" -> "windows-31j",
    "windows-31j" -> "windows-31j",
    "euc-jp" -> "EUC-JP",
    "x-euc-jp" -> "EUC-JP",
    "cseucpkdfmtjapanese" -> "EUC-JP",
    "iso-2022-jp" -> "ISO-2022-JP",
    "csiso2022jp" -> "ISO-2022-JP",
    // WHATWG "gb2312" IS GBK (every gb2312-labeled page gets the
    // superset decode in a browser)
    "gbk" -> "GBK",
    "gb2312" -> "GBK",
    "gb_2312" -> "GBK",
    "gb_2312-80" -> "GBK",
    "chinese" -> "GBK",
    "csgb2312" -> "GBK",
    "csiso58gb231280" -> "GBK",
    "iso-ir-58" -> "GBK",
    "x-gbk" -> "GBK",
    "gb18030" -> "GB18030",
    // WHATWG "big5" includes the HKSCS extension (lead bytes
    // 0x87-0xA0 the base JVM Big5 leaves undefined)
    "big5" -> "Big5-HKSCS",
    "big5-hkscs" -> "Big5-HKSCS",
    "cn-big5" -> "Big5-HKSCS",
    "x-x-big5" -> "Big5-HKSCS",
    "csbig5" -> "Big5-HKSCS",
    // WHATWG "euc-kr" IS windows-949 (the UHC superset)
    "euc-kr" -> "x-windows-949",
    "ks_c_5601-1987" -> "x-windows-949",
    "ks_c_5601-1989" -> "x-windows-949",
    "ksc5601" -> "x-windows-949",
    "ksc_5601" -> "x-windows-949",
    "korean" -> "x-windows-949",
    "csksc56011987" -> "x-windows-949",
    "iso-ir-149" -> "x-windows-949",
    "windows-949" -> "x-windows-949",
    "koi8-r" -> "KOI8-R",
    "koi8" -> "KOI8-R",
    "koi8_r" -> "KOI8-R",
    "cskoi8r" -> "KOI8-R",
    "koi8-u" -> "KOI8-U",
    "koi8-ru" -> "KOI8-U",
    // WHATWG "windows-874" supersets tis-620 / iso-8859-11
    "windows-874" -> "x-windows-874",
    "tis-620" -> "x-windows-874",
    "iso-8859-11" -> "x-windows-874",
    "dos-874" -> "x-windows-874",
    "macintosh" -> "x-MacRoman",
    "x-mac-roman" -> "x-MacRoman",
    "mac" -> "x-MacRoman",
    "csmacintosh" -> "x-MacRoman",
    "x-mac-cyrillic" -> "x-MacCyrillic",
    "x-mac-ukrainian" -> "x-MacCyrillic",
    // WHATWG "utf-16" (and the legacy "unicode" labels) mean LE
    "utf-16" -> "UTF-16LE",
    "utf-16le" -> "UTF-16LE",
    "unicode" -> "UTF-16LE",
    "csunicode" -> "UTF-16LE",
    "ucs-2" -> "UTF-16LE",
    "utf-16be" -> "UTF-16BE")

  /** Negative-cache marker (ConcurrentHashMap rejects null values; a
    * real Charset would collide with its own label's positive hit). */
  private val Unknown: AnyRef = new Object

  private val cache = new ConcurrentHashMap[String, AnyRef]()

  /** The JVM charset for a (lowercased) WHATWG/IANA label, or null
    * when neither the alias table nor the JVM knows it. */
  def forLabel(label: String): Charset = {
    var cs = cache.get(label)
    if (cs == null) {
      cs = whatwgAliases.get(label) match {
        case Some(jvm) => Charset.forName(jvm)
        case None =>
          val ok =
            try Charset.isSupported(label)
            catch { case _: java.nio.charset.IllegalCharsetNameException => false }
          if (ok) Charset.forName(label) else Unknown
      }
      cache.put(label, cs)
    }
    if (cs eq Unknown) null else cs.asInstanceOf[Charset]
  }

  /** Decode `bytes` under the charset `label` names; null when the
    * label is unknown (callers coalesce to the WHATWG UTF-8 default).
    * Malformed/unmappable input becomes U+FFFD, never an error. */
  def decode(bytes: Array[Byte], label: UTF8String): UTF8String = {
    val cs = forLabel(label.toString)
    if (cs == null) null
    else UTF8String.fromString(cs.decode(ByteBuffer.wrap(bytes)).toString)
  }
}
