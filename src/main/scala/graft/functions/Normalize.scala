package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-normalization primitives from the reference's ingestion path,
  * re-expressed as codegen'd built-in Column expressions (no UDFs).
  *
  * Reference behavior:
  *  - null-byte strip: ght2dm.go:573-575 (`removeNullByte`)
  *  - empty-string dates -> NULL: ght2dm.go:581-594
  *  - `updated_at <- coalesce(updated_at, created_at)`: ght2dm.go:352-354,
  *    386-389
  *  - derived key `clone_path = lower(lang/login/name)` with default fills:
  *    ght2dm.go:551-567 (`buildClonePath`)
  */
object Normalize {

  /** Strip 0x00 bytes; the reference applies this to every string column
    * before insert (ght2dm.go:573-575). `replace` is codegen'd and
    * replaces all occurrences in both Spark and DuckDB. */
  def removeNullBytes(c: Column): Column =
    replace(c, lit("\u0000"), lit(""))

  /** Empty string -> NULL (ght2dm.go:581-594 applies this to date strings
    * so the database layer stores NULL, not ''). */
  def emptyToNull(c: Column): Column = nullif(c, lit(""))

  /** The reference fills a missing `updated_at` with `created_at`
    * (ght2dm.go:352-354). Works for any orderable type. */
  def coalesceUpdated(updatedAt: Column, createdAt: Column): Column =
    coalesce(updatedAt, createdAt)

  /** `buildClonePath` (ght2dm.go:551-567): lower(lang/login/name) with the
    * reference's default fills for missing segments. */
  def clonePath(lang: Column, login: Column, name: Column): Column =
    lower(concat_ws("/",
      coalesce(nullif(lang, lit("")), lit("unknown")),
      coalesce(nullif(login, lit("")), lit("john_doe")),
      coalesce(nullif(name, lit("")), lit("42"))))

  /** PII scrub for the training-data pipeline: redact email addresses
    * and US-style phone numbers. RE2-safe patterns (no backrefs or
    * lookaround) so the DuckDB oracle replays them verbatim; both
    * engines replace ALL occurrences (Spark by default, DuckDB with the
    * 'g' flag). */
  def redactPii(c: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9]{1,2}[-. ]?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"
    regexp_replace(regexp_replace(c, email, "<EMAIL>"), phone, "<PHONE>")
  }

  /** Dedup-key canonicalization (the "fuzzy exact dedup"
    * normalization of RefinedWeb/SlimPajama-style pipelines):
    * lowercase, punctuation → space, whitespace runs collapsed, ends
    * trimmed — so casing, punctuation, and spacing variants of the
    * same page hash to one exact-dedup key. Whitespace is the
    * EXPLICIT class [ \t\n\x0b\f\r] on both engines: Java's \s and
    * RE2's \s disagree on \x0b, so spelling it out is what keeps the
    * oracle replay exact.
    *
    * Lowercasing is ASCII-ONLY, via `translate` (a 1:1 character map
    * with identical semantics in Spark and DuckDB) — NOT `lower()`,
    * whose Unicode case mappings diverge between Java (full mappings:
    * İ → i+combining dot) and utf8proc (simple mappings). Non-ASCII
    * letters are left unmapped and then fall to the punctuation→space
    * rule, which is engine-independent by construction. The supported
    * key alphabet is therefore exactly [a-z0-9] + single spaces. */
  def dedupKey(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                     "abcdefghijklmnopqrstuvwxyz"),
        "[^a-z0-9 \\t\\n\\x0b\\f\\r]", " "),
      "[ \\t\\n\\x0b\\f\\r]+", " "))

  /** The 27 printable Windows-1252 characters that occupy the C1 byte
    * range 0x80–0x9F (bytes 0x81/0x8D/0x8F/0x90/0x9D are undefined in
    * cp1252 and never appear). Mojibake produced by reading UTF-8
    * bytes through a cp1252 decoder shows THESE characters where raw
    * continuation/lead bytes were; mapping them back to U+0080–U+009F
    * makes every character equal its original byte value, after which
    * a latin-1 re-encode recovers the byte stream exactly. Bytes
    * 0xA0–0xFF decode identically under cp1252 and latin-1, so this
    * table is the entire difference between the two. */
  private val cp1252From =
    "\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030\u0160" +
    "\u2039\u0152\u017D\u2018\u2019\u201C\u201D\u2022\u2013\u2014" +
    "\u02DC\u2122\u0161\u203A\u0153\u017E\u0178"
  private val cp1252To =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A" +
    "\u008B\u008C\u008E\u0091\u0092\u0093\u0094\u0095\u0096\u0097" +
    "\u0098\u0099\u009A\u009B\u009C\u009E\u009F"

  /** (from, to) pairs of [[cp1252From]]/[[cp1252To]] — exported so the
    * DuckDB oracle can render the identical translate() table. */
  def cp1252Pairs: Seq[(Char, Char)] = cp1252From.zip(cp1252To).toSeq

  /** A UTF-8-structure regex over CHARACTERS-AS-BYTES: matches iff the
    * string's code points, read as byte values, form well-formed UTF-8
    * (RFC 3629 — surrogate range and >U+10FFFF excluded). Any code
    * point above 0xFF falls in no alternative, so a match also proves
    * every character is byte-valued. Plain alternation/classes only —
    * identical semantics under Java regex and RE2, so the oracle
    * reuses the exact pattern. */
  val utf8StructRegex: String =
    "^(?:[\\x00-\\x7F]" +
      "|[\\xC2-\\xDF][\\x80-\\xBF]" +
      "|\\xE0[\\xA0-\\xBF][\\x80-\\xBF]" +
      "|[\\xE1-\\xEC\\xEE\\xEF][\\x80-\\xBF]{2}" +
      "|\\xED[\\x80-\\x9F][\\x80-\\xBF]" +
      "|\\xF0[\\x90-\\xBF][\\x80-\\xBF]{2}" +
      "|[\\xF1-\\xF3][\\x80-\\xBF]{3}" +
      "|\\xF4[\\x80-\\x8F][\\x80-\\xBF]{2})*$"

  /** At least one multi-byte UTF-8 lead byte — the mojibake signature
    * that gates the repair (an all-ASCII byte stream decodes to
    * itself; "fixing" it would be an expensive identity). */
  val mojibakeLeadRegex: String = "[\\xC2-\\xF4]"

  /** Mojibake repair (the ftfy "fix one layer of UTF-8/cp1252
    * double-decoding" core, as pure codegen built-ins): text that was
    * UTF-8 on disk but decoded through cp1252/latin-1 — "Café" read
    * as "CafÃ©" — is detected and re-decoded; everything else passes
    * through UNCHANGED.
    *
    * The repair fires only when, after mapping cp1252's C1-range
    * characters back to their byte values ([[cp1252Pairs]]), every
    * character is byte-valued AND the byte sequence is well-formed
    * UTF-8 with at least one multi-byte sequence ([[utf8StructRegex]]
    * + [[mojibakeLeadRegex]]). That predicate is exact, so the repair
    * NEVER corrupts legitimate text: a genuine "Ã©" in a French
    * linguistics article survives only if the surrounding characters
    * happen to form valid UTF-8 byte-wise — the same (vanishingly
    * rare) ambiguity every mojibake fixer shares. One layer per call
    * (double-encoded text needs two applications; production corpora
    * are overwhelmingly single-layer).
    *
    * Plan shape: translate + two rlikes + encode/decode, all
    * codegen'd built-ins inside the scan projection — no UDF, no
    * shuffle, embarrassingly parallel at 100 TB. */
  def fixMojibake(c: Column): Column = {
    val m = translate(c, cp1252From, cp1252To)
    val repairable = m.rlike(mojibakeLeadRegex) && m.rlike(utf8StructRegex)
    when(repairable, decode(encode(m, "ISO-8859-1"), "UTF-8")).otherwise(c)
  }

  /** Unicode NFC normalization KERNEL (JDK `java.text.Normalizer`, no
    * dependency) — called from the codegen'd `NfcNormalize` expression
    * ([[graft.plans.HashExpressions.nfcNormalize]]). Real crawl text
    * carries canonically-equivalent byte variants (é as U+00E9 vs
    * e + U+0301); byte-keyed dedup treats them as distinct documents,
    * so pipelines normalize BEFORE hashing. The `isNormalized` quick
    * check makes already-NFC (in particular all-ASCII) input a scan +
    * identity — no allocation on the common path. NFC (not NFKC) is
    * deliberate: canonical equivalence only, no compatibility folding
    * (ﬁ→fi, ²→2) that would change retrieval-visible content; DuckDB's
    * `nfc_normalize` replays it exactly. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
