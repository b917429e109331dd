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
