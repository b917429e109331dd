package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Allocation-free regex match counting — the kernel behind
  * [[graft.plans.RegexCountExpression]]. Spark's own `regexp_count` is
  * a runtime-replaceable alias for `size(regexp_extract_all(...))`,
  * which MATERIALIZES every match: one `MatchResult` + one
  * `UTF8String` per match plus the array that holds them, thrown away
  * by `size`. For the per-character classes the quality signals count
  * (`[A-Za-z]`, punctuation), that is one allocation per CHARACTER of
  * every document — the dominant allocation source of the text-signal
  * scans. Counting with a bare `find()` loop is semantically identical
  * (same engine, same non-overlapping match walk) and allocates only
  * the matcher. */
object RegexOps {

  /** Number of non-overlapping matches of `p` in `s` — exactly
    * `size(regexp_extract_all(s, p, 0))` without materializing the
    * matches. */
  def countMatches(s: UTF8String, p: java.util.regex.Pattern): Int = {
    val m = p.matcher(s.toString)
    var c = 0
    while (m.find()) c += 1
    c
  }
}
