package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-training-data pipeline, all
  * composed from codegen'd built-ins (no UDFs) and written with
  * RE2-safe regexes so the DuckDB oracle can evaluate the identical
  * logic.
  */
object TextFunctions {

  /** Whitespace tokens as an array column ([] for empty/blank text).
    * Only for operators that need the tokens themselves (shingling);
    * pure counts go through [[count]], which never materializes a
    * match, let alone the match array. */
  def tokens(c: Column): Column =
    regexp_extract_all(c, lit("\\S+"), lit(0))

  /** Constant-pattern match count via the allocation-free kernel
    * ([[graft.plans.RegexCount]]): Spark's `regexp_count` lowers to
    * `size(regexp_extract_all(...))`, allocating every match (one per
    * CHARACTER for the per-char classes below) only to count them —
    * measured as the dominant allocation of the text-signal scans.
    * Values are bit-identical to the built-in. */
  private def count(c: Column, pattern: String): Column =
    graft.plans.RegexCountExpression.regexCount(c, pattern)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = count(c, "\\S+")

  /** BPE-ish token estimate: runs of letters, runs of digits, and each
    * remaining non-space symbol count as one token — the usual cheap
    * proxy for subword tokenizers. */
  def bpeTokenCount(c: Column): Column =
    count(lower(c), "[a-z]+|[0-9]+|[^a-z0-9\\s]")

  /** Characters that are ASCII letters / total chars (0.0 for empty). */
  def alphaRatio(c: Column): Column = alphaRatioFrom(length(c), alphaCount(c))

  /** Punctuation chars / total chars (0.0 for empty). */
  def punctRatio(c: Column): Column = punctRatioFrom(length(c), punctCount(c))

  /** Mean word length = non-space chars / token count (0.0 if no tokens).
    * Defined via replace so the oracle SQL is the literal same formula. */
  def meanWordLen(c: Column): Column =
    meanWordLenFrom(tokenCount(c), length(replace(c, lit(" "), lit(""))))

  private def stopCount(c: Column, words: Seq[String]): Column =
    count(lower(c), "\\b(" + words.mkString("|") + ")\\b")

  /** Count of common-English-stopword hits. */
  def stopwordCount(c: Column): Column =
    stopCount(c, Seq("the", "a", "and", "of", "to", "in", "is"))

  /** Stopword hits / token count (0.0 if no tokens). */
  def stopwordRatio(c: Column): Column =
    stopwordRatioFrom(tokenCount(c), stopwordCount(c))

  /** The per-language evidence counts behind [[langId]], one scan
    * each: (en, fr, de, es, zh). Exposed so a hot call site (the
    * per-paragraph segmentation) can land them in a lower projection
    * and feed [[langIdFrom]] — the flat [[langId]] when-chain
    * references each count in several branch conditions, and
    * conditional branches are re-evaluated per reference, not
    * subexpression-eliminated (up to 4 scans per language per row). */
  def langIdCounts(c: Column): (Column, Column, Column, Column, Column) = (
    stopCount(c, Seq("the", "and", "of", "to", "is")),
    stopCount(c, Seq("le", "la", "et", "les", "des")),
    stopCount(c, Seq("der", "die", "und", "das", "ein")),
    stopCount(c, Seq("el", "los", "las", "una", "y")),
    count(c, "[\\x{4e00}-\\x{9fff}]"))

  /** [[langId]]'s deterministic argmax over precomputed counts. */
  def langIdFrom(en: Column, fr: Column, de: Column, es: Column,
                 zh: Column): Column =
    when(zh > 0, lit("zh"))
      .when(en >= fr && en >= de && en >= es && en > 0, lit("en"))
      .when(fr >= de && fr >= es && fr > 0, lit("fr"))
      .when(de >= es && de > 0, lit("de"))
      .when(es > 0, lit("es"))
      .otherwise(lit("unknown"))

  /** N-gram-heuristic language ID: score per language = stopword-set hit
    * count (the classic cheap langid), CJK decided by codepoint class;
    * deterministic argmax with a fixed priority order on ties. */
  def langId(c: Column): Column = {
    val (en, fr, de, es, zh) = langIdCounts(c)
    langIdFrom(en, fr, de, es, zh)
  }

  /** Repetition signal (Gopher-style quality filter): the fraction of
    * all word-bigram occurrences taken by the single most frequent
    * bigram — boilerplate and degenerate generations score high.
    * Computed by the one-pass [[graft.plans.RepRatio64]] codegen kernel
    * (max bigram-hash run / (nTokens-1)): a shuffle-free narrow map,
    * where the explode→count→max/sum form it replaces multiplied the
    * corpus by ~doc-length and hash-shuffled it twice. Docs with fewer
    * than 2 tokens drop out (no bigrams), exactly as in the SQL form. */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        graft.plans.HashExpressions.repRatio64(col(textCol)).as("__rr"))
      .filter(col("__rr") >= 0.0)
      .select(col(idCol), round(col("__rr"), 6).as("rep_ratio"))

  // ---- count-parameterized ratio forms -------------------------------
  // The same ratio expressions over ALREADY-COMPUTED count columns, so
  // a projection that outputs several signals of one text column can
  // compute each regex count ONCE in a lower select and combine here
  // (the CASE branches hide the duplicated counts from whole-stage
  // codegen's subexpression elimination — measured ~10 regex scans per
  // row for the 4 distinct counts in the q_quality_score projection).
  // The direct forms below delegate here, so the two can never drift.

  /** [[alphaRatio]] over precomputed length + alpha-char count. */
  def alphaRatioFrom(len: Column, alphaCnt: Column): Column =
    when(len === 0, lit(0.0)).otherwise(
      alphaCnt.cast("double") / len.cast("double"))

  /** [[punctRatio]] over precomputed length + punctuation count. */
  def punctRatioFrom(len: Column, punctCnt: Column): Column =
    when(len === 0, lit(0.0)).otherwise(
      punctCnt.cast("double") / len.cast("double"))

  /** [[stopwordRatio]] over precomputed token + stopword counts. */
  def stopwordRatioFrom(tokCnt: Column, stopCnt: Column): Column =
    when(tokCnt === 0, lit(0.0))
      .otherwise(stopCnt.cast("double") / tokCnt.cast("double"))

  /** [[meanWordLen]] over precomputed token count + non-space length. */
  def meanWordLenFrom(tokCnt: Column, nonSpaceLen: Column): Column =
    when(tokCnt === 0, lit(0.0)).otherwise(
      nonSpaceLen.cast("double") / tokCnt.cast("double"))

  /** ASCII-letter count of a text column (the alphaRatio numerator). */
  def alphaCount(c: Column): Column = count(c, "[A-Za-z]")

  /** Punctuation-char count (the punctRatio numerator). */
  def punctCount(c: Column): Column = count(c, "[.,;:!?'\"()-]")

  /** [[qualityScore]] over precomputed counts — identical arithmetic
    * in the identical order, so the score is bit-equal to the direct
    * form. */
  def qualityScoreFrom(len: Column, alphaCnt: Column, punctCnt: Column,
                       tokCnt: Column, stopCnt: Column): Column = {
    val lenScore = least(len.cast("double") / lit(200.0), lit(1.0))
    val alpha = alphaRatioFrom(len, alphaCnt)
    val punctPenalty = least(punctRatioFrom(len, punctCnt) * 5.0, lit(1.0))
    val stop = least(stopwordRatioFrom(tokCnt, stopCnt) * 4.0, lit(1.0))
    round(lenScore * 0.3 + alpha * 0.4 + stop * 0.2 + (lit(1.0) - punctPenalty) * 0.1, 6)
  }

  /** Composite quality score in [0,1]: favors texts that are neither
    * tiny nor enormous, mostly alphabetic, lightly punctuated, with a
    * sane stopword rate. Weights are arbitrary but fixed; the point is a
    * deterministic, portable scoring expression. */
  def qualityScore(c: Column): Column =
    qualityScoreFrom(length(c), alphaCount(c), punctCount(c),
      tokenCount(c), stopwordCount(c))
}
