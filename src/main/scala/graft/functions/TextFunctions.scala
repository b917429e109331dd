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
    * pure counts go through `regexp_count`, which never materializes
    * the match array. */
  def tokens(c: Column): Column =
    regexp_extract_all(c, lit("\\S+"), lit(0))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = regexp_count(c, lit("\\S+"))

  /** BPE-ish token estimate: runs of letters, runs of digits, and each
    * remaining non-space symbol count as one token — the usual cheap
    * proxy for subword tokenizers. */
  def bpeTokenCount(c: Column): Column =
    regexp_count(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Characters that are ASCII letters / total chars (0.0 for empty). */
  def alphaRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      regexp_count(c, lit("[A-Za-z]")).cast("double") /
        length(c).cast("double"))

  /** Punctuation chars / total chars (0.0 for empty). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      regexp_count(c, lit("[.,;:!?'\"()-]")).cast("double") /
        length(c).cast("double"))

  /** Mean word length = non-space chars / token count (0.0 if no tokens).
    * Defined via replace so the oracle SQL is the literal same formula. */
  def meanWordLen(c: Column): Column = {
    val n = tokenCount(c)
    when(n === 0, lit(0.0)).otherwise(
      length(replace(c, lit(" "), lit(""))).cast("double") / n.cast("double"))
  }

  private def stopCount(c: Column, words: Seq[String]): Column =
    regexp_count(lower(c), lit("\\b(" + words.mkString("|") + ")\\b"))

  /** Count of common-English-stopword hits. */
  def stopwordCount(c: Column): Column =
    stopCount(c, Seq("the", "a", "and", "of", "to", "in", "is"))

  /** Stopword hits / token count (0.0 if no tokens). */
  def stopwordRatio(c: Column): Column = {
    val n = tokenCount(c)
    when(n === 0, lit(0.0))
      .otherwise(stopwordCount(c).cast("double") / n.cast("double"))
  }

  /** N-gram-heuristic language ID: score per language = stopword-set hit
    * count (the classic cheap langid), CJK decided by codepoint class;
    * deterministic argmax with a fixed priority order on ties. */
  def langId(c: Column): Column = {
    val en = stopCount(c, Seq("the", "and", "of", "to", "is"))
    val fr = stopCount(c, Seq("le", "la", "et", "les", "des"))
    val de = stopCount(c, Seq("der", "die", "und", "das", "ein"))
    val es = stopCount(c, Seq("el", "los", "las", "una", "y"))
    val zh = regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]"))
    when(zh > 0, lit("zh"))
      .when(en >= fr && en >= de && en >= es && en > 0, lit("en"))
      .when(fr >= de && fr >= es && fr > 0, lit("fr"))
      .when(de >= es && de > 0, lit("de"))
      .when(es > 0, lit("es"))
      .otherwise(lit("unknown"))
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

  /** Composite quality score in [0,1]: favors texts that are neither
    * tiny nor enormous, mostly alphabetic, lightly punctuated, with a
    * sane stopword rate. Weights are arbitrary but fixed; the point is a
    * deterministic, portable scoring expression. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(200.0), lit(1.0))
    val alpha = alphaRatio(c)
    val punctPenalty = least(punctRatio(c) * 5.0, lit(1.0))
    val stop = least(stopwordRatio(c) * 4.0, lit(1.0))
    round(lenScore * 0.3 + alpha * 0.4 + stop * 0.2 + (lit(1.0) - punctPenalty) * 0.1, 6)
  }
}
