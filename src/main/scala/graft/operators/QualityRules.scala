package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, appendix
  * A1.1) — the named heuristic filter set most corpus pipelines run
  * before any model-based scoring: word-count bounds, mean word
  * length bounds, symbol-to-word ratio, bullet / ellipsis line
  * fractions, alphabetic-word fraction, and a required-stopword
  * floor.
  *
  * Everything is codegen'd built-ins over the raw text column — one
  * narrow projection, no explode, no shuffle, no UDF — so at 100 TB
  * the cost is the byte scan every other text operator already pays,
  * and the filter composes into the same scan pass as tokenize /
  * dedup-hash / langId. Regexes are RE2-safe; the DuckDB oracle
  * replays every rule verbatim.
  *
  * Thresholds are parameters with the paper's defaults; the driver
  * query relaxes `minWords` because the synthetic docs are ~30 words.
  */
object QualityRules {

  /** Rule thresholds (defaults = the paper's published values). */
  case class GopherParams(minWords: Int = 50, maxWords: Int = 100000,
                          minMeanWordLen: Double = 3.0,
                          maxMeanWordLen: Double = 10.0,
                          maxSymbolRatio: Double = 0.1,
                          maxBulletFrac: Double = 0.9,
                          maxEllipsisFrac: Double = 0.3,
                          minAlphaFrac: Double = 0.8,
                          minStopHits: Int = 2)

  /** The paper's required-stopword set (≥ minStopHits hits keeps the doc). */
  private val RequiredStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The raw per-document counting passes every rule derives from —
    * one expression per DISTINCT pass over the text, so a caller that
    * needs several signals (or signals + verdict) can land these in a
    * lower projection and compute every count once. Order: (n_words,
    * non_space_len, symbol_hits, n_lines, bullet_lines,
    * ellipsis_lines, alpha_words, stop_hits). */
  private def countExprs(c: Column): (Column, Column, Column, Column, Column, Column, Column, Column) = {
    val n = graft.plans.RegexCountExpression.regexCount(c, "\\S+")
    val nonSpace = length(replace(c, lit(" "), lit("")))
    // '#' occurrences plus literal ellipses — the paper's "symbols"
    val sym = graft.plans.RegexCountExpression.regexCount(c, "#|\\.\\.\\.")
    // split(limit = -1) keeps trailing empty lines, matching DuckDB's
    // str_split; an empty text is one empty line, so nLines >= 1
    val lines = split(c, "\n", -1)
    val nLines = size(lines)
    val bullets = size(filter(lines, l => l.rlike("^\\s*[-*•]")))
    val ellipses = size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$")))
    // \S* cannot cross whitespace, so each match is one token that
    // contains at least one ASCII letter
    val alphaWords =
      graft.plans.RegexCountExpression.regexCount(c, "\\S*[A-Za-z]\\S*")
    val stopHits = graft.plans.RegexCountExpression.regexCount(lower(c),
      "\\b(" + RequiredStops.mkString("|") + ")\\b")
    (n, nonSpace, sym, nLines, bullets, ellipses, alphaWords, stopHits)
  }

  /** The per-rule signal expressions over precomputed counts. Order:
    * (n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
    * ellipsis_line_frac, alpha_word_frac, stop_hits). */
  private def signalsFrom(n: Column, nonSpace: Column, sym: Column,
                          nLines: Column, bullets: Column, ellipses: Column,
                          alphaWords: Column, stopHits: Column)
      : (Column, Column, Column, Column, Column, Column, Column) = {
    val mwl = when(n === 0, lit(0.0)).otherwise(
      nonSpace.cast("double") / n.cast("double"))
    val symRatio = when(n === 0, lit(0.0)).otherwise(
      sym.cast("double") / n.cast("double"))
    val nLinesD = nLines.cast("double")
    val bulletFrac = bullets.cast("double") / nLinesD
    val ellipsisFrac = ellipses.cast("double") / nLinesD
    val alphaFrac = when(n === 0, lit(0.0)).otherwise(
      alphaWords.cast("double") / n.cast("double"))
    (n, mwl, symRatio, bulletFrac, ellipsisFrac, alphaFrac, stopHits)
  }

  /** The per-rule signal expressions over one text column. Order as
    * [[signalsFrom]]. */
  private def signalExprs(c: Column): (Column, Column, Column, Column, Column, Column, Column) = {
    val (n, nonSpace, sym, nLines, bullets, ellipses, alphaWords, stopHits) =
      countExprs(c)
    signalsFrom(n, nonSpace, sym, nLines, bullets, ellipses, alphaWords,
      stopHits)
  }

  /** The composite keep predicate over one signal tuple. */
  private def keepFrom(sig: (Column, Column, Column, Column, Column, Column, Column),
                       p: GopherParams): Column = {
    val (n, mwl, symRatio, bulletFrac, ellipsisFrac, alphaFrac, stopHits) = sig
    n.between(p.minWords, p.maxWords) &&
      mwl.between(p.minMeanWordLen, p.maxMeanWordLen) &&
      symRatio <= p.maxSymbolRatio &&
      bulletFrac <= p.maxBulletFrac && ellipsisFrac <= p.maxEllipsisFrac &&
      alphaFrac >= p.minAlphaFrac && stopHits >= p.minStopHits
  }

  /** The composite keep predicate over one text column. */
  def keepExpr(c: Column, p: GopherParams = GopherParams()): Column =
    keepFrom(signalExprs(c), p)

  /** Per-document rule signals + the composite `keep` verdict:
    * (idCol, n_words, mean_word_len, symbol_word_ratio,
    * bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    * stop_hits, keep). Ratios are rounded to 6 decimals for the
    * output; `keep` is evaluated on the unrounded values (both
    * engines compute identical IEEE doubles, so the verdict
    * replays exactly). */
  def gopherSignals(df: DataFrame, idCol: String, textCol: String,
                    p: GopherParams = GopherParams()): DataFrame = {
    // two-level projection: the 5 regex/line-scan counting passes land
    // in a lower select ONCE; the signal columns and the keep verdict
    // combine them. The flat form re-evaluated each count for the
    // signal column AND the verdict (and the CASE branches hide the
    // duplicates from codegen subexpression elimination). Identical
    // arithmetic in identical order — bit-equal outputs, oracle-pinned.
    val (nc, nonSpace, sym, nLines, bullets, ellipses, alphaWords, stops) =
      countExprs(col(textCol))
    val sig = signalsFrom(col("__n"), col("__nosp"), col("__sym"),
      col("__nlines"), col("__bullets"), col("__ellipses"),
      col("__alphaw"), col("__stops"))
    val (n, mwl, symRatio, bulletFrac, ellipsisFrac, alphaFrac, stopHits) = sig
    df.select(col(idCol), nc.as("__n"), nonSpace.as("__nosp"),
        sym.as("__sym"), nLines.as("__nlines"), bullets.as("__bullets"),
        ellipses.as("__ellipses"), alphaWords.as("__alphaw"),
        stops.as("__stops"))
      .select(col(idCol), n.cast("long").as("n_words"),
        round(mwl, 6).as("mean_word_len"),
        round(symRatio, 6).as("symbol_word_ratio"),
        round(bulletFrac, 6).as("bullet_line_frac"),
        round(ellipsisFrac, 6).as("ellipsis_line_frac"),
        round(alphaFrac, 6).as("alpha_word_frac"),
        stopHits.cast("long").as("stop_hits"),
        keepFrom(sig, p).as("keep"))
  }

  /** The corpus-path form: rows of `df` that pass every rule, original
    * columns untouched (the predicate composes into the scan). */
  def gopherFilter(df: DataFrame, textCol: String,
                   p: GopherParams = GopherParams()): DataFrame =
    df.filter(keepExpr(col(textCol), p))

  /** Thresholds for the repetition battery (defaults = Rae et al.
    * 2021 table A1: top 2/3/4-gram char fractions, duplicate
    * 5..10-gram char fractions; a doc exceeding ANY is removed). */
  case class RepetitionParams(maxTop: Seq[Double] = Seq(0.20, 0.18, 0.16),
                              maxDup: Seq[Double] =
                                Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)) {
    require(maxTop.length == 3 && maxDup.length == 6,
      "thresholds must cover top 2-4 and dup 5-10")
  }

  /** The A1 repetition battery next to [[gopherSignals]]: per document,
    * the nine char-fraction signals of
    * [[graft.functions.TextHash.gopherRepetition]] as named columns
    * (rounded to 6) plus the composite `keep` verdict evaluated on the
    * unrounded values (each signal is one exact integer-ratio IEEE
    * division, so the verdict replays bitwise in SQL).
    *
    * Plan shape: the kernel counts n-grams PER DOCUMENT inside one
    * codegen projection — no explode, no (doc, gram) shuffle. The
    * explode formulation moves ~9 rows per token through an exchange
    * keyed on (doc, n, gram); this moves zero, which at 100 TB is the
    * difference between a byte-scan-bound signal and a shuffle-bound
    * one. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
                        p: RepetitionParams = RepetitionParams()): DataFrame = {
    val sig = graft.plans.HashExpressions.gopherRepetition(col(textCol))
    val named = Seq("top_2gram_char_frac", "top_3gram_char_frac",
      "top_4gram_char_frac", "dup_5gram_char_frac", "dup_6gram_char_frac",
      "dup_7gram_char_frac", "dup_8gram_char_frac", "dup_9gram_char_frac",
      "dup_10gram_char_frac")
    val limits = p.maxTop ++ p.maxDup
    val keep = (0 until 9).map(i => element_at(col("__sig"), i + 1) <= limits(i))
      .reduce(_ && _)
    df.select(col(idCol), sig.as("__sig"))
      .select(col(idCol) +:
        named.zipWithIndex.map { case (nm, i) =>
          round(element_at(col("__sig"), i + 1), 6).as(nm) } :+
        keep.as("keep"): _*)
  }
}
