package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding token-window document chunking — the sequence-prep step
  * between a cleaned corpus and an LLM training/embedding pipeline:
  * each document becomes ceil(n / step) chunks of up to `chunkSize`
  * whitespace tokens, consecutive chunks sharing `overlap` tokens so
  * no boundary context is lost.
  *
  * Plan shape: tokenize → explode one small integer sequence (the
  * chunk ordinals, ceil(n/step) of them — NOT the tokens) → slice +
  * join per chunk. Entirely narrow: no shuffle, no window, every
  * expression codegen'd, so at 100 TB it rides the scan partitions
  * untouched; downstream shuffles (if any) see chunk-sized rows. The
  * alternative shape — explode tokens, group by (doc, pos div step) —
  * would shuffle every TOKEN; this never shuffles at all.
  */
object Chunking {

  /** Chunk `textCol` into sliding windows of `chunkSize` whitespace
    * tokens advancing by `chunkSize - overlap`. Chunk `i` covers
    * token positions `[i*step, min(i*step + chunkSize, n))`; documents
    * with no tokens yield no rows; the final chunk may be short.
    * Output: `idCols`, `chunk_idx`, `chunk_text`, `n_tokens`. */
  def chunkTokens(df: DataFrame, idCols: Seq[String], textCol: Column,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap for $chunkSize")
    val step = chunkSize - overlap
    val ids = idCols.map(col)
    df.select(ids :+
        regexp_extract_all(textCol, lit("\\S+"), lit(0)).as("__toks"): _*)
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      // ceil(n/step) ordinals: the last window start (ceil(n/step)-1)*step
      // is the largest multiple of step below n
      .select(ids ++ Seq(col("__toks"), col("__n"),
        explode(sequence(lit(0L), expr(s"(__n - 1) div $step")))
          .as("chunk_idx")): _*)
      .select(ids ++ Seq(
        col("chunk_idx"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * step + 1L).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"),
        (least(col("chunk_idx") * step + chunkSize, col("__n"))
          - col("chunk_idx") * step).as("n_tokens")): _*)
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022; the
    * SantaCoder/StarCoder data prep): split each document's text at
    * two DETERMINISTIC character positions `0 <= a <= b <= n` into
    * (prefix, middle, suffix) and emit the PSM-rendered training
    * string `<PRE>prefix<SUF>suffix<MID>middle` — the model learns
    * infilling because the middle moves to the end. SPM mode renders
    * `<PRE><SUF>suffix<MID>prefix·middle`-style joint order; both
    * sentinel sets are caller-supplied so real tokenizer specials can
    * replace the readable defaults.
    *
    * Cut points are a pure function of the content — `a` uniform on
    * [0, n] from the top-53 bits of `fnv64(text)`, `b` uniform on
    * [a, n] from the same hash through one splitmix64 round — so
    * re-runs, re-shards, and epoch regeneration reproduce the exact
    * split (change the text, get a fresh split; the [[graft.operators.Sampling]]
    * determinism argument). Zero-length middle/prefix/suffix are
    * legitimate outcomes (probability ~1/n each), matching the
    * paper's uniform character-level splitting.
    *
    * Plan shape: ONE whole-stage-codegen projection — no shuffle, no
    * explode; at 100 TB this fuses into the ingest scan like
    * [[chunkTokens]]. */
  def fimSplit(df: DataFrame, idCols: Seq[String], textCol: Column,
               preTok: String = "<PRE>", sufTok: String = "<SUF>",
               midTok: String = "<MID>", spm: Boolean = false): DataFrame = {
    import graft.plans.HashExpressions
    val ids = idCols.map(col)
    val base = df.select(ids ++ Seq(textCol.as("__t"),
      length(textCol).cast("long").as("__n"),
      shiftrightunsigned(HashExpressions.fnv64(textCol), 11).as("__h1"),
      shiftrightunsigned(HashExpressions.mix64(HashExpressions.fnv64(textCol)), 11)
        .as("__h2")): _*)
    val a = col("__h1") % (col("__n") + 1L)
    val withCuts = base
      .withColumn("__a", a)
      .withColumn("__b", col("__a") + col("__h2") % (col("__n") - col("__a") + 1L))
    val prefix = substring(col("__t"), lit(1), col("__a").cast("int"))
    val middle = expr("substring(__t, cast(__a as int) + 1, cast(__b - __a as int))")
    val suffix = expr("substring(__t, cast(__b as int) + 1, cast(__n - __b as int))")
    val rendered =
      if (spm) concat(lit(preTok), lit(sufTok), suffix, lit(midTok), prefix, middle)
      else concat(lit(preTok), prefix, lit(sufTok), suffix, lit(midTok), middle)
    withCuts.select(ids ++ Seq(
      prefix.as("fim_prefix"), middle.as("fim_middle"), suffix.as("fim_suffix"),
      rendered.as("fim_text")): _*)
  }
}
