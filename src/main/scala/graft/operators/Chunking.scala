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
}
