package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model scoring — the standard cheap LM-quality
  * signal for training-data filtering (a CCNet-style perplexity proxy):
  * score(doc) = mean over token occurrences of -ln p(token), with
  * p estimated from the corpus itself.
  *
  * Plan shape: one explode + hash aggregation builds the vocabulary
  * (map-side partial combine shrinks it before the shuffle), the
  * 1-row total and the vocab broadcast back onto the exploded tokens,
  * and one final hash aggregation per doc. Two shuffles total, both on
  * natural keys. At 100 TB: cap the broadcast vocabulary with a
  * minimum-count floor (rare tokens → an UNK probability) — the
  * aggregation/broadcast shape is unchanged. */
object LmScore {

  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("n"))
    toks
      .join(broadcast(vocab), "tok")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(round(avg(-log(col("c").cast("double") / col("n").cast("double"))), 4)
        .as("nll"))
  }

  /** Per-group vocabulary top-k (corpus composition stats): the `k`
    * most frequent tokens per group, count-desc with token tie-break.
    * Two hash aggregations (map-side combine shrinks the exploded
    * tokens to per-partition vocab counts before either shuffle) and a
    * rank window that Spark plans as WindowGroupLimit — at most k rows
    * per group per partition reach the rank shuffle, so the result
    * stage is O(groups·k) regardless of corpus size. */
  def topTokens(docs: DataFrame, groupCol: String, textCol: String,
                k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col(groupCol),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("c").desc, col("tok"))))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("tok"), col("c"), col("rank"))
  }
}
