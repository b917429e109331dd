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

  /** BM25 lexical retrieval: the top-`k` documents per query term,
    * scored with the standard Okapi formula
    * `idf(t) * tf / (tf + k1 * (1 - b + b * dl/avgdl))`,
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))` — the sparse half of a
    * hybrid (BM25 + embedding) retrieval stack, next to the dense
    * [[Similarity]] paths.
    *
    * Plan shape: one tokenize scan carries the doc length through the
    * explode so a single (doc, term) hash aggregation (map-combined)
    * yields tf AND dl; the term filter sits directly on the exploded
    * tokens, so only query-term occurrences — a vanishing fraction of
    * the corpus — reach that one shuffle. Document frequencies and
    * the corpus stats (N, avgdl: two scalars, collected driver-side)
    * aggregate from the already-tiny tf table and broadcast back.
    * Top-k per term plans WindowGroupLimit: at most k rows per term
    * per partition reach the rank shuffle. Scores are rounded to 6
    * decimals; ties rank by doc id, so the output is deterministic. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms.nonEmpty, "terms must be non-empty")
    val base = docs.select(col(idCol).as("doc_id"),
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
        .as("__ts"))
    val stats = base
      .agg(count(lit(1)).as("n"), sum(size(col("__ts"))).as("sum_dl"))
      .head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n
    val tf = base
      .select(col("doc_id"), size(col("__ts")).cast("long").as("dl"),
        explode(col("__ts")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // expression trees mirror the oracle SQL token for token: every
    // intermediate is IEEE-deterministic (ln parity with libm is
    // pinned by the Box-Muller golden vectors in SimilaritySpec)
    val idf = log(lit(1.0) +
      (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val score = (idf * col("tf")) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    tf.join(broadcast(dfreq), "term")
      .withColumn("score", round(score, 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("rank"), col("score"))
  }
}
