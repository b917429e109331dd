package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.HashExpressions

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * pick raw-corpus documents whose hashed-n-gram distribution looks
  * like a TARGET corpus (the published recipe behind "select
  * web-crawl that reads like Wikipedia/books" pretraining mixes).
  *
  * The pipeline is three declarative stages, each with an explicit
  * 100 TB cost shape:
  *
  *  1. '''Feature distributions''' — bucket counts of hashed unigram
  *     + bigram features over the target and raw corpora
  *     ([[featureCounts]]). One explode + map-combined count each;
  *     the result is `numBuckets` rows — cluster metadata, collected
  *     driver-side like the IVF quantizer header.
  *  2. '''Importance weights''' — per-bucket log-likelihood ratio
  *     λ(b) = log p̂_target(b) − log p̂_raw(b) with add-1 smoothing
  *     ([[importanceWeights]]), a driver-side array of
  *     `numBuckets` doubles.
  *  3. '''Resample''' — per-document importance weight
  *     w(doc) = Σ_f λ(f) over the doc's features, which is EXACTLY
  *     `hashgram_logit(text, λ)` — the classifier-inference kernel
  *     re-used with λ as the weight vector, so feature extraction and
  *     weighting provably share one feature space (and stay inside
  *     whole-stage codegen). Gumbel-top-k then draws `k` docs
  *     without replacement ∝ exp(w): key = w − ln(−ln(u)) with u a
  *     deterministic content-hash uniform, selection = global top-k
  *     by key (TakeOrderedAndProject: per-partition top-k, driver
  *     merges k·partitions rows — no full sort, no shuffle).
  *
  * Determinism: u derives from fnv64("seed:docId"), so the sample is
  * a pure function of (data, seed) — stable under re-sharding and
  * replay (the [[Sampling.stratifiedSampleByHash]] argument), and a
  * SQL oracle replays the entire pipeline: integer bucket counts,
  * the same IEEE divisions for the smoothed probabilities, `ln`
  * per engine (sub-ulp), and the same interleaved feature-order
  * weight fold as `q_classifier_score`.
  */
object Dsir {

  /** Bucket-count distribution of hashed unigram+bigram features:
    * (bucket, cnt) with `bucket` in [0, numBuckets). Missing buckets
    * are absent (add-1 smoothing happens in [[importanceWeights]]).
    * Keep `numBuckets` a power of two — see
    * [[graft.functions.TextHash.hashGramLogit]]'s modulus note. */
  def featureCounts(docs: DataFrame, textCol: String,
                    numBuckets: Int): DataFrame =
    docs.select(explode(
        HashExpressions.hashGramBuckets(col(textCol), numBuckets))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** λ(b) = log((target_b + 1) / (T + B)) − log((raw_b + 1) / (R + B))
    * for every bucket b — the importance log-ratio under add-1
    * smoothed hashed-n-gram bag models. Totals are exact driver-side
    * integer sums; each probability is one IEEE double division of
    * exact longs, so an independent replay reproduces every λ(b) to
    * the `ln` implementation's sub-ulp. */
  def importanceWeights(target: DataFrame, raw: DataFrame,
                        textCol: String, numBuckets: Int): Array[Double] = {
    def dist(df: DataFrame): Array[Long] = {
      val arr = new Array[Long](numBuckets)
      featureCounts(df, textCol, numBuckets).collect()
        .foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      arr
    }
    val t = dist(target)
    val r = dist(raw)
    val tTot = (t.sum + numBuckets).toDouble
    val rTot = (r.sum + numBuckets).toDouble
    Array.tabulate(numBuckets) { b =>
      math.log((t(b) + 1).toDouble / tTot) -
        math.log((r(b) + 1).toDouble / rTot)
    }
  }

  /** Gumbel-top-k importance resample: the `k` documents maximizing
    * w(doc) + g(doc), where w = `hashgram_logit(text, λ)` and
    * g = −ln(−ln(u)) with u the top-53-bit uniform of
    * fnv64("seed:id") — a without-replacement draw ∝ exp(w) (the
    * Gumbel-max trick), deterministic in (data, seed).
    * Returns (idCol, weight, sel_score) rounded to 6, ordered by the
    * unrounded key via global top-k. */
  def importanceResample(raw: DataFrame, idCol: String, textCol: String,
                         lambda: Array[Double], k: Int,
                         seed: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (shiftrightunsigned(
        HashExpressions.fnv64(
          concat_ws(":", lit(seed.toString), col(idCol).cast("string"))),
        11).cast("double") + 0.5) / 9007199254740992.0
    raw.select(col(idCol),
        HashExpressions.hashGramLogit(col(textCol), lambda).as("__w"),
        (-log(-log(u))).as("__g"))
      .select(col(idCol), col("__w"), (col("__w") + col("__g")).as("__key"))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("__w"), 6).as("weight"),
        round(col("__key"), 6).as("sel_score"))
  }

  /** The composed recipe: estimate λ from (target, raw), then draw
    * `k` docs from `raw` ∝ exp(importance weight). */
  def select(target: DataFrame, raw: DataFrame, idCol: String,
             textCol: String, numBuckets: Int, k: Int,
             seed: Long): DataFrame = {
    val lambda = importanceWeights(target, raw, textCol, numBuckets)
    importanceResample(raw, idCol, textCol, lambda, k, seed)
  }
}
