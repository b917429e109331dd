package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.HashExpressions

/** Deterministic stratified sampling — reproducible corpus
  * downsampling by stratum (language, source, quality band): a row
  * survives iff `fnv64(key) mod 10000 < rate(stratum) * 10000`.
  *
  * Content-hash gating (the `q_split_assign` idea applied to
  * sampling) makes the sample a pure FUNCTION of the data: stable
  * under re-sharding, re-partitioning, replay, and incremental
  * append — the properties `df.sample()` (seeded per-partition RNG)
  * loses the moment partitioning changes, which at 100 TB it always
  * does. Plan shape: broadcast the tiny (stratum → rate) table, one
  * codegen'd hash-filter on the scan — no shuffle, filters push past
  * it, and the survivor fraction per stratum is exact-in-expectation
  * with zero coordination.
  */
object Sampling {

  /** Keep each row of `df` with probability `rates(stratum)` (basis
    * points of 10000; strata absent from `rates` fall back to
    * `defaultRate`), deterministically by `fnv64(keyCol)`. Rates are
    * quantized to 1/10000 — floor(rate * 10000) basis points. */
  def stratifiedSampleByHash(df: DataFrame, stratumCol: Column,
                             keyCol: Column, rates: Map[String, Double],
                             defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be fractions in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val bp = rates.toSeq.map { case (s, r) =>
      (s, math.floor(r * 10000).toLong) }
      .toDF("__stratum", "__rate_bp")
    val defaultBp = math.floor(defaultRate * 10000).toLong
    val h = pmod(HashExpressions.fnv64(keyCol), lit(10000L))
    df.join(broadcast(bp), stratumCol === col("__stratum"), "left")
      .filter(h < coalesce(col("__rate_bp"), lit(defaultBp)))
      .drop("__stratum", "__rate_bp")
  }

  /** Temperature-scaled corpus mixture (the multilingual
    * alpha-sampling of XLM-R / mT5): stratum g with corpus share
    * p_g = n_g/N is sampled at a rate proportional to p_g^alpha / p_g,
    * flattening the mixture toward uniform as alpha -> 0 (alpha = 1
    * is the natural distribution). `targetFrac` of the corpus is kept
    * in expectation; per-stratum rates cap at 1.0 — a stratum hitting
    * the cap contributes all its rows, the standard degenerate case
    * callers resolve by epoch repetition.
    *
    * Plan: ONE metadata-sized aggregation (groupBy(stratum).count,
    * map-combined) collected to the driver computes the rate table —
    * the IVF-header pattern, strata counts are cluster metadata — and
    * the data pass is exactly [[stratifiedSampleByHash]]: broadcast
    * rate dim + codegen hash gate, zero corpus shuffles.
    *
    * Rate arithmetic is ordered (weights summed in stratum-name
    * order, fixed multiply/divide association) so a SQL oracle
    * replays the rates bitwise at alpha = 0.5, where p^alpha is
    * `sqrt` with proven JVM/libm parity; other alphas go through
    * `Math.pow`, which carries no such cross-engine guarantee. */
  def temperatureSample(df: DataFrame, stratumCol: Column, keyCol: Column,
                        alpha: Double = 0.5,
                        targetFrac: Double = 0.25): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetFrac > 0 && targetFrac <= 1,
      s"targetFrac must be in (0, 1], got $targetFrac")
    val counts = df.groupBy(stratumCol.as("__g"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (String.valueOf(r.get(0)), r.getLong(1)))
      .sortBy(_._1)
    require(counts.nonEmpty, "temperatureSample on an empty corpus")
    val total = counts.map(_._2).sum
    def weight(n: Long): Double = {
      val p = n.toDouble / total.toDouble
      if (alpha == 0.5) math.sqrt(p) else math.pow(p, alpha)
    }
    val sumW = counts.foldLeft(0.0)((a, gn) => a + weight(gn._2))
    val rates = counts.map { case (g, n) =>
      g -> math.min(
        targetFrac * total.toDouble * weight(n) / (sumW * n.toDouble), 1.0)
    }.toMap
    stratifiedSampleByHash(df, stratumCol, keyCol, rates)
  }

  /** Keep at most `n` rows per group — domain/source balancing, the
    * "cap docs per domain" rule every crawl-derived corpus applies so
    * one mega-site can't dominate the mixture.
    *
    * Selection is the `n` smallest `(orderCol, tieCol)` per group, so
    * with `orderCol = fnv64(text)` the kept set is a pure function of
    * the data — stable under re-sharding, replay, and append (the
    * [[stratifiedSampleByHash]] argument), and unbiased w.r.t. crawl
    * order; with a quality score it's best-n-per-domain curation.
    * `tieCol` must make the order total or the cap boundary is
    * nondeterministic.
    *
    * Plan shape: `row_number() <= n` lowers to WindowGroupLimit
    * Partial → Exchange(group) → Final, so at most `n` rows per group
    * PER INPUT PARTITION reach the shuffle — exchange volume is
    * O(groups × n × partitions) regardless of corpus size, the same
    * bound as `q_diverse_sample`.
    */
  def capPerGroup(df: DataFrame, groupCol: Column, orderCol: Column,
                  tieCol: Column, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol.asc, tieCol.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Keep the best `frac` of each group by score — the
    * quality-threshold curation rule ("top 60% per language by
    * classifier score") stated as a FRACTION, where [[capPerGroup]]
    * states it as a count.
    *
    * Exact (default): per-group row_number over (score desc, tie asc)
    * kept while rn <= ceil(frac · n_g), with n_g from ONE
    * metadata-sized count aggregate broadcast back — integer-exact,
    * so a SQL replay agrees row-for-row with no float-threshold
    * boundary. Cost is the per-group sort behind the rank window.
    *
    * `approx = true` is the 100 TB swap: a per-group
    * approx_percentile(score, 1 − frac) threshold (t-digest sketch,
    * one map-combined agg) broadcast into a codegen `>=` filter on
    * the scan — no window, no sort, no corpus shuffle; the kept
    * fraction is then approximate near the quantile boundary (the
    * ApproxSwapSpec trade). `tieCol` must make the order total or
    * the exact path's cut boundary is nondeterministic. */
  def topFractionPerGroup(df: DataFrame, groupCol: Column, scoreCol: Column,
                          tieCol: Column, frac: Double,
                          approx: Boolean = false): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    // joins are null-SAFE (<=>): a null group is a group like any
    // other (capPerGroup's window semantics) — a plain equi-join
    // would silently drop every null-group row
    if (approx) {
      val thr = df.groupBy(groupCol.as("__g"))
        .agg(percentile_approx(scoreCol, lit(1.0 - frac), lit(10000))
          .as("__thr"))
      df.join(broadcast(thr), groupCol <=> col("__g"))
        .filter(scoreCol >= col("__thr"))
        .drop("__g", "__thr")
    } else {
      val counts = df.groupBy(groupCol.as("__g"))
        .agg(count(lit(1)).as("__n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCol).orderBy(scoreCol.desc, tieCol.asc)
      df.join(broadcast(counts), groupCol <=> col("__g"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= ceil(lit(frac) * col("__n")))
        .drop("__g", "__n", "__rn")
    }
  }

  /** Per-group score CALIBRATION: replace a raw quality score with its
    * within-group percentile (`percent_rank`), so scores COMPARE
    * across sources before a global threshold or mixture policy is
    * applied — a classifier trained mostly on web text systematically
    * under-scores code or forum text, and a single global cutoff then
    * silently skews the mix; per-source percentiles make "keep the
    * best 30%" mean the same thing in every source. `tieCol` must
    * total-order within a group or the boundary ranks are
    * nondeterministic. One window (hash shuffle on the group key);
    * the 100 TB swap is `topFractionPerGroup`'s approx-percentile
    * threshold when only a CUT is needed, this when the calibrated
    * SCORE itself is the product. */
  def calibrateScores(df: DataFrame, groupCol: Column, scoreCol: Column,
                      tieCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(scoreCol.asc, tieCol.asc)
    df.withColumn("score_pct", percent_rank().over(w))
  }

  /** TOKEN-budget corpus assembly — materialize "exactly N tokens of
    * each source" (the step that turns mixture WEIGHTS into an actual
    * training set): per source, documents are taken in
    * content-hash order (re-shard/re-import stable, like
    * `q_split_assign`) until the source's token budget is reached.
    * The doc that crosses the line is included (overshoot bounded by
    * one document); a missing budget means the source is excluded.
    *
    * Exact form: one window cumsum per source over (hash, id) order —
    * a per-source sort, fine into the billions of rows per source but
    * the wrong tool at extreme scale. There,
    * [[tokenBudgetMixApprox]]: per-source token totals (one agg) set
    * a keep RATE, applied as a codegen hash-gate filter with zero
    * shuffles — expected tokens = budget, the q_corpus_mix shape
    * sized from data instead of hand-set rates. */
  def tokenBudgetMix(docs: DataFrame, idCol: String, textCol: String,
                     sourceCol: String,
                     budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "budgets must not be empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val bdf = budgets.toSeq.toDF("__src", "__budget")
    // top-53 bits of the content hash: non-negative, so the Long
    // ordering here equals the oracle's unsigned HUGEINT ordering
    // (raw fnv64 would sort differently signed vs unsigned)
    val keyed = docs.select(col(idCol), col(sourceCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
        .as("n_tokens"),
      shiftrightunsigned(
        graft.plans.HashExpressions.fnv64(col(textCol)), 11).as("__k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col("__k"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    keyed.join(broadcast(bdf), col(sourceCol) === col("__src"))
      .withColumn("__cumb", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("__cumb") < col("__budget"))
      .select(col(idCol), col(sourceCol), col("n_tokens"))
  }

  /** Deterministic epoch shuffle: the global training order for one
    * epoch as a pure function of the data — pos = rank of
    * mix64(fnv64(key) XOR epoch·GOLDEN) (splitmix64 over the content
    * hash; the epoch folds in by XOR, which cannot overflow under
    * ANSI arithmetic and replays as HUGEINT xor), so every epoch is
    * an independent-looking permutation, re-runs reproduce it exactly,
    * and re-sharding the input cannot change it. This is the order a
    * trainer consumes shards in; feed it to
    * [[graft.operators.Shards.writeTrainingShards]] to lay files out
    * in training order.
    *
    * Plan shape: one codegen hash projection, then
    * [[Surrogate.rangeDenseIds]] for the contiguous global positions —
    * range-partition on the shuffle key + per-partition rank +
    * driver-side offsets (numPartitions METADATA rows), NO
    * single-partition global sort. Ties (hash collisions) break on
    * `idCol`, keeping the order total and the oracle replay exact. */
  def epochShuffle(df: DataFrame, idCol: String, keyCol: Column,
                   epoch: Long, numPartitions: Int = 32): DataFrame = {
    val GOLDEN = 0x9e3779b97f4a7c15L
    val keyed = df.select(col(idCol),
      HashExpressions.mix64(
        HashExpressions.fnv64(keyCol).bitwiseXOR(lit(epoch * GOLDEN)))
        .as("__shuf"))
    Surrogate.rangeDenseIds(keyed, Seq(col("__shuf"), col(idCol)), "pos",
        numPartitions)
      .select(lit(epoch).as("epoch"), col(idCol), col("pos"))
  }

  /** WEIGHTED sampling without replacement, `k` rows per group
    * (Efraimidis & Spirakis 2006): row i survives iff its priority
    * `-ln(u_i) / w_i` is among the group's `k` smallest, where `u_i`
    * is the content-hash uniform (top-53 bits of `fnv64(keyCol)`,
    * the [[tokenBudgetMixApprox]] construction) and `w_i > 0` is the
    * row's weight. This is exactly a sample drawn without replacement
    * with inclusion probability proportional to weight — the
    * exponential-clocks argument: `-ln(u)/w` is an Exp(w) variate,
    * and the k smallest of independent exponential clocks are the
    * first k arrivals. Deterministic: re-runs, re-shards, and
    * incremental appends reproduce the same choices (a new row
    * competes under its own clock; it cannot reshuffle others).
    *
    * The standard uses: "pick 100k docs per language, favoring long
    * ones" (w = token count), "sample training docs by quality
    * weight", "downsample a mega-source in proportion to score".
    * Uniform sampling is the w≡1 special case of this; `capPerGroup`
    * with a hash order key is exactly that.
    *
    * Plan shape: one codegen projection for the clock, then
    * `row_number() <= k` per group, which lowers to WindowGroupLimit
    * Partial → Exchange(group) → Final — at most `k` rows per group
    * per input partition reach the shuffle, the [[capPerGroup]]
    * bound. Rows with `w <= 0` or null are excluded (zero weight =
    * zero inclusion probability; the limit of the formula). `tieCol`
    * breaks (never-observed) equal-clock ties to keep the order
    * total. Null sampling keys are excluded with the nonpositive
    * weights: a null key gives a NULL clock, which an ascending sort
    * would rank FIRST — an always-selected row instead of a
    * proportional one. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: Column, keyCol: Column,
                             weightCol: Column, tieCol: Column,
                             k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val u = (shiftrightunsigned(HashExpressions.fnv64(keyCol), 11)
      .cast("double") + 0.5) / 9007199254740992.0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__clock").asc, tieCol.asc)
    df.filter(weightCol.isNotNull && weightCol > 0 && keyCol.isNotNull)
      .withColumn("__clock", -log(u) / weightCol.cast("double"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__clock", "__rn")
  }

  /** The zero-shuffle scale form of [[tokenBudgetMix]]: keep rate =
    * budget / per-source token total, applied as a uniform-hash gate.
    * Expected kept tokens per source = budget (variance ~ heavy-doc
    * mass); deterministic and re-shard stable like the exact form. */
  def tokenBudgetMixApprox(docs: DataFrame, idCol: String, textCol: String,
                           sourceCol: String,
                           budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "budgets must not be empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val bdf = budgets.toSeq.toDF("__src", "__budget")
    val keyed = docs.select(col(idCol), col(sourceCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
        .as("n_tokens"),
      ((shiftrightunsigned(
          graft.plans.HashExpressions.fnv64(col(textCol)), 11)
          .cast("double") + 0.5) / 9007199254740992.0).as("__u"))
    val totals = keyed.groupBy(col(sourceCol).as("__src2"))
      .agg(sum(col("n_tokens")).as("__total"))
    keyed.join(broadcast(bdf), col(sourceCol) === col("__src"))
      .join(broadcast(totals), col(sourceCol) === col("__src2"))
      .filter(col("__u") <
        least(lit(1.0), col("__budget").cast("double") /
          col("__total").cast("double")))
      .select(col(idCol), col(sourceCol), col("n_tokens"))
  }
}
