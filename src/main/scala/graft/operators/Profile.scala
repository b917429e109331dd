package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling for pipeline validation: row count,
  * per-column non-null counts, and distinct counts, all in a single
  * aggregation job (one scan).
  *
  * `approxDistinct = false` (default) uses exact `countDistinct`,
  * which expands to Spark's partial-distinct aggregation — an
  * expand-shuffle proportional to the distinct value volume, and the
  * oracle-comparable variant. At 100 TB pass `approxDistinct = true`:
  * `approx_count_distinct` (HLL++) turns that into a constant-size
  * sketch merge per column — the shuffle carries one sketch per
  * partition instead of every distinct value. `rsd` is the sketch's
  * maximum relative standard deviation (Spark's default 0.05).
  */
object Profile {

  /** Wide profile frame: (n_rows, nn_<col>..., nd_<col>...). */
  def profile(df: DataFrame, cols: Seq[String],
              distinctCols: Seq[String],
              approxDistinct: Boolean = false,
              rsd: Double = 0.05): DataFrame = {
    val aggs =
      cols.map(c => count(col(c)).as(s"nn_$c")) ++
      distinctCols.map(c =>
        (if (approxDistinct) approx_count_distinct(col(c), rsd)
         else countDistinct(col(c))).as(s"nd_$c"))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Dataset card: the per-stratum corpus summary every curated
    * dataset release ships (docs / token volume / duplication /
    * quality per source × language) — the reporting rollup that
    * closes a curation pipeline, over the same codegen signal
    * expressions the filtering operators use.
    *
    * Per group: n_docs, total_tokens, avg_doc_tokens, total_chars,
    * dup_doc_frac (1 − distinct content hashes / docs — the exact-dup
    * rate [[graft.operators.Dedup]] would remove), mean_quality
    * (mean [[graft.functions.TextFunctions.qualityScore]]).
    *
    * ONE scan, ONE hash aggregation keyed on the group columns; the
    * distinct-hash term shuffles 8-byte fnv64 values with map-side
    * partial dedup (never the text). `approxDistinct = true` swaps
    * the exact distinct for the HLL++ sketch — at 100 TB the shuffle
    * then carries one sketch per (group, partition). avg terms are
    * round(4): partial-sum order drift sits far below that
    * resolution (the q_lm_score argument). */
  def datasetCard(df: DataFrame, textCol: String, groupCols: Seq[String],
                  approxDistinct: Boolean = false): DataFrame = {
    val toks =
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
    val h = graft.plans.HashExpressions.fnv64(col(textCol))
    val uniq =
      if (approxDistinct) approx_count_distinct(h) else countDistinct(h)
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(toks).as("total_tokens"),
      round(avg(toks), 4).as("avg_doc_tokens"),
      sum(length(col(textCol)).cast("long")).as("total_chars"),
      round(lit(1.0) - uniq.cast("double") / count(lit(1)).cast("double"), 6)
        .as("dup_doc_frac"),
      round(avg(graft.functions.TextFunctions.qualityScore(col(textCol))), 4)
        .as("mean_quality"))
  }

  /** Schema drift between two releases/frames — the METADATA release
    * gate next to [[overlapCard]] (content) and [[tokenDrift]]
    * (distribution): column-by-column presence, type, and nullability
    * diff, one row per column that exists in either schema with a
    * change verdict ('added' / 'removed' / 'type_changed' /
    * 'nullability_changed' / 'unchanged'). Driver-side metadata only —
    * no job runs; the frame it returns is a local relation sized by
    * column count. The check a 100 TB pipeline runs BEFORE reading
    * anything: a silently re-typed or dropped column fails here, not
    * three hours into the job. */
  def schemaDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val fa = a.schema.fields.map(f => f.name -> f).toMap
    val fb = b.schema.fields.map(f => f.name -> f).toMap
    val names = (a.schema.fields.map(_.name) ++
      b.schema.fields.map(_.name).filterNot(fa.contains)).toSeq
    def bool(b: Boolean): java.lang.Boolean = java.lang.Boolean.valueOf(b)
    names.map { n =>
      (fa.get(n), fb.get(n)) match {
        case (Some(x), None) =>
          (n, x.dataType.simpleString, null: String,
            bool(x.nullable), null: java.lang.Boolean, "removed")
        case (None, Some(y)) =>
          (n, null: String, y.dataType.simpleString,
            null: java.lang.Boolean, bool(y.nullable), "added")
        case (Some(x), Some(y)) =>
          val verdict =
            if (x.dataType != y.dataType) "type_changed"
            else if (x.nullable != y.nullable) "nullability_changed"
            else "unchanged"
          (n, x.dataType.simpleString, y.dataType.simpleString,
            bool(x.nullable), bool(y.nullable), verdict)
        case (None, None) => throw new IllegalStateException(n)
      }
    }.toDF("column", "type_a", "type_b", "nullable_a", "nullable_b",
      "change")
  }

  /** Ingest-rate anomaly card — the monitoring view over an event /
    * ingestion stream: bucket counts per (type, hour), each scored
    * against its type's own rate distribution as a z-score. A stuck
    * upstream (rate collapse) or a replay/loop (rate spike) shows up
    * as |z| over the threshold; the card is the page the on-call
    * looks at, the flag the alert fires on.
    *
    * Variance is computed EXPLICITLY from the integer power sums
    * (n, Σc, Σc²) rather than `stddev` — Welford vs naive stddev
    * implementations differ across engines in the last bits, while
    * integer sums are exact and the derived doubles replay
    * operation-for-operation in the oracle. Two aggregations (bucket
    * counts; per-type power sums — metadata-sized, broadcast back),
    * zero corpus shuffles beyond the bucket count. */
  def rateAnomalies(events: DataFrame, typeCol: String, tsCol: String,
                    zThreshold: Double = 3.0): DataFrame = {
    val buckets = rateBuckets(events, typeCol, tsCol)
    // score against the ONE shared stats definition (rateStats) —
    // batch card, frozen-stats streaming twin, and the DuckDB oracle
    // must all compute mean/variance operation-for-operation alike
    val stats = statsOfBuckets(buckets, typeCol)
      .withColumnRenamed(typeCol, "__t")
    val z = when(col("variance") > 0,
      (col("n_events").cast("double") - col("mean")) /
        sqrt(col("variance"))).otherwise(lit(0.0))
    buckets.join(broadcast(stats), col(typeCol) === col("__t"))
      .select(col(typeCol), col("hour_epoch"), col("n_events"),
        round(col("mean"), 4).as("expected_rate"),
        round(z, 4).as("z_score"),
        (abs(z) >= zThreshold).as("is_anomaly"))
  }

  /** The per-type rate statistics [[rateAnomalies]] scores against,
    * as a standalone frame (typeCol, mean, variance) — freeze these
    * from history and hand them to the STREAMING twin
    * ([[graft.streaming.EventsStreaming.rateAnomalyStream]]), which
    * scores each finalized live hour against them statelessly. */
  def rateStats(events: DataFrame, typeCol: String,
                tsCol: String): DataFrame =
    statsOfBuckets(rateBuckets(events, typeCol, tsCol), typeCol)

  private def rateBuckets(events: DataFrame, typeCol: String,
                          tsCol: String): DataFrame =
    events.groupBy(
        unix_timestamp(date_trunc("hour", col(tsCol))).as("hour_epoch"),
        col(typeCol))
      .agg(count(lit(1)).as("n_events"))

  /** Variance from integer power sums — see [[rateAnomalies]]. */
  private def statsOfBuckets(buckets: DataFrame,
                             typeCol: String): DataFrame =
    buckets.groupBy(col(typeCol))
      .agg(count(lit(1)).as("__nb"),
        sum(col("n_events")).as("__s"),
        sum(col("n_events") * col("n_events")).as("__ss"))
      .select(col(typeCol),
        (col("__s").cast("double") / col("__nb").cast("double")).as("mean"),
        (col("__ss").cast("double") / col("__nb").cast("double") -
          (col("__s").cast("double") / col("__nb").cast("double")) *
          (col("__s").cast("double") / col("__nb").cast("double")))
          .as("variance"))

  /** Stage-by-stage attrition report for a curation pipeline — the
    * funnel table every corpus release ships ("started with N docs,
    * exact dedup removed X%, quality filter Y%, ..."): apply the
    * named stages in order, counting survivors between them. Each
    * inter-stage frame persists until its successor is counted
    * (generation discipline), so stage k runs on stage k-1's
    * materialized survivors, not the re-executed lineage; counts are
    * k+1 aggregate jobs, the report itself is metadata-sized. */
  def attritionReport(input: DataFrame,
                      stages: Seq[(String, DataFrame => DataFrame)])
      : DataFrame = {
    require(stages.nonEmpty, "attritionReport needs at least one stage")
    val spark = input.sparkSession
    import spark.implicits._
    // only persist (and later unpersist) frames THIS method created:
    // blindly persisting the caller's frame would be a no-op on an
    // already-cached input and the later unpersist would evict the
    // CALLER's cache
    val inputOwned = input.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE
    var cur =
      if (inputOwned)
        input.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else input
    var curOwned = inputOwned
    var inCount = cur.count()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
    stages.zipWithIndex.foreach { case ((name, f), i) =>
      val next = f(cur)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val outCount = next.count()
      rows += ((i + 1, name, inCount, outCount))
      if (curOwned) cur.unpersist()
      cur = next
      curOwned = true
      inCount = outCount
    }
    if (curOwned) cur.unpersist()
    rows.toSeq.toDF("stage_idx", "stage", "docs_in", "docs_out")
      .select(col("stage_idx"), col("stage"), col("docs_in"), col("docs_out"),
        (col("docs_in") - col("docs_out")).as("removed"),
        round((col("docs_in") - col("docs_out")).cast("double") /
          col("docs_in").cast("double"), 6).as("frac_removed"))
  }

  /** [[overlapCard]] at SKETCH cost: estimate the cross-release
    * content overlap from two HLL sketches by inclusion-exclusion
    * (`shared ≈ est(A) + est(B) − est(A∪B)`), where the union
    * estimate comes from UNIONING THE SKETCHES — no corpus is read
    * more than once, and when per-release sketches are already
    * persisted (the [[releaseCard]] workflow) no corpus is read at
    * all. The exact card shuffles every distinct content hash; this
    * reads two 512-byte register arrays. Error: the absolute error of
    * each term is ~1%·est (p=9), so the SHARED estimate degrades when
    * the true overlap is much smaller than either side — use the
    * exact [[overlapCard]] when the answer drives a hard gate, this
    * one for the dashboard/trend view. */
  def overlapCardSketched(a: DataFrame, b: DataFrame, textCol: String,
                          p: Int = 9): DataFrame = {
    import graft.plans.{HashExpressions, HllExpressions}
    def sk(df: DataFrame, name: String) = df
      .select(HashExpressions.fnv64(col(textCol)).as("__h"))
      .agg(HllExpressions.hllSketch64(col("__h"), p).as(name))
    val skA = sk(a, "__ska")
    val skB = sk(b, "__skb")
    val skU = skA.select(col("__ska").as("__sk"))
      .unionByName(skB.select(col("__skb").as("__sk")))
      .agg(HllExpressions.hllUnion(col("__sk"), p).as("__sku"))
    val ea = HllExpressions.hllEstimate(col("__ska"))
    val eb = HllExpressions.hllEstimate(col("__skb"))
    val eu = HllExpressions.hllEstimate(col("__sku"))
    skA.crossJoin(broadcast(skB)).crossJoin(broadcast(skU))
      .select(ea.as("est_distinct_a"), eb.as("est_distinct_b"),
        eu.as("est_union"),
        (ea + eb - eu).as("est_shared"),
        round((ea + eb - eu) / ea, 6).as("est_frac_a_in_b"),
        (eu - ea).as("est_new_in_b"))
  }

  /** Mergeable release card — the partial-aggregate (algebraic) form
    * of [[datasetCard]], built so cards COMPOSE across releases: every
    * column is either an integer sum, a double sum, or an HLL sketch
    * ([[graft.plans.HllExpressions]]), all of which merge without
    * touching the corpora again. The incremental-reporting workflow:
    * each release ships `releaseCard` output (one aggregation over
    * the new data only); the running card is `mergeCards` of the
    * stored partials; [[finishCard]] renders the presentation columns
    * ([[datasetCard]]'s shape, with the sketch estimate standing in
    * for the exact distinct). Correctness of the whole
    * partial→merge→finish path is oracle-gated: q_card_incremental
    * builds two release cards, merges them, and must equal DuckDB's
    * direct single-pass replay over the union corpus. */
  def releaseCard(df: DataFrame, textCol: String, groupCols: Seq[String],
                  p: Int = 9): DataFrame = {
    // The sketch is a TypedImperativeAggregate, which forces the whole
    // aggregation into ObjectHashAggregate — and ObjectHashAggregate
    // evaluates its aggregate CHILD expressions interpreted, outside
    // whole-stage codegen. Bind the regex-heavy per-doc expressions to
    // columns in a codegen Project BELOW the aggregate so the
    // interpreted stage sums plain column refs (measured at 10×sf0.1:
    // 8.7 s → ~1.3 s; the same bind-don't-inline rule PLANS.md records
    // for lambda-captured regexes).
    val prepared = df.select(groupCols.map(col) ++ Seq(
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
        .as("__toks"),
      length(col(textCol)).cast("long").as("__chars"),
      graft.functions.TextFunctions.qualityScore(col(textCol)).as("__q"),
      graft.plans.HashExpressions.fnv64(col(textCol)).as("__h")): _*)
    prepared.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__toks")).as("total_tokens"),
      sum(col("__chars")).as("total_chars"),
      sum(col("__q")).as("quality_sum"),
      graft.plans.HllExpressions.hllSketch64(col("__h"), p)
        .as("content_sketch"))
  }

  /** Combine release cards: sums add, sketches union. Groups present
    * in only some cards merge correctly (union + re-aggregate). */
  def mergeCards(cards: Seq[DataFrame], groupCols: Seq[String],
                 p: Int = 9): DataFrame = {
    require(cards.nonEmpty, "mergeCards needs at least one card")
    cards.reduce(_.unionByName(_)).groupBy(groupCols.map(col): _*).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("total_tokens")).as("total_tokens"),
      sum(col("total_chars")).as("total_chars"),
      sum(col("quality_sum")).as("quality_sum"),
      graft.plans.HllExpressions.hllUnion(col("content_sketch"), p)
        .as("content_sketch"))
  }

  /** Presentation columns from a (possibly merged) release card. */
  def finishCard(card: DataFrame, groupCols: Seq[String]): DataFrame = {
    val est = graft.plans.HllExpressions.hllEstimate(col("content_sketch"))
    card.select(groupCols.map(col) ++ Seq(
      col("n_docs"), col("total_tokens"),
      round(col("total_tokens").cast("double") /
        col("n_docs").cast("double"), 4).as("avg_doc_tokens"),
      col("total_chars"),
      est.as("est_distinct"),
      round(lit(1.0) - est / col("n_docs").cast("double"), 6)
        .as("est_dup_frac"),
      round(col("quality_sum") / col("n_docs").cast("double"), 4)
        .as("mean_quality")): _*)
  }

  /** Shuffle-skew diagnosis for a prospective groupBy/join key — the
    * pre-flight a 100 TB job runs BEFORE committing to a partitioning.
    * One row: total rows, distinct keys, max/avg/p50/p99 per-key
    * counts, the skew factor (max/avg), and `suggested_salt` =
    * ceil(max/avg) — the [[Staging.saltedCount]]-style fan-out that
    * levels the heaviest key to ~average partition load (AQE splits
    * skewed SHUFFLE blocks, but pre-aggregation salting is the fix
    * when one key dominates a hash aggregate's build side).
    *
    * Plan: one map-combined count per key + one metadata-sized
    * summary aggregate — the same two-phase shape as any groupBy;
    * nothing but (key, count) pairs shuffle. */
  def skewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    counts.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_count"),
        round(avg(col("cnt")), 6).as("avg_count"),
        percentile(col("cnt"), array(lit(0.5), lit(0.99))).as("__q"),
        (max(col("cnt")).cast("double") / avg(col("cnt"))).as("__skew"))
      .select(col("n_rows"), col("n_keys"), col("max_count"), col("avg_count"),
        round(element_at(col("__q"), 1), 6).as("p50_count"),
        round(element_at(col("__q"), 2), 6).as("p99_count"),
        round(col("__skew"), 6).as("skew_factor"),
        ceil(col("__skew")).cast("long").as("suggested_salt"))
  }

  /** Cross-release overlap card: how much of corpus release A survives
    * into release B, by exact content — the pre-ship diff a curation
    * pipeline runs against the previous release (and the measurement
    * behind "X% new data this release" claims). One row: raw row
    * counts, distinct content counts, the shared-content count, the
    * fraction of A's distinct content present in B, and B's
    * genuinely-new distinct count.
    *
    * Plan: each side is one distinct over sha2 content hashes
    * (fixed-width 8-byte-key shuffles — text never moves), a full
    * outer join on the SAME hash key (co-partitioned with the
    * distincts), one summary aggregate; raw counts ride in as two
    * 1-row crossJoin literals (the LmScore corpus-stats pattern). */
  def overlapCard(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val ha = a.select(sha2(col(textCol), 256).as("__h")).distinct()
      .withColumn("__ina", lit(1L))
    val hb = b.select(sha2(col(textCol), 256).as("__h")).distinct()
      .withColumn("__inb", lit(1L))
    val joined = ha.join(hb, Seq("__h"), "full_outer")
    val na = a.agg(count(lit(1)).as("n_a"))
    val nb = b.agg(count(lit(1)).as("n_b"))
    joined.agg(
        sum(col("__ina")).as("distinct_a"),
        sum(col("__inb")).as("distinct_b"),
        sum(col("__ina") * col("__inb")).as("shared"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("n_a"), col("n_b"), col("distinct_a"), col("distinct_b"),
        col("shared"),
        round(col("shared").cast("double") /
          col("distinct_a").cast("double"), 6).as("frac_a_in_b"),
        (col("distinct_b") - col("shared")).as("new_in_b"))
  }

  /** Per-token Jensen-Shannon drift between two corpus releases'
    * unigram distributions — the distribution-level companion to
    * [[overlapCard]] (which sees only exact-content membership): a
    * release can share 95% of its documents and still shift the token
    * distribution the model trains on (new boilerplate, a source
    * rebalance, a cleaning change). Returns the `topK` most-divergent
    * tokens with their per-side counts, probabilities, and
    * JS contribution `0.5·p·ln(p/m) + 0.5·q·ln(q/m)`, `m = (p+q)/2`
    * (nats; zero-count sides contribute 0 by the 0·ln0 = 0
    * convention). Summing `js_contrib` over ALL tokens (not just the
    * returned top-k) gives the total JS divergence — [[tokenDriftCard]]
    * does that.
    *
    * Plan: one explode + map-combined count aggregation per side, a
    * full outer join on the token key (co-partitioned with the
    * counts), totals as two broadcast 1-row literals, then
    * TakeOrderedAndProject for the top-k — never a global sort; text
    * never shuffles (tokens do, once, as aggregation keys). */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String,
                 topK: Int = 20): DataFrame =
    driftScores(a, b, textCol)
      .orderBy(desc("js_contrib"), asc("token"))
      .limit(topK)

  /** Every token's drift score, unsorted (the frame both public
    * shapes derive from). */
  private def driftScores(a: DataFrame, b: DataFrame,
                          textCol: String): DataFrame = {
    def counts(df: DataFrame, cntName: String) = df
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as(cntName))
    val ca = counts(a, "cnt_a")
    val cb = counts(b, "cnt_b")
    val na = ca.agg(sum(col("cnt_a")).as("__na"))
    val nb = cb.agg(sum(col("cnt_b")).as("__nb"))
    val scored = ca.join(cb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("token"), col("cnt_a"), col("cnt_b"),
        (col("cnt_a").cast("double") / col("__na").cast("double")).as("p_a"),
        (col("cnt_b").cast("double") / col("__nb").cast("double")).as("p_b"))
    val m = (col("p_a") + col("p_b")) / lit(2)
    val termA = when(col("p_a") > 0,
      col("p_a") * log(col("p_a") / m)).otherwise(lit(0.0))
    val termB = when(col("p_b") > 0,
      col("p_b") * log(col("p_b") / m)).otherwise(lit(0.0))
    scored.select(col("token"), col("cnt_a"), col("cnt_b"),
      col("p_a"), col("p_b"),
      (lit(0.5) * termA + lit(0.5) * termB).as("js_contrib"))
  }

  /** 1-row drift summary: total JS divergence (nats, in [0, ln 2]) +
    * vocabulary membership counts. The scalar a release gate
    * thresholds on; [[tokenDrift]] names the tokens responsible. */
  def tokenDriftCard(a: DataFrame, b: DataFrame, textCol: String): DataFrame =
    driftScores(a, b, textCol)
      .agg(sum(col("js_contrib")).as("js_divergence"),
        count(lit(1)).as("vocab_union"),
        sum(when(col("cnt_a") > 0 && col("cnt_b") > 0, 1L).otherwise(0L))
          .as("vocab_shared"),
        sum(when(col("cnt_b") === 0, 1L).otherwise(0L)).as("vocab_dropped"),
        sum(when(col("cnt_a") === 0, 1L).otherwise(0L)).as("vocab_new"))

  /** The keys [[skewReport]] warns about: top-k by row count with
    * their corpus share. TakeOrderedAndProject (per-partition heap +
    * driver merge of k·partitions rows), never a global sort. */
  def heavyHitters(df: DataFrame, keyCols: Seq[String], k: Int): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(keyCols.map(col) :+ col("cnt") :+
        round(col("cnt").cast("double") / col("__total").cast("double"), 6)
          .as("share"): _*)
      .orderBy(col("cnt").desc +: keyCols.map(col): _*)
      .limit(k)
  }
}
