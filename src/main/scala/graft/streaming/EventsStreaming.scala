package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch event operators: the same
  * logical transforms declared over `readStream`, with watermarks
  * bounding state. The batch equivalents (SparkEntry `q_window_agg`)
  * hash-shuffle on (window, event_type); the streaming versions keep the
  * identical plan plus state-store-backed incremental aggregation, so
  * the 100 TB/day path is the same code with a streaming source.
  */
object EventsStreaming {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int, total_value: Double)

  /** Tumbling-window counts/sums with a watermark to bound state. */
  def windowedAgg(events: DataFrame, window_dur: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_dur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Gap-based sessionization via flatMapGroupsWithState: a session
    * closes when `gapMinutes` pass without an event for that user.
    * Emits closed sessions (Append mode). State per key = the open
    * session only — O(active users), not O(events).
    *
    * With `closeOnTimeout` (requires `withWatermark("ts", ...)` on the
    * input) the state also registers an event-time timeout at
    * session_end + gap: a user who simply goes idle gets their last
    * session emitted once the watermark passes the gap, instead of the
    * state living forever — mandatory hygiene at 100 TB/day. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMinutes: Int = 30,
                 closeOnTimeout: Boolean = false): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    val timeoutConf =
      if (closeOnTimeout) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[Session]) =>
          if (closeOnTimeout && state.hasTimedOut) {
            // watermark passed session_end + gap with no new events
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            // Sort this batch's events by time; fold them into sessions.
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts.getTime - s.session_end.getTime <= gapMs =>
                  open = Some(s.copy(session_end = e.ts,
                    n_events = s.n_events + 1,
                    total_value = s.total_value + e.value))
                case Some(s) =>
                  closed += s
                  open = Some(Session(userId, e.ts, e.ts, 1, e.value))
                case None =>
                  open = Some(Session(userId, e.ts, e.ts, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              if (closeOnTimeout)
                state.setTimeoutTimestamp(s.session_end.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch twin of [[sessionize]]: gap-based sessions via the classic
    * lag + cumulative-sum-of-new-session-flags window pair, then one
    * aggregation per (user, session). Two logical windows over the SAME
    * (user_id)-partitioning — one shuffle, two in-partition sorts.
    * Millisecond epochs keep the gap comparison integer-exact across
    * engines. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both window orderings use (ms epoch, event_id) so the oracle SQL
    // sorts by the exact same keys
    val wLag = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wCum = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val gapMs = gapMinutes * 60L * 1000L
    val marked = events
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(wLag))
      .withColumn("new_sess",
        when(col("prev_ms").isNull ||
          col("ts_ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
    marked
      .withColumn("session_id",
        sum(col("new_sess")).over(wCum.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
  }

  /** Streaming exact-dedup twin of the batch content dedup: drops
    * repeats of the key columns, with state bounded by the event-time
    * watermark (`dropDuplicatesWithinWatermark` evicts key state once
    * the watermark passes it — without that bound, streaming dedup
    * state grows forever at 100 TB/day). */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming twin of
    * [[graft.operators.Dedup.normalizedDedup]] — continuous
    * "fuzzy exact" dedup: the canonicalized-key hash
    * ([[graft.functions.Normalize.dedupKey]] → sha2) is a STATELESS
    * derived column computed in the scan projection, and the state
    * store holds only that fixed-width hash within the watermark —
    * casing/punctuation/spacing re-ships of a page are dropped just
    * like the batch pass drops them. */
  def normalizedDedupStream(docs: DataFrame, textCol: String = "text",
                            watermark: String = "2 hours"): DataFrame =
    docs.withColumn("__norm_hash",
        sha2(graft.functions.Normalize.dedupKey(col(textCol)), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__norm_hash")
      .drop("__norm_hash")

  /** Streaming benchmark decontamination — the streaming twin of the
    * batch `q_decontaminate` policy: drop every incoming doc sharing a
    * word `k`-shingle with the eval set. The eval shingle set is
    * computed ONCE (driver-side, eval sets are small by nature) and
    * rides into the plan as a literal array, so the stream side is a
    * pure stateless map-side filter — no state store, no watermark, no
    * shuffle; it composes with any downstream streaming stage. The
    * `arrays_overlap(shingles64(text), benchShingles)` predicate is
    * whole-stage-codegen friendly and short-circuits on first hit. */
  def decontaminateStream(docs: DataFrame, benchShingles: Array[Long],
                          textCol: String = "text", k: Int = 5): DataFrame =
    // coalesce(false): a NULL text has no shingles and therefore is
    // NOT contaminated — without the guard the three-valued !NULL
    // silently drops null-text rows the batch twin keeps
    docs.filter(!coalesce(arrays_overlap(
      graft.plans.HashExpressions.shingles64(col(textCol), k),
      lit(benchShingles)), lit(false)))

  /** Driver-side eval-set shingle collection for
    * [[decontaminateStream]] — distinct 64-bit shingle hashes of the
    * (small) benchmark frame. */
  def benchShingleSet(bench: DataFrame, textCol: String = "text",
                      k: Int = 5): Array[Long] =
    bench.select(explode(
        graft.plans.HashExpressions.shingles64(col(textCol), k)).as("sh"))
      .distinct().collect().map(_.getLong(0))

  /** Point-in-time streaming enrichment — the composition a warehouse
    * consumer runs continuously: each micro-batch of events as-of
    * joins ([[graft.operators.Temporal.asOfJoinBackward]]) the SCD-2
    * dimension, resolving every event against the version valid AT THE
    * EVENT'S TIME. `dim` is re-evaluated per batch, so versions that
    * arrived since the last batch are visible to the next one while
    * events that PREDATE a new version still resolve to the old one —
    * that is the point-in-time guarantee [[graft.operators.Scd2]]
    * versioning exists for (a latest-wins dim would silently rewrite
    * history between batches).
    *
    * `foreachBatch` is the standard stream→batch bridge (same pattern
    * as [[graft.Ingest.runUsersStream]]); the enrichment itself is the
    * single-shuffle union+sort as-of plan, per batch. `sink` receives
    * (enriched batch, batch id) — write parquet/Delta, upsert, etc.
    * Pass a checkpoint for exactly-once across restarts. */
  def runAsOfEnrichStream(events: DataFrame, dim: () => DataFrame,
      keys: Seq[String], eventTime: String, dimTime: String,
      checkpoint: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(graft.operators.Temporal.asOfJoinBackward(
          batch, dim(), keys, eventTime, dimTime), id)
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Continuous near-dup filtering against a FROZEN corpus index —
    * the streaming twin of [[graft.operators.NearDup
    * .dedupAgainstIndex]]: each micro-batch of incoming documents
    * drops everything whose exact shingle Jaccard against ANY indexed
    * document reaches `threshold`. This is the incremental-ingest
    * shape at 100 TB: yesterday's corpus is indexed ONCE
    * ([[graft.operators.NearDup.buildNearDupIndex]]); the stream pays
    * only its own signature kernel pass plus probe joins whose
    * corpus side plans zero exchanges (bucketed layout). foreachBatch
    * is the stream→batch bridge (the [[runAsOfEnrichStream]] pattern);
    * `sink` receives (survivors, batchId); pass a checkpoint for
    * exactly-once across restarts. */
  def nearDupFilterStream(docs: DataFrame, tablePrefix: String,
      threshold: Double = 0.7, k: Int = 3, numHashes: Int = 32,
      numBands: Int = 8, rowsPerBand: Int = 4,
      idCol: String = "doc_id", textCol: String = "text",
      checkpoint: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(graft.operators.NearDup.dedupAgainstIndex(
          batch.sparkSession, tablePrefix, batch, threshold,
          k, numHashes, numBands, rowsPerBand, idCol, textCol), id)
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Streaming twin of [[graft.operators.Profile.rateAnomalies]]: the
    * live alert. Hourly per-type counts aggregate under a watermark
    * (append mode — each hour emits once finalized), then LEFT-join
    * the FROZEN historical statistics
    * ([[graft.operators.Profile.rateStats]], broadcast — stream-static,
    * no extra state) and score the same z formula. A type ABSENT from
    * history — the classic misconfigured-upstream flood — has no
    * stats row: it emits with null expected_rate/z_score and
    * `is_anomaly = true` (an unknown type at any volume IS the
    * alert; an inner join would silently swallow exactly that
    * incident). Statistics are deliberately not updated from the
    * stream: an ongoing incident must not teach the detector that the
    * anomaly is the new normal — refresh them from vetted history on
    * a schedule (the near-dup index rebuild policy). Column names
    * parameterized like the batch twins; `stats` must carry
    * (typeCol, mean, variance) as [[graft.operators.Profile.rateStats]]
    * emits them. */
  def rateAnomalyStream(events: DataFrame, stats: DataFrame,
                        zThreshold: Double = 3.0,
                        typeCol: String = "event_type",
                        tsCol: String = "ts",
                        watermark: String = "2 hours"): DataFrame = {
    val buckets = events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col(typeCol), col("n_events"))
    val z = when(col("variance") > 0,
      (col("n_events").cast("double") - col("mean")) /
        sqrt(col("variance"))).otherwise(lit(0.0))
    buckets.join(broadcast(stats), Seq(typeCol), "left")
      .select(col(typeCol), col("hour_epoch"), col("n_events"),
        round(col("mean"), 4).as("expected_rate"),
        when(col("mean").isNull, lit(null).cast("double"))
          .otherwise(round(z, 4)).as("z_score"),
        when(col("mean").isNull, lit(true))
          .otherwise(abs(z) >= zThreshold).as("is_anomaly"))
  }

  /** STREAM-STREAM interval join — the remaining Structured Streaming
    * join shape (the others here are stream-static/as-of): correlate
    * two live event streams per user within a ±`withinMinutes` window
    * (click↔view attribution, request↔error correlation). Watermarks
    * on BOTH sides plus the two-sided time-range predicate are what
    * make unbounded stream-stream join feasible: each side's state
    * store evicts rows once the other side's watermark passes
    * `ts ± within`, so state is bounded by (rate × window), not the
    * stream's history. Inner join — a match emits as soon as both
    * sides have arrived.
    *
    * Inputs need (user_id, ts, event_id, event_type); output one row
    * per qualifying (left, right) pair with the signed lag. Batch
    * twin: [[correlateBatch]] (same predicate as a plain join) —
    * StreamingSpec pins stream == batch. */
  def correlateStreams(left: DataFrame, right: DataFrame,
                       withinMinutes: Int = 5,
                       excludeSelfPairs: Boolean = false,
                       watermark: String = "30 minutes"): DataFrame =
    correlateJoin(
      correlateSide(left, "l").withWatermark("l_ts", watermark),
      correlateSide(right, "r").withWatermark("r_ts", watermark),
      withinMinutes, excludeSelfPairs)

  /** Batch twin of [[correlateStreams]]: the identical projections and
    * join predicate (one shared builder — the stream form only adds
    * the two watermarks) over at-rest frames. A plain range join here;
    * at scale use [[graft.operators.Temporal.rangeJoin]]'s bucketed
    * form. */
  def correlateBatch(left: DataFrame, right: DataFrame,
                     withinMinutes: Int = 5,
                     excludeSelfPairs: Boolean = false): DataFrame =
    correlateJoin(correlateSide(left, "l"), correlateSide(right, "r"),
      withinMinutes, excludeSelfPairs)

  private def correlateSide(df: DataFrame, tag: String): DataFrame =
    df.select(col("user_id").as(s"${tag}_user"), col("ts").as(s"${tag}_ts"),
      col("event_id").as(s"${tag}_id"), col("event_type").as(s"${tag}_type"))

  /** Shared projections + predicate of the two correlate forms.
    * `excludeSelfPairs` guards `l_id =!= r_id` and is ONLY for the
    * case where both sides are slices of the SAME stream (one shared
    * event-id space — q_correlate's shape); with independent streams
    * leave it off, or colliding ids from the two id spaces (and null
    * ids, which make the predicate null) silently drop legitimate
    * pairs. */
  private def correlateJoin(l: DataFrame, r: DataFrame,
                            withinMinutes: Int,
                            excludeSelfPairs: Boolean): DataFrame = {
    val timeBand =
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $withinMinutes MINUTES") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMinutes MINUTES")
    val cond =
      if (excludeSelfPairs) timeBand && col("l_id") =!= col("r_id")
      else timeBand
    l.join(r, cond)
      .select(col("l_user").as("user_id"),
        col("l_id"), col("l_type"), col("l_ts"),
        col("r_id"), col("r_type"), col("r_ts"),
        (unix_timestamp(col("r_ts")) - unix_timestamp(col("l_ts")))
          .as("lag_seconds"))
  }

  /** Batch twin of [[windowedAgg]] used by the oracle-checked query:
    * identical grouping expressed with date_trunc so DuckDB can
    * evaluate the same SQL. */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    events.groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
}
