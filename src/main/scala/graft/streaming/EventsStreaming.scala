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
    * session only — O(active users), not O(events). */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[Session]) =>
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
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Batch twin of [[windowedAgg]] used by the oracle-checked query:
    * identical grouping expressed with date_trunc so DuckDB can evaluate
    * the same SQL. */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    events.groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
}
