package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.{Event, Session}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming windowed agg over the events table matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables.events(spark, TestSpark.sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Event].collect().toSeq

    val stream = MemoryStream[Event]
    stream.addData(batch)
    val q = EventsStreaming.windowedAgg(stream.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_agg_test")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("win_agg_test")
      .select(unix_timestamp($"window_start").as("h"), $"event_type", $"n_events")
      .as[(Long, String, Long)].collect().toSet
    val batchAgg = EventsStreaming.hourlyAggBatch(
        Tables.events(spark, TestSpark.sf0001))
      .select($"hour_epoch", $"event_type", $"n_events")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batchAgg)
  }

  test("streaming decontamination is a stateless filter matching the " +
    "batch q_decontaminate survivors") {
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val bench = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .filter($"doc_id" % 20 === 0).select($"doc_id", $"text")
    val shingles = EventsStreaming.benchShingleSet(bench)

    val stream = MemoryStream[(Long, String)]
    // a NULL-text row: no shingles -> NOT contaminated; the stream
    // must keep it like the batch twin does (guards the coalesce fix
    // against the three-valued !NULL silently dropping it)
    stream.addData(docs :+ (-1L, null.asInstanceOf[String]))
    val q = EventsStreaming.decontaminateStream(
        stream.toDF().toDF("doc_id", "text"), shingles)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_test")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("decon_test")
      .select($"doc_id").as[Long].collect().toSet
    val batchIds = SparkEntry.queries("q_decontaminate")(spark, TestSpark.sf0001)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed == batchIds + (-1L))
    assert(streamed.size < docs.size + 1)
  }

  test("streaming rate anomalies: live hours scored against frozen " +
    "stats match the batch card on the same data") {
    implicit val sqlCtx = spark.sqlContext
    // history: 20 steady hours of 10 + one spike (hour 7, 200)
    val hist = (0 until 20).flatMap { h =>
      val n = if (h == 7) 200 else 10
      (0 until n).map(i => ("push",
        ts(f"2024-01-01 $h%02d:00:${i % 60}%02d"), i.toLong, 0.0))
    }
    val histDf = hist.toDF("event_type", "ts", "event_id", "value")
      .select($"event_type", $"ts")
    val stats = graft.operators.Profile.rateStats(histDf, "event_type", "ts")
    val batch = graft.operators.Profile
      .rateAnomalies(histDf, "event_type", "ts", zThreshold = 3.0)
      .select($"hour_epoch", $"n_events", $"z_score", $"is_anomaly")
      .as[(Long, Long, Double, Boolean)].collect().toSet

    val stream = MemoryStream[(String, Timestamp)]
    stream.addData(hist.map(e => (e._1, e._2)))
    val q = EventsStreaming
      .rateAnomalyStream(stream.toDF().toDF("event_type", "ts"), stats, 3.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_test")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("anom_test")
      .select($"hour_epoch", $"n_events", $"z_score", $"is_anomaly")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    // append mode: all but the not-yet-finalized final watermark tail
    // emit; everything emitted must equal the batch card's rows
    assert(streamed.nonEmpty && streamed.subsetOf(batch))
    assert(streamed.exists(_._4), "the spike hour must flag in-stream")

    // a type ABSENT from frozen history (misconfigured upstream) must
    // ALERT, not vanish in the stats join
    val s2 = MemoryStream[(String, Timestamp)]
    s2.addData((0 until 50).map(i =>
      ("brand_new_type", ts(f"2024-01-02 00:00:${i % 60}%02d"))) ++
      // a later known-type hour advances the watermark past the hour
      (0 until 3).map(i => ("push", ts(f"2024-01-02 09:00:0$i"))))
    val q2 = EventsStreaming
      .rateAnomalyStream(s2.toDF().toDF("event_type", "ts"), stats, 3.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_unknown")
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val unknown = spark.table("anom_unknown")
      .filter($"event_type" === "brand_new_type")
      .select($"n_events", $"z_score", $"is_anomaly")
      .collect()
    assert(unknown.length === 1)
    assert(unknown.head.getLong(0) === 50L)
    assert(unknown.head.isNullAt(1))
    assert(unknown.head.getBoolean(2), "unknown type must flag as anomaly")
  }

  test("stream-stream interval join (watermarked both sides) matches " +
    "the batch twin on a crafted correlation corpus") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: click at :00, views at :03 and :04 (both within 5 min),
    // view at :20 (outside); user 2: view with no click nearby
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "click"),
      (2L, ts("2024-01-01 10:00:00"), 101L, "click"))
    val views = Seq(
      (1L, ts("2024-01-01 10:03:00"), 200L, "view"),
      (1L, ts("2024-01-01 10:04:30"), 201L, "view"),
      (1L, ts("2024-01-01 10:20:00"), 202L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 203L, "view"))
    val cols = Seq("user_id", "ts", "event_id", "event_type")
    val batch = EventsStreaming.correlateBatch(
        clicks.toDF(cols: _*), views.toDF(cols: _*), withinMinutes = 5)
      .select($"l_id", $"r_id", $"lag_seconds")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch === Set((100L, 200L, 180L), (100L, 201L, 270L)))

    val sc = MemoryStream[(Long, Timestamp, Long, String)]
    val sv = MemoryStream[(Long, Timestamp, Long, String)]
    sc.addData(clicks)
    sv.addData(views)
    val q = EventsStreaming.correlateStreams(
        sc.toDF().toDF(cols: _*), sv.toDF().toDF(cols: _*), withinMinutes = 5)
      .writeStream.outputMode("append")
      .format("memory").queryName("corr_test")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("corr_test")
      .select($"l_id", $"r_id", $"lag_seconds")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("per-micro-batch HLL sketches union to the batch sketch " +
    "byte-identically (the streaming cardinality story)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.plans.{HashExpressions, HllExpressions}
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

    val stream = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch += batch.agg(HllExpressions.hllSketch64(
            HashExpressions.fnv64($"text"), 9).as("sk"))
          .as[Array[Byte]].head()
        (): Unit
      }
      .start()
    // three uneven micro-batches — register merge must be order- and
    // split-insensitive; drain between feeds so each chunk is its own
    // micro-batch
    docs.grouped(math.max(1, docs.size / 3)).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    assert(perBatch.size >= 2, "expected multiple micro-batches")

    val merged = perBatch.toSeq.toDF("sk")
      .agg(HllExpressions.hllUnion($"sk", 9).as("sk"))
      .as[Array[Byte]].head()
    val whole = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .agg(HllExpressions.hllSketch64(
        HashExpressions.fnv64($"text"), 9).as("sk"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("per-micro-batch CMS sketches union to the batch sketch " +
    "byte-identically (streaming frequency story)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.plans.{CmsExpressions, HashExpressions}
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch += batch
          .select(explode(split($"text", "\\s+")).as("tok"))
          .select(HashExpressions.fnv64($"tok").as("__h"))
          .agg(CmsExpressions.cmsSketch64($"__h", 4, 2048).as("sk"))
          .as[Array[Byte]].head()
        (): Unit
      }
      .start()
    docs.grouped(math.max(1, docs.size / 3)).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    assert(perBatch.size >= 2)
    val merged = perBatch.toSeq.toDF("sk")
      .agg(CmsExpressions.cmsUnion($"sk").as("sk")).as[Array[Byte]].head()
    val whole = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(explode(split($"text", "\\s+")).as("tok"))
      .select(HashExpressions.fnv64($"tok").as("__h"))
      .agg(CmsExpressions.cmsSketch64($"__h", 4, 2048).as("sk"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("corpus-prep narrow ops (clean lines -> classifier -> hash gate) " +
    "compose in a stream with exact batch parity") {
    implicit val sqlCtx = spark.sqlContext
    import graft.plans.HashExpressions
    val weights = graft.operators.Classify.seededWeights(256, seed = 5L)
    // the pipeline under test: all scan-side narrow expressions, so
    // the SAME Column stack must run stateless in a stream
    def prep(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select($"doc_id",
          HashExpressions.cleanLines($"text", 2).as("clean_text"))
        .filter(length($"clean_text") > 0)
        .withColumn("logit",
          round(HashExpressions.hashGramLogit($"clean_text", weights), 6))
        .filter(pmod(HashExpressions.fnv64($"clean_text"), lit(10000L)) < 7000)
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id",
        // graft line structure on so cleanLines has work to do
        regexp_replace($"text", "(\\w+) (\\w+) ", "$1 $2.\n").as("text"))
    val batch = prep(docs)
      .as[(Long, String, Double)].collect().toSet
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.as[(Long, String)].collect().toSeq)
    val q = prep(stream.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("prep_test")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("prep_test")
      .as[(Long, String, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("sessionize closes a session after the gap and keeps state per user") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, ""),
      Event(2, ts("2024-01-01 10:10:00"), 7L, "click", 2.0, ""),
      // > 30 min gap -> first session closes
      Event(3, ts("2024-01-01 11:00:00"), 7L, "view", 5.0, ""),
      Event(4, ts("2024-01-01 10:05:00"), 8L, "click", 1.0, "")
    )
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = EventsStreaming.sessionize(spark, stream.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_test")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val closed = spark.table("sessions_test").as[Session].collect().toSeq
    assert(closed.map(s => (s.user_id, s.n_events, s.total_value)) ==
      Seq((7L, 2, 3.0)))
    assert(closed.head.session_start == ts("2024-01-01 10:00:00"))
    assert(closed.head.session_end == ts("2024-01-01 10:10:00"))
  }

  test("sessionize with event-time timeout closes idle users' sessions " +
    "once the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // user 7 goes idle after 10:10; user 8 keeps the watermark moving
    stream.addData(Seq(
      Event(1, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, ""),
      Event(2, ts("2024-01-01 10:10:00"), 7L, "click", 2.0, "")))
    val sessions = EventsStreaming.sessionize(spark,
      stream.toDS().withWatermark("ts", "0 seconds").as[Event],
      gapMinutes = 30, closeOnTimeout = true)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_timeout_test")
      .start()
    q.processAllAvailable()
    // advance the watermark past 10:40 (= 10:10 + 30 min gap)
    stream.addData(Seq(Event(3, ts("2024-01-01 11:00:00"), 8L, "view", 5.0, "")))
    q.processAllAvailable()
    // one more batch so the timeout fires against the advanced watermark
    stream.addData(Seq(Event(4, ts("2024-01-01 11:01:00"), 8L, "view", 1.0, "")))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sessions_timeout_test").as[Session].collect()
      .filter(_.user_id == 7L)
    assert(closed.map(s => (s.n_events, s.total_value)).toSeq == Seq((2, 3.0)),
      s"idle session not closed: ${closed.mkString(",")}")
  }

  test("streaming dedup drops repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "payload-a"),
      Event(2, ts("2024-01-01 10:01:00"), 7L, "click", 1.0, "payload-a"), // dup props
      Event(3, ts("2024-01-01 10:02:00"), 8L, "view", 2.0, "payload-b"),
      Event(4, ts("2024-01-01 10:03:00"), 9L, "view", 3.0, "payload-b") // dup props
    )
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = EventsStreaming.dedupStream(stream.toDF(), keys = Seq("props"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_test")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_test").select($"event_id")
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("streaming normalized dedup drops casing/punctuation re-ships " +
    "like the batch pass") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 7L, "doc", 1.0, "Hello, World! Fine."),
      Event(2, ts("2024-01-01 10:01:00"), 7L, "doc", 1.0, "hello world fine"),
      Event(3, ts("2024-01-01 10:02:00"), 8L, "doc", 2.0, "HELLO -- world FINE"),
      Event(4, ts("2024-01-01 10:03:00"), 9L, "doc", 3.0, "a different page")
    )
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = EventsStreaming.normalizedDedupStream(stream.toDF(),
        textCol = "props")
      .writeStream.outputMode("append")
      .format("memory").queryName("norm_dedup_test")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("norm_dedup_test").select($"event_id")
      .as[Long].collect().toSet
    assert(got == Set(1L, 4L), got.toString)
    // batch twin keeps the same survivors (min-id per normalized key)
    val batch = graft.operators.Dedup.normalizedDedup(
        events.toDF().select($"event_id", $"props"), "props", "event_id")
      .select($"event_id").as[Long].collect().toSet
    assert(batch == got, s"batch $batch vs stream $got")
  }

  test("batch sessionization agrees with the stateful streaming version " +
    "on closed sessions") {
    val events = Tables.events(spark, TestSpark.sf0001)
    val batchSessions = EventsStreaming.sessionizeBatch(events, gapMinutes = 30)
      .select($"user_id", $"n_events", $"session_start_ms")
      .as[(Long, Long, Long)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    stream.addData(events.select($"event_id", $"ts", $"user_id", $"event_type",
      $"value", $"props").as[Event].collect().toSeq)
    val q = EventsStreaming.sessionize(spark, stream.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_vs_batch")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // streaming emits CLOSED sessions only; each must appear in the
    // batch result with identical stats
    val streamed = spark.table("sessions_vs_batch").as[Session].collect()
      .map(s => (s.user_id, s.n_events.toLong, s.session_start.getTime)).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batchSessions),
      s"streaming sessions missing from batch: ${streamed.diff(batchSessions).take(3)}")
  }

  test("streaming enrichment: a micro-batch stream as-of joins the " +
    "SCD-2 versioned dimension inside foreachBatch") {
    // the composition a warehouse consumer runs continuously: events
    // stream in, each batch resolves every event against the dimension
    // version valid AT THE EVENT'S TIME (not the current one)
    implicit val sqlCtx = spark.sqlContext
    val changes = Seq((1L, 100L, "v1"), (1L, 300L, "v2"), (2L, 50L, "w1"))
      .toDF("key", "ts", "payload")
    val events = MemoryStream[(Long, Long, Long)]
    events.addData((10L, 1L, 150L), (11L, 1L, 350L), (12L, 2L, 40L))
    val out = scala.collection.mutable.ArrayBuffer[(Long, Option[String])]()
    val q = events.toDF().toDF("event_id", "key", "ets")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val enriched = graft.operators.Temporal.asOfJoinBackward(
          batch, changes, Seq("key"), "ets", "ts")
        out ++= enriched.select($"event_id", $"payload")
          .as[(Long, Option[String])].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    assert(out.toMap == Map(10L -> Some("v1"), 11L -> Some("v2"),
      12L -> None))
  }

  test("runAsOfEnrichStream: point-in-time-correct enrichment across " +
    "TWO micro-batches while the SCD-2 dimension evolves between them") {
    implicit val sqlCtx = spark.sqlContext
    // the dimension is an evolving SCD-2 change log: versionize is
    // re-applied per batch over whatever changes have arrived
    @volatile var changeLog = Seq((1L, 100L, "v1"), (2L, 50L, "w1"))
    def dim() = graft.operators.Scd2.versionize(
        changeLog.toDF("key", "ts", "payload"), Seq("key"), "ts")
      .select($"key", $"valid_from", $"payload")
    val events = MemoryStream[(Long, Long, Long)]
    val out = scala.collection.mutable.ArrayBuffer[(Long, Option[String])]()
    val q = EventsStreaming.runAsOfEnrichStream(
      events.toDF().toDF("event_id", "key", "ets"), () => dim(),
      Seq("key"), "ets", "valid_from") { (enriched, _) =>
      out ++= enriched.select($"event_id", $"payload")
        .as[(Long, Option[String])].collect()
      ()
    }
    // batch 1: only v1 exists
    events.addData((10L, 1L, 150L))
    q.processAllAvailable()
    // a new dimension version (valid from t=300) lands between batches
    changeLog = changeLog :+ ((1L, 300L, "v2"))
    // batch 2: one event AFTER the new version, one BEFORE it — the
    // pre-dating event must still resolve to v1 (point-in-time), not
    // to the now-current v2 (latest-wins would rewrite history)
    events.addData((11L, 1L, 350L), (12L, 1L, 200L), (13L, 2L, 40L))
    q.processAllAvailable()
    q.stop()
    assert(out.toMap == Map(
      10L -> Some("v1"),
      11L -> Some("v2"),
      12L -> Some("v1"),
      13L -> None))
  }
}
