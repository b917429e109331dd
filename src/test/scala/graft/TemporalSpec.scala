package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** As-of and range join semantics + plan shape. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val snaps = Seq(
    (1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"),
    (3L, 300L, null.asInstanceOf[String]) // matched payload may be NULL
  ).toDF("user_id", "snap_ms", "tag")

  private lazy val pts = Seq(
    (10L, 1L, 99L),   // before any snapshot -> no match
    (11L, 1L, 100L),  // exactly at a snapshot -> matches it (<=)
    (12L, 1L, 199L),  // between -> matches the earlier
    (13L, 1L, 500L),  // after all -> matches the latest
    (14L, 2L, 160L),  // other key
    (15L, 3L, 400L),  // matches the null-payload snapshot
    (16L, 9L, 100L)   // key with no snapshots at all
  ).toDF("event_id", "user_id", "ts_ms")

  test("as-of join picks the latest right row at or before each left " +
    "row; unmatched rows keep nulls") {
    val got = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == ((None, None)))
    assert(got(11L) == ((Some(100L), Some("a"))))
    assert(got(12L) == ((Some(100L), Some("a"))))
    assert(got(13L) == ((Some(200L), Some("b"))))
    assert(got(14L) == ((Some(150L), Some("c"))))
    // the match is the NULL-payload snapshot itself, NOT an older
    // non-null one (the struct trick: ignoreNulls skips unmatched left
    // rows, never a matched right row with a null payload value)
    assert(got(15L) == ((Some(300L), None)))
    assert(got(16L) == ((None, None)))
  }

  test("timeSplits pre-split: one hot key spreads over several window " +
    "partitions and still matches the single-pass result exactly") {
    // ONE key: the single-pass plan serializes all 4000 points through
    // one task; timeSplits=4 must give identical rows
    val r = new scala.util.Random(11)
    val hotSnaps = (0 until 250).map(i =>
      (7L, (r.nextInt(100000) * 2).toLong))
      .distinct.map { case (k, t) => (k, t, s"s$t") }
      .toDF("user_id", "snap_ms", "tag")
    val hotPts = Seq.tabulate(4000)(i =>
      (i.toLong, 7L, (r.nextInt(100000) * 2 + 1).toLong))
      .toDF("event_id", "user_id", "ts_ms")
    def run(splits: Int) = Temporal.asOfJoinBackward(hotPts, hotSnaps,
        Seq("user_id"), "ts_ms", "snap_ms", timeSplits = splits)
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    val split = run(4)
    assert(split == run(1), "timeSplits result differs from single-pass")
    // edge coverage on the fixture (nulls, exact-at, unmatched keys)
    val fixture = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms", timeSplits = 3)
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    val fixtureRef = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(fixture == fixtureRef)
    // the data window must partition on (key, __range) — the hot key
    // is no longer a single task
    val plan = Temporal.asOfJoinBackward(hotPts, hotSnaps,
        Seq("user_id"), "ts_ms", "snap_ms", timeSplits = 4)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition")).toSeq
    assert(windowLines.exists(l =>
      l.contains("user_id") && l.contains("__range")),
      s"window not partitioned by time range:\n$plan")
  }

  test("autoTimeSplits: a hot key triggers splitting, a uniform key " +
    "distribution keeps the single-pass plan; auto result matches") {
    val hot = Seq.tabulate(5000)(i => (i.toLong, 7L, i.toLong * 2 + 1))
      .toDF("event_id", "user_id", "ts_ms")
    val uniform = Seq.tabulate(5000)(i => (i.toLong, i.toLong % 500, i.toLong))
      .toDF("event_id", "user_id", "ts_ms")
    // sample the whole frame: the test is about the decision logic,
    // not the estimator variance
    val hotSplits = Temporal.autoTimeSplits(hot, Seq("user_id"),
      targetRows = 1000, sampleFraction = 1.0)
    assert(hotSplits >= 4 && hotSplits <= 8, s"hotSplits=$hotSplits")
    assert(Temporal.autoTimeSplits(uniform, Seq("user_id"),
      targetRows = 1000, sampleFraction = 1.0) === 1)
    // maxSplits caps; empty input degrades to 1
    assert(Temporal.autoTimeSplits(hot, Seq("user_id"),
      targetRows = 10, sampleFraction = 1.0, maxSplits = 16) === 16)
    assert(Temporal.autoTimeSplits(hot.limit(0), Seq("user_id"),
      targetRows = 1000, sampleFraction = 1.0) === 1)
    // the auto path returns the same rows as the explicit single-pass
    val snapsHot = hot.filter($"event_id" % 10 === 0)
      .select($"user_id", $"ts_ms".as("snap_ms"),
        concat(lit("s"), $"ts_ms").as("tag"))
    val ptsHot = hot.filter($"event_id" % 10 =!= 0)
      .select($"event_id", $"user_id", $"ts_ms")
    val auto = Temporal.asOfJoinBackwardAuto(ptsHot, snapsHot,
        Seq("user_id"), "ts_ms", "snap_ms", targetRows = 1000)
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    val single = Temporal.asOfJoinBackward(ptsHot, snapsHot,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(auto == single)
  }

  test("the registered q_asof_join runs the AUTO path: the skew probe " +
    "executes and picks timeSplits=1 on the uniform events table") {
    Temporal.lastAutoTimeSplits.set(-1)
    val n = SparkEntry.queries("q_asof_join")(spark,
      "/root/testdata/sf0.001").count()
    assert(n > 0)
    assert(Temporal.lastAutoTimeSplits.get() == 1,
      s"probe recorded ${Temporal.lastAutoTimeSplits.get()}")
  }

  test("as-of join equals the quadratic reference on random data") {
    val r = new scala.util.Random(7)
    val rndSnaps = Seq.fill(200)((r.nextInt(5).toLong,
      r.nextInt(1000).toLong)).distinct
      .map { case (k, t) => (k, t, s"v$k-$t") }
      .toDF("user_id", "snap_ms", "tag")
    val rndPts = Seq.tabulate(300)(i =>
      (i.toLong, r.nextInt(6).toLong, r.nextInt(1200).toLong))
      .toDF("event_id", "user_id", "ts_ms")
    val got = Temporal.asOfJoinBackward(rndPts, rndSnaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms")
      .as[(Long, Option[Long])].collect().toMap
    // reference: join-filter-max (fine at test scale)
    val ref = rndPts.join(rndSnaps, Seq("user_id"), "left")
      .filter($"snap_ms".isNull || $"snap_ms" <= $"ts_ms")
      .groupBy($"event_id")
      .agg(max(when($"snap_ms" <= $"ts_ms", $"snap_ms")).as("m"))
      .as[(Long, Option[Long])].collect().toMap
    rndPts.select($"event_id").as[Long].collect().foreach { id =>
      assert(got.getOrElse(id, None) == ref.getOrElse(id, None), s"event $id")
    }
  }

  private lazy val intervals = Seq(
    (100L, 1L, 50L, 250L),  // spans multiple 100ms buckets
    (101L, 1L, 200L, 210L), // inside one bucket
    (102L, 2L, 0L, 1000L)   // long interval
  ).toDF("window_id", "user_id", "start_ms", "end_ms")

  test("range join returns exactly the containment pairs, no " +
    "duplicates across buckets") {
    val p = Seq((1L, 1L, 50L), (2L, 1L, 205L), (3L, 1L, 250L),
      (4L, 1L, 251L), (5L, 2L, 500L), (6L, 9L, 100L))
      .toDF("event_id", "user_id", "ts_ms")
    val got = Temporal.rangeJoin(p, intervals, Seq("user_id"), "ts_ms",
        "start_ms", "end_ms", bucketMs = 100L)
      .select($"event_id", $"window_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L), (2L, 101L), (3L, 100L),
      (5L, 102L)))
  }

  test("range join equals the cross-filter reference on random data") {
    val r = new scala.util.Random(13)
    val rndIv = Seq.tabulate(100) { i =>
      val s0 = r.nextInt(1000).toLong
      (i.toLong, r.nextInt(4).toLong, s0, s0 + r.nextInt(300).toLong)
    }.toDF("window_id", "user_id", "start_ms", "end_ms")
    val rndPts = Seq.tabulate(200)(i =>
      (i.toLong, r.nextInt(5).toLong, r.nextInt(1400).toLong))
      .toDF("event_id", "user_id", "ts_ms")
    val got = Temporal.rangeJoin(rndPts, rndIv, Seq("user_id"), "ts_ms",
        "start_ms", "end_ms", bucketMs = 128L)
      .select($"event_id", $"window_id").as[(Long, Long)].collect()
    val ref = rndPts.as("p").join(rndIv.as("i"),
        $"p.user_id" === $"i.user_id" &&
          $"p.ts_ms".between($"i.start_ms", $"i.end_ms"))
      .select($"event_id", $"window_id").as[(Long, Long)].collect()
    assert(got.sorted.toSeq == ref.sorted.toSeq)
    assert(got.length == got.distinct.length) // bucket fan-out never dups
  }

  test("range join plans as an equi-join — no cartesian or " +
    "broadcast-nested-loop node") {
    val p = Seq((1L, 1L, 50L)).toDF("event_id", "user_id", "ts_ms")
    val plan = Temporal.rangeJoin(p, intervals, Seq("user_id"), "ts_ms",
        "start_ms", "end_ms", bucketMs = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("as-of join: a left row with a NULL time matches nothing") {
    val p = Seq((1L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(150L)),
      (2L, java.lang.Long.valueOf(1L), null))
      .toDF("event_id", "user_id", "ts_ms")
    val got = Temporal.asOfJoinBackward(p, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) == Some(100L))
    // NULL event times sort before every snapshot (ascending, nulls
    // first), so the running last sees no snapshot yet — no match
    assert(got(2L) == None)
  }

  test("as-of join: a RIGHT row with a NULL time never matches (SQL " +
    "ASOF semantics: l.t >= NULL is never true)") {
    val s = Seq((1L, null.asInstanceOf[java.lang.Long], "phantom"),
      (1L, java.lang.Long.valueOf(100L), "real"))
      .toDF("user_id", "snap_ms", "tag")
    val p = Seq((1L, 1L, 50L), (2L, 1L, 150L)).toDF("event_id", "user_id", "ts_ms")
    val got = Temporal.asOfJoinBackward(p, s, Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"tag").as[(Long, Option[String])].collect().toMap
    // before the first real snapshot: NO match (the NULL-time row would
    // otherwise sort first and leak to every early event)
    assert(got(1L) == None)
    assert(got(2L) == Some("real"))
  }

  test("AsOfJoinPlan logical node lowers through the injected " +
    "resolution rule to the same result as the direct composition") {
    // the session is built with spark.sql.extensions=GraftExtensions,
    // so the custom LogicalPlan resolves via ResolveAsOfJoin
    val viaPlan = graft.plans.AsOfJoinPlan.asOf(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    val direct = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(viaPlan == direct)
    assert(viaPlan.nonEmpty)
  }

  test("ASOF LEFT JOIN SQL syntax parses through the injected parser " +
    "and matches the direct composition") {
    pts.createOrReplaceTempView("asof_pts")
    snaps.createOrReplaceTempView("asof_snaps")
    val viaSql = spark.sql(
      """SELECT event_id, matched_snap_ms, tag
        |FROM asof_pts ASOF LEFT JOIN asof_snaps
        |ON asof_pts.user_id = asof_snaps.user_id
        |   AND asof_pts.ts_ms >= asof_snaps.snap_ms""".stripMargin)
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    val direct = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(viaSql == direct)
    assert(viaSql.size == 7)
    // inner ASOF JOIN (DuckDB semantics): unmatched left rows drop
    val inner = spark.sql(
      """SELECT event_id FROM asof_pts ASOF JOIN asof_snaps
        |ON asof_pts.user_id = asof_snaps.user_id
        |   AND asof_pts.ts_ms >= asof_snaps.snap_ms""".stripMargin)
      .as[Long].collect().toSet
    assert(inner == Set(11L, 12L, 13L, 14L, 15L)) // 10 and 16 unmatched
    // the r.t <= l.t orientation is the same backward as-of
    val flipped = spark.sql(
      """SELECT event_id, matched_snap_ms, tag
        |FROM asof_pts ASOF LEFT JOIN asof_snaps
        |ON asof_pts.user_id = asof_snaps.user_id
        |   AND asof_snaps.snap_ms <= asof_pts.ts_ms""".stripMargin)
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(flipped == direct)
    // non-ASOF statements pass through the delegate untouched
    assert(spark.sql("SELECT 1 AS asof").as[Int].head() == 1)
  }

  test("ASOF phrase inside string literals and comments is never " +
    "rewritten") {
    // pure literal/comment occurrences: statement has no real ASOF join,
    // so it must pass through the delegate completely untouched
    val lit = spark.sql(
      "SELECT 'use ASOF JOIN here' AS s -- ASOF LEFT JOIN hint\n" +
        "/* ASOF JOIN in a /* nested */ comment */")
      .as[String].head()
    assert(lit == "use ASOF JOIN here")
    // a real ASOF join alongside literal/comment occurrences: only the
    // real phrase converts, the literal survives byte-for-byte
    pts.createOrReplaceTempView("asof_pts")
    snaps.createOrReplaceTempView("asof_snaps")
    val df = spark.sql(
      """SELECT event_id, 'ASOF JOIN' AS marker /* ASOF JOIN */
        |FROM asof_pts ASOF LEFT JOIN asof_snaps
        |ON asof_pts.user_id = asof_snaps.user_id
        |   AND asof_pts.ts_ms >= asof_snaps.snap_ms""".stripMargin)
    assert(df.count() == 7)
    assert(df.select("marker").distinct().as[String].head() == "ASOF JOIN")
  }

  test("a coincidentally as-of-shaped plain join in the same statement " +
    "keeps plain-join semantics") {
    pts.createOrReplaceTempView("asof_pts")
    snaps.createOrReplaceTempView("asof_snaps")
    // the plain JOIN has the exact key-equality + >= shape the as-of
    // converter looks for; only the phrase-marked join may convert.
    // user 1 at ts 500 covers snapshots at 100 and 200 -> the plain
    // join must yield BOTH rows (as-of would collapse to the latest).
    val plain = spark.sql(
      """SELECT p.event_id, s.snap_ms
        |FROM asof_pts p JOIN asof_snaps s
        |ON p.user_id = s.user_id AND p.ts_ms >= s.snap_ms
        |WHERE p.event_id = 13""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(plain == Set((13L, 100L), (13L, 200L)))
    // same statement carrying a real ASOF join in a subquery AND the
    // plain shaped join: the plain one still returns both matches
    val mixed = spark.sql(
      """SELECT p.event_id, s.snap_ms
        |FROM asof_pts p JOIN asof_snaps s
        |ON p.user_id = s.user_id AND p.ts_ms >= s.snap_ms
        |WHERE p.event_id IN (
        |  SELECT event_id FROM asof_pts ASOF JOIN asof_snaps
        |  ON asof_pts.user_id = asof_snaps.user_id
        |     AND asof_pts.ts_ms >= asof_snaps.snap_ms)""".stripMargin)
      .as[(Long, Long)].collect().toSet
    // event 13 is matched by the inner ASOF (ts 500 >= 200); the outer
    // plain join still fans out to both snapshots
    assert(mixed.filter(_._1 == 13L) == Set((13L, 100L), (13L, 200L)))
  }

  test("ASOF JOIN result columns resolve through the original side " +
    "aliases (DuckDB-ported queries run verbatim)") {
    pts.createOrReplaceTempView("asof_pts")
    snaps.createOrReplaceTempView("asof_snaps")
    // qualified refs in SELECT and WHERE: p.* against the left side,
    // s.snap_ms against the matched right time (DuckDB's spelling)
    val viaSql = spark.sql(
      """SELECT p.event_id, s.snap_ms, s.tag
        |FROM asof_pts p ASOF LEFT JOIN asof_snaps s
        |ON p.user_id = s.user_id AND p.ts_ms >= s.snap_ms
        |WHERE p.event_id > 0""".stripMargin)
    assert(viaSql.columns.toSeq == Seq("event_id", "matched_snap_ms", "tag"))
    val got = viaSql.as[(Long, Option[Long], Option[String])]
      .collect().sortBy(_._1).toSeq
    val direct = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(got == direct)
    // scoping: an outer query CANNOT see through a subquery alias —
    // the same alias name in a sealed inner scope stays untouched
    val scoped = spark.sql(
      """SELECT t.event_id FROM (
        |  SELECT p.event_id FROM asof_pts p ASOF JOIN asof_snaps s
        |  ON p.user_id = s.user_id AND p.ts_ms >= s.snap_ms) t""".stripMargin)
      .as[Long].collect().toSet
    assert(scoped == Set(11L, 12L, 13L, 14L, 15L))
    // an unconverted alias-qualified ref in an outer scope still errors
    // cleanly through the delegate (no silent mis-rewrite)
    intercept[Exception] {
      spark.sql(
        """SELECT s.snap_ms FROM (
          |  SELECT event_id FROM asof_pts ASOF JOIN asof_snaps
          |  ON asof_pts.user_id = asof_snaps.user_id
          |     AND asof_pts.ts_ms >= asof_snaps.snap_ms) t""".stripMargin).collect()
    }
  }

  test("ASOF JOIN key equalities may join DIFFERENT column names; " +
    "output keys carry the left side's names") {
    pts.withColumnRenamed("user_id", "uid")
      .createOrReplaceTempView("asof_pts_uid")
    snaps.createOrReplaceTempView("asof_snaps")
    val viaSql = spark.sql(
      """SELECT p.event_id, p.uid, s.snap_ms, s.tag
        |FROM asof_pts_uid p ASOF LEFT JOIN asof_snaps s
        |ON p.uid = s.user_id AND p.ts_ms >= s.snap_ms""".stripMargin)
    assert(viaSql.columns.toSeq ==
      Seq("event_id", "uid", "matched_snap_ms", "tag"))
    val got = viaSql.select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    val direct = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(got == direct)
    // a key that matches NEITHER orientation errors with guidance
    val err = intercept[Exception] {
      spark.sql(
        """SELECT event_id FROM asof_pts_uid p ASOF JOIN asof_snaps s
          |ON p.no_such = s.nope AND p.ts_ms >= s.snap_ms""".stripMargin)
        .collect()
    }
    assert(err.getMessage.contains("orientation") ||
      err.getMessage.toLowerCase.contains("cannot") ||
      err.getMessage.toLowerCase.contains("resolve"), err.getMessage)
  }

  test("ASOF JOIN keys match case-insensitively and qualifiers pin the " +
    "orientation; an unpinnable two-way pair errors as ambiguous") {
    pts.withColumnRenamed("user_id", "uid")
      .createOrReplaceTempView("asof_pts_uid")
    snaps.createOrReplaceTempView("asof_snaps")
    // case-insensitive ON-clause names (plain Spark SQL would resolve
    // these; the orientation match must too)
    val upper = spark.sql(
      """SELECT p.event_id, s.snap_ms, s.tag
        |FROM asof_pts_uid p ASOF LEFT JOIN asof_snaps s
        |ON p.UID = s.USER_ID AND p.TS_MS >= s.SNAP_MS""".stripMargin)
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    val direct = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(upper == direct)
    // both sides expose BOTH key names: unqualified keys are ambiguous
    // (either orientation would bind) — must error, not silently pick
    // the as-written order
    pts.withColumnRenamed("user_id", "uid").withColumn("user_id", $"uid")
      .createOrReplaceTempView("asof_pts_both")
    snaps.withColumn("uid", $"user_id")
      .createOrReplaceTempView("asof_snaps_both")
    val amb = intercept[Exception] {
      spark.sql(
        """SELECT event_id FROM asof_pts_both p ASOF JOIN asof_snaps_both s
          |ON uid = user_id AND p.ts_ms >= s.snap_ms""".stripMargin)
        .collect()
    }
    assert(amb.getMessage.toLowerCase.contains("ambiguous"), amb.getMessage)
    // the same pair WITH qualifiers orients per the qualifiers — even
    // written right-side-first (`s.user_id = p.uid`, the order the old
    // as-written binding got backwards). On this deliberately
    // conflicted schema the lowering then rejects the rename with a
    // clear error (the right side already exposes the left key's
    // name); the message naming user_id→uid proves the orientation
    // followed the qualifiers, not the written order
    val pinned = intercept[Exception] {
      spark.sql(
        """SELECT event_id FROM asof_pts_both p ASOF JOIN asof_snaps_both s
          |ON s.user_id = p.uid AND p.ts_ms >= s.snap_ms""".stripMargin)
        .collect()
    }
    assert(pinned.getMessage.contains("already exposes") &&
      pinned.getMessage.contains("user_id"), pinned.getMessage)
    // clean schema (no column overlap): the qualified reversed-order
    // pair binds correctly and matches the direct composition
    val reversedOk = spark.sql(
      """SELECT p.event_id, s.snap_ms, s.tag
        |FROM asof_pts_uid p ASOF LEFT JOIN asof_snaps s
        |ON s.user_id = p.uid AND p.ts_ms >= s.snap_ms""".stripMargin)
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(reversedOk == direct)
    // the time inequality validates qualifiers too: putting the RIGHT
    // alias's time on the probe (greater) side names an orientation
    // the backward as-of cannot honor — clear error, not a silent
    // name-only binding (both sides expose both time names here)
    val badTime = intercept[Exception] {
      spark.sql(
        """SELECT event_id FROM asof_pts_both p ASOF JOIN asof_snaps_both s
          |ON p.uid = s.uid AND s.snap_ms >= p.ts_ms""".stripMargin)
        .collect()
    }
    assert(badTime.getMessage.contains("probe time"), badTime.getMessage)
  }

  test("ASOF JOIN multi-key rename chains: a later pair's left name may " +
    "equal an earlier pair's renamed-away right name") {
    // right key user_id renames to uid FIRST; the second pair then
    // renames parent_uid onto the now-free user_id name — the
    // collision guard must consult the renamed frame, not the original
    pts.withColumnRenamed("user_id", "uid").withColumn("user_id", $"uid")
      .createOrReplaceTempView("asof_chain_pts")
    snaps.withColumn("parent_uid", $"user_id")
      .createOrReplaceTempView("asof_chain_snaps")
    val got = spark.sql(
      """SELECT p.event_id, s.snap_ms, s.tag
        |FROM asof_chain_pts p ASOF LEFT JOIN asof_chain_snaps s
        |ON p.uid = s.user_id AND p.user_id = s.parent_uid
        |   AND p.ts_ms >= s.snap_ms""".stripMargin)
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    val direct = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .select($"event_id", $"matched_snap_ms", $"tag")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(got == direct)
  }

  test("ASOF JOIN guards: alias-qualified star errors with guidance; " +
    "the same alias from two sibling ASOF joins is ambiguous") {
    pts.createOrReplaceTempView("asof_pts")
    snaps.createOrReplaceTempView("asof_snaps")
    val star = intercept[Exception] {
      spark.sql(
        """SELECT p.* FROM asof_pts p ASOF LEFT JOIN asof_snaps s
          |ON p.user_id = s.user_id AND p.ts_ms >= s.snap_ms""".stripMargin)
        .collect()
    }
    assert(star.getMessage.contains("flat relation"), star.getMessage)
    // two converted joins in ONE scope both exposing alias `s` — NO
    // sealing subquery alias, so both maps reach the merge and the
    // poison fires: a reference through `s` errors as ambiguous
    // instead of silently taking whichever sibling merged last
    val amb = intercept[Exception] {
      spark.sql(
        """SELECT s.snap_ms FROM
          |(asof_pts p1 ASOF JOIN asof_snaps s
          |   ON p1.user_id = s.user_id AND p1.ts_ms >= s.snap_ms)
          |JOIN
          |(asof_pts p2 ASOF JOIN asof_snaps s
          |   ON p2.user_id = s.user_id AND p2.ts_ms >= s.snap_ms)
          |ON 1 = 1""".stripMargin).collect()
    }
    assert(amb.getMessage.contains("multiple ASOF joins"), amb.getMessage)
    // same guard on the CONVERTED-join merge path: an outer ASOF join
    // reusing a nested converted join's alias
    snaps.select($"user_id", $"snap_ms".as("snap2_ms"), $"tag".as("tag2"))
      .createOrReplaceTempView("asof_snaps2")
    val nested = intercept[Exception] {
      spark.sql(
        """SELECT s.snap_ms FROM
          |(asof_pts p ASOF JOIN asof_snaps s
          |   ON p.user_id = s.user_id AND p.ts_ms >= s.snap_ms)
          |ASOF JOIN asof_snaps2 s
          |ON user_id = s.user_id AND ts_ms >= s.snap2_ms""".stripMargin).collect()
    }
    assert(nested.getMessage.contains("multiple ASOF joins"), nested.getMessage)
    // a multipart table star whose LAST part matches a side alias is
    // NOT the alias — it must not trip the flat-relation guard
    val ok = graft.plans.AsOfSqlParser.rewrite(
      "SELECT db.s.* FROM db.s JOIN x ON 1=1")
    assert(ok.isEmpty) // no ASOF phrase: statement untouched entirely
  }

  test("rewrite scanner: offsets, quotes, comments") {
    import graft.plans.AsOfSqlParser.rewrite
    assert(rewrite("SELECT 1").isEmpty)
    assert(rewrite("SELECT '(ASOF JOIN)' AS s -- ASOF JOIN\n/* ASOF JOIN */").isEmpty)
    val Some((r1, o1)) = rewrite("FROM a ASOF JOIN b ON x"): @unchecked
    assert(r1 == "FROM a JOIN b ON x" && o1 == Seq(7))
    val Some((r2, o2)) = rewrite("FROM a ASOF LEFT OUTER JOIN b"): @unchecked
    assert(r2 == "FROM a LEFT JOIN b" && o2 == Seq(7))
    val Some((r3, o3)) =
      rewrite("FROM a ASOF JOIN b ON x JOIN (SELECT * FROM c ASOF INNER JOIN d ON y) e"): @unchecked
    assert(r3 == "FROM a JOIN b ON x JOIN (SELECT * FROM c JOIN d ON y) e")
    assert(o3 == Seq(7, 41))
    assert(o3.forall(i => r3.regionMatches(true, i, "JOIN", 0, 4) ||
      r3.regionMatches(true, i, "LEFT", 0, 4)))
    // doubled-quote escape keeps the scanner in-string across ''
    val Some((r4, _)) = rewrite("SELECT 'it''s ASOF JOIN x' AS s FROM a ASOF JOIN b ON x"): @unchecked
    assert(r4 == "SELECT 'it''s ASOF JOIN x' AS s FROM a JOIN b ON x")
    // word boundary: an identifier ending in asof is not a phrase start
    assert(rewrite("SELECT myasof JOIN_COL FROM t").isEmpty)
  }

  test("SQL ASOF JOIN lowers to the single-shuffle union plan (no " +
    "join node), same shape as the direct composition") {
    pts.createOrReplaceTempView("asof_pts")
    snaps.createOrReplaceTempView("asof_snaps")
    val plan = spark.sql(
      """SELECT event_id, tag FROM asof_pts ASOF LEFT JOIN asof_snaps
        |ON asof_pts.user_id = asof_snaps.user_id
        |   AND asof_pts.ts_ms >= asof_snaps.snap_ms""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("hashpartitioning".r.findAllIn(plan).size >= 1)
  }

  test("as-of join is a single shuffle on the key (one Exchange over " +
    "the union, no join node at all)") {
    val plan = Temporal.asOfJoinBackward(pts, snaps,
        Seq("user_id"), "ts_ms", "snap_ms")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("hashpartitioning".r.findAllIn(plan).size >= 1)
  }
}
