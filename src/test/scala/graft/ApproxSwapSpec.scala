package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB swap-ins documented next to the exact profiling
  * operators (`q_value_quantiles`, `Profile.profile`) are
  * `approx_percentile` / `approx_count_distinct`. These specs pin the
  * error actually incurred on the test data, so the documented swap is
  * a measured trade, not a hope.
  */
class ApproxSwapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_percentile tracks exact percentile within the accuracy " +
    "bound on the events table") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val both = ev.groupBy($"event_type")
      .agg(
        percentile($"value", lit(0.5)).as("exact"),
        percentile_approx($"value", lit(0.5), lit(10000)).as("approx"),
        count(lit(1)).as("n"),
        (max($"value") - min($"value")).as("range"))
      .as[(String, Double, Double, Long, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (et, exact, approx, n, range) =>
      // percentile_approx(accuracy=1e4) bounds RANK error by n/accuracy;
      // translate to a value tolerance via the group's value range
      // (generous: assumes worst-case density). On this data the
      // observed error is far smaller.
      val tol = math.max(range * 0.05, 1e-9)
      assert(math.abs(exact - approx) <= tol,
        s"$et: exact=$exact approx=$approx n=$n tol=$tol")
    }
  }

  test("Profile.profile approxDistinct=true swaps in the HLL sketch " +
    "and tracks the exact profile within the rsd bound") {
    val o = Tables.orders(spark, TestSpark.sf0001)
    val cols = Seq("o_custkey", "o_orderstatus")
    val exact = graft.operators.Profile.profile(o, cols, cols).head()
    val approx = graft.operators.Profile.profile(o, cols, cols,
      approxDistinct = true, rsd = 0.02).head()
    // schemas agree column-for-column; non-null counts are exact in
    // BOTH variants (the swap touches only the distinct aggregates)
    assert(exact.schema.fieldNames.toSeq == approx.schema.fieldNames.toSeq)
    assert(approx.getAs[Long]("n_rows") === exact.getAs[Long]("n_rows"))
    cols.foreach { c =>
      assert(approx.getAs[Long](s"nn_$c") === exact.getAs[Long](s"nn_$c"))
      val (e, a) = (exact.getAs[Long](s"nd_$c").toDouble,
        approx.getAs[Long](s"nd_$c").toDouble)
      assert(math.abs(a - e) / e <= 0.06, s"$c: exact=$e approx=$a")
    }
    // and the plan really is the sketch, not the expand-shuffle
    val plan = graft.operators.Profile.profile(o, cols, cols,
      approxDistinct = true).queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct"), plan)
    assert(!plan.contains("Expand"), s"approx variant still expands:\n$plan")
  }

  test("datasetCard matches hand-computed stats and the approx swap " +
    "keeps schema + near-exact dup rate") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s0", "en"),
      (2L, "alpha beta gamma", "s0", "en"), // exact dup of 1
      (3L, "delta epsilon", "s0", "en"),
      (4L, "zeta", "s0", "en"),
      (5L, "other group here", "s1", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val card = graft.operators.Profile
      .datasetCard(docs, "text", Seq("source", "lang"))
      .orderBy($"source").collect()
    assert(card.length == 2)
    val s0 = card(0)
    assert(s0.getLong(s0.fieldIndex("n_docs")) == 4L)
    assert(s0.getLong(s0.fieldIndex("total_tokens")) == 9L)
    assert(s0.getDouble(s0.fieldIndex("avg_doc_tokens")) == 2.25)
    assert(s0.getDouble(s0.fieldIndex("dup_doc_frac")) == 0.25)
    val approx = graft.operators.Profile
      .datasetCard(docs, "text", Seq("source", "lang"), approxDistinct = true)
      .orderBy($"source").collect()
    assert(approx.head.schema.fieldNames.sameElements(s0.schema.fieldNames))
    // HLL at 4 values is exact in practice; allow one-off drift
    assert(math.abs(approx.head.getDouble(
      approx.head.fieldIndex("dup_doc_frac")) - 0.25) <= 0.25)
  }

  test("approx_count_distinct tracks exact distinct within its " +
    "standard-error bound on the orders table") {
    val o = Tables.orders(spark, TestSpark.sf0001)
    val (exact, approx) = o.agg(
        countDistinct($"o_custkey").cast("double"),
        approx_count_distinct($"o_custkey", 0.02).cast("double"))
      .as[(Double, Double)].head()
    // rsd=0.02 → 3-sigma relative error 6%
    assert(math.abs(approx - exact) / exact <= 0.06,
      s"exact=$exact approx=$approx")
  }

  test("skewReport computes the exact distribution summary and the " +
    "salt that levels the hottest key") {
    // key "hot" 12 rows, "a" 2, "b" 2 → avg 16/3, max 12,
    // skew = 12/(16/3) = 2.25 → suggested salt 3
    val df = (Seq.fill(12)("hot") ++ Seq.fill(2)("a") ++ Seq.fill(2)("b"))
      .toDF("k")
    val r = graft.operators.Profile.skewReport(df, Seq("k")).collect()(0)
    assert(r.getAs[Long]("n_rows") == 16L)
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("max_count") == 12L)
    assert(r.getAs[Double]("skew_factor") == 2.25)
    assert(r.getAs[Long]("suggested_salt") == 3L)
  }

  test("overlapCard counts shared vs new content exactly on a " +
    "hand-built release pair") {
    // A: x (twice — a dup), y; B: y, z, z → distinct_a 2, distinct_b 2,
    // shared {y} = 1, frac 0.5, new {z} = 1
    val a = Seq("x", "x", "y").toDF("text")
    val b = Seq("y", "z", "z").toDF("text")
    val r = graft.operators.Profile.overlapCard(a, b, "text").collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("distinct_a") == 2L && r.getAs[Long]("distinct_b") == 2L)
    assert(r.getAs[Long]("shared") == 1L)
    assert(r.getAs[Double]("frac_a_in_b") == 0.5)
    assert(r.getAs[Long]("new_in_b") == 1L)
  }

  test("schemaDiff reports added/removed/retyped columns and nothing " +
    "else; identical schemas diff clean") {
    import graft.operators.Profile
    val a = Seq((1L, "x", 1.0)).toDF("id", "name", "score")
    val b = Seq((1L, 1, true)).toDF("id", "name", "fresh")
    val got = Profile.schemaDiff(a, b).collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    assert(got === Map("id" -> "unchanged", "name" -> "type_changed",
      "score" -> "removed", "fresh" -> "added"))
    val clean = Profile.schemaDiff(a, a).collect().map(_.getString(5))
    assert(clean.forall(_ == "unchanged"))
  }

  test("rateAnomalies flags a planted spike hour and only that hour") {
    import graft.operators.Profile
    import java.sql.Timestamp
    // 20 steady hours of 10 events + one 200-event spike hour
    val rows = (0 until 20).flatMap { h =>
      val n = if (h == 7) 200 else 10
      (0 until n).map(i =>
        ("push", Timestamp.valueOf(f"2024-01-01 $h%02d:00:${i % 60}%02d")))
    }.toDF("event_type", "ts")
    val got = Profile.rateAnomalies(rows, "event_type", "ts", zThreshold = 3.0)
      .as[(String, Long, Long, Double, Double, Boolean)].collect()
    assert(got.length === 20)
    val anomalies = got.filter(_._6)
    assert(anomalies.map(_._3).toSeq === Seq(200L))
    assert(anomalies.head._5 > 3.0)
    // steady hours sit below the mean with |z| < 3
    assert(got.filterNot(_._6).forall(r => math.abs(r._5) < 3.0))
  }

  test("attritionReport counts stage-by-stage survivors on a crafted " +
    "funnel; frac arithmetic matches hand computation") {
    import graft.operators.Profile
    val docs = (1 to 10).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val report = Profile.attritionReport(docs, Seq(
      "keep_even" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.filter($"id" % 2 === 0)),
      "keep_gt_4" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.filter($"id" > 4))))
      .as[(Int, String, Long, Long, Long, Double)].collect().toSeq
    assert(report == Seq(
      (1, "keep_even", 10L, 5L, 5L, 0.5),
      (2, "keep_gt_4", 5L, 3L, 2L, 0.4)))
  }

  test("calibrateScores: within-group percentiles span [0,1] and make " +
    "scores comparable across differently-scaled groups") {
    import graft.operators.Sampling
    val df = (Seq(("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3),
      ("b", 4L, 10.0), ("b", 5L, 20.0), ("b", 6L, 30.0)))
      .toDF("g", "id", "score")
    val got = Sampling.calibrateScores(df, $"g", $"score", $"id")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    // same percentile for the same in-group rank despite 100× scales
    assert(got(1L) === 0.0 && got(4L) === 0.0)
    assert(got(2L) === 0.5 && got(5L) === 0.5)
    assert(got(3L) === 1.0 && got(6L) === 1.0)
  }

  test("overlapCardSketched tracks the exact overlapCard within sketch " +
    "error on a constructed half-shared release pair") {
    import graft.operators.Profile
    val a = (1 to 400).map(i => s"document number $i with content")
      .toDF("text")
    val b = ((201 to 400).map(i => s"document number $i with content") ++
      (1 to 200).map(i => s"fresh content $i entirely new")).toDF("text")
    val exact = Profile.overlapCard(a, b, "text").collect()(0)
    val est = Profile.overlapCardSketched(a, b, "text", p = 9).collect()(0)
    def close(e: Double, x: Long, tolFrac: Double = 0.2) =
      math.abs(e - x) <= math.max(tolFrac * x, 25.0)
    assert(close(est.getAs[Double]("est_distinct_a"),
      exact.getAs[Long]("distinct_a")))
    assert(close(est.getAs[Double]("est_distinct_b"),
      exact.getAs[Long]("distinct_b")))
    assert(close(est.getAs[Double]("est_shared"), exact.getAs[Long]("shared")))
    assert(math.abs(est.getAs[Double]("est_frac_a_in_b") -
      exact.getAs[Double]("frac_a_in_b")) < 0.1)
  }

  test("release cards merge exactly: partial->merge->finish equals the " +
    "one-shot card, including groups present in only one release") {
    import graft.operators.Profile
    val a = Seq(("s1", "good text here always nice"),
      ("s1", "another doc entirely"), ("s2", "only in release a"))
      .toDF("source", "text")
    val b = Seq(("s1", "good text here always nice"), // exact re-ship
      ("s3", "a brand new source appears")).toDF("source", "text")
    val keys = Seq("source")
    val merged = Profile.finishCard(
      Profile.mergeCards(Seq(
        Profile.releaseCard(a, "text", keys),
        Profile.releaseCard(b, "text", keys)), keys), keys)
    val oneShot = Profile.finishCard(
      Profile.releaseCard(a.unionByName(b), "text", keys), keys)
    val m = merged.collect().map(r => r.getString(0) -> r.toSeq).toMap
    val o = oneShot.collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(m === o)
    assert(m.keySet === Set("s1", "s2", "s3"))
    // the re-shipped s1 doc is a duplicate: est_dup_frac > 0 there
    val s1 = merged.filter($"source" === "s1").collect()(0)
    assert(s1.getAs[Long]("n_docs") === 3L)
    assert(s1.getAs[Double]("est_dup_frac") > 0.2)
  }

  test("tokenDrift scores match a hand-computed JS decomposition; " +
    "identical releases score zero everywhere") {
    val a = Seq("x x y", "z").toDF("text") // counts: x2 y1 z1, n=4
    val b = Seq("x y y", "z").toDF("text") // counts: x1 y2 z1, n=4
    val rows = graft.operators.Profile.tokenDrift(a, b, "text", 10)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    def js(p: Double, q: Double): Double = {
      val m = (p + q) / 2
      0.5 * (if (p > 0) p * math.log(p / m) else 0.0) +
        0.5 * (if (q > 0) q * math.log(q / m) else 0.0)
    }
    // x and y drift symmetrically (0.5 vs 0.25 each way); z is stable.
    // order: equal contribs tie-break on token
    assert(rows.map(_._1) == Seq("x", "y", "z"))
    assert(rows(0)._6 === js(0.5, 0.25))
    assert(rows(1)._6 === js(0.25, 0.5))
    assert(rows(2)._6 === 0.0)
    // identical releases: every contribution exactly 0 (p == q == m)
    val same = graft.operators.Profile.tokenDrift(a, a, "text", 10)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(same.forall(_._6 == 0.0))
  }

  test("tokenDriftCard sums to the hand-computed total and counts " +
    "vocabulary membership") {
    val a = Seq("x x y old").toDF("text") // x2 y1 old1, n=4
    val b = Seq("x y y new").toDF("text") // x1 y2 new1, n=4
    val r = graft.operators.Profile.tokenDriftCard(a, b, "text").collect()(0)
    def js(p: Double, q: Double): Double = {
      val m = (p + q) / 2
      0.5 * (if (p > 0) p * math.log(p / m) else 0.0) +
        0.5 * (if (q > 0) q * math.log(q / m) else 0.0)
    }
    val expected = js(0.5, 0.25) + js(0.25, 0.5) + js(0.25, 0.0) + js(0.0, 0.25)
    assert(math.abs(r.getAs[Double]("js_divergence") - expected) < 1e-12)
    assert(r.getAs[Long]("vocab_union") == 4L)
    assert(r.getAs[Long]("vocab_shared") == 2L)
    assert(r.getAs[Long]("vocab_dropped") == 1L) // "old"
    assert(r.getAs[Long]("vocab_new") == 1L)     // "new"
  }

  test("heavyHitters returns top-k keys by count with exact shares, " +
    "deterministic on ties") {
    val df = (Seq.fill(6)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("w") ++
      Seq("z")).toDF("k")
    val got = graft.operators.Profile.heavyHitters(df, Seq("k"), k = 3)
      .as[(String, Long, Double)].collect().toSeq
    // tie between y and w breaks on key order
    assert(got == Seq(("x", 6L, 0.461538), ("w", 3L, 0.230769),
      ("y", 3L, 0.230769)))
  }
}
