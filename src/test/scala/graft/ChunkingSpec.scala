package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunking, LmScore, Sampling}

/** The round-8 corpus-prep trio: sliding token-window chunking,
  * deterministic stratified sampling, and BM25 lexical retrieval. */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The operator's contract, in plain Scala. */
  private def naiveChunks(text: String, size: Int, overlap: Int):
      Seq[(Long, String, Long)] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val step = size - overlap
    if (toks.isEmpty) Seq.empty
    else (0 until (toks.length + step - 1) / step).map { i =>
      val slice = toks.slice(i * step, math.min(i * step + size, toks.length))
      (i.toLong, slice.mkString(" "), slice.length.toLong)
    }
  }

  test("chunkTokens equals the naive sliding window on edge shapes: " +
    "short doc, exact fit, off-by-one tails, whitespace runs, empty") {
    val docs = Seq(
      1L -> "one two three",                         // n < size: one short chunk
      2L -> (1 to 8).map(i => s"t$i").mkString(" "), // n == size
      3L -> (1 to 9).map(i => s"t$i").mkString(" "), // one past: 2nd chunk
      4L -> (1 to 21).map(i => s"t$i").mkString(" "),// several, short tail
      5L -> "  leading   and\ttab\nnewline  spaced ",// tokenizer robustness
      6L -> "",                                      // no tokens: no rows
      7L -> "   "                                    // whitespace only
    ).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(docs, Seq("doc_id"), col("text"),
        chunkSize = 8, overlap = 3)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq
        .map(r => (r._2, r._3, r._4))).toMap
    val want = Seq(
      1L -> "one two three",
      2L -> (1 to 8).map(i => s"t$i").mkString(" "),
      3L -> (1 to 9).map(i => s"t$i").mkString(" "),
      4L -> (1 to 21).map(i => s"t$i").mkString(" "),
      5L -> "  leading   and\ttab\nnewline  spaced ")
      .map { case (id, txt) => id -> naiveChunks(txt, 8, 3) }.toMap
    assert(got == want, s"got $got\nwant $want")
  }

  test("chunk coverage: every token position lands in >=1 chunk and " +
    "consecutive chunks share exactly `overlap` tokens (random docs)") {
    val rnd = new scala.util.Random(42)
    val docs = (1L to 50L).map(i =>
      (i, (0 until rnd.nextInt(40)).map(j => s"w${rnd.nextInt(9)}_$j")
        .mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(docs, Seq("doc_id"), col("text"), 10, 4)
      .as[(Long, Long, String, Long)].collect().groupBy(_._1)
    docs.as[(Long, String)].collect().foreach { case (id, txt) =>
      val toks = txt.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) assert(!got.contains(id))
      else {
        val chunks = got(id).sortBy(_._2).map(_._3.split(" ").toSeq)
        // stitching at stride `step` reproduces the token stream
        val stitched = chunks.head ++ chunks.tail.flatMap(_.drop(4))
        assert(stitched == toks.toSeq, s"doc $id: $stitched vs ${toks.toSeq}")
        chunks.sliding(2).foreach {
          // the final chunk may be shorter than the overlap itself
          // a short final chunk sits entirely inside its predecessor's
          // tail (both end at n), so the shared run is a's LAST m tokens
          case Array(a, b) =>
            val m = math.min(4, b.length)
            assert(a.takeRight(m) == b.take(m),
              s"doc $id: overlap mismatch between $a and $b")
          case _ =>
        }
      }
    }
  }

  test("stratifiedSampleByHash keeps exactly the hash-gated rows, is " +
    "invariant under re-partitioning, and respects per-stratum rates") {
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"lang", $"text")
    val rates = Map("en" -> 0.2, "de" -> 0.0)
    val expected = docs
      .withColumn("hm",
        pmod(graft.plans.HashExpressions.fnv64($"text"), lit(10000L)))
      .filter($"hm" < when($"lang" === "en", 2000L)
        .when($"lang" === "de", 0L).otherwise(5000L))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val got = Sampling.stratifiedSampleByHash(docs, $"lang", $"text",
        rates, defaultRate = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.size < expected.size + 1)
    // re-sharding must not move the sample (the df.sample() failure mode)
    val reshuffled = Sampling.stratifiedSampleByHash(
        docs.repartition(17, $"doc_id"), $"lang", $"text",
        rates, defaultRate = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(reshuffled == got)
    // a zero-rate stratum drops entirely; output schema is the input's
    val langs = Sampling.stratifiedSampleByHash(docs, $"lang", $"text",
      rates, defaultRate = 0.5).select($"lang").distinct()
      .as[String].collect().toSet
    assert(!langs.contains("de"), s"zero-rate stratum survived: $langs")
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSampleByHash(docs, $"lang", $"text", Map("en" -> 1.5))
    }
  }

  test("temperatureSample flattens the mixture toward uniform, matches " +
    "the plain-Scala rate replay, and is re-partitioning invariant") {
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"lang", $"text")
    val got = Sampling.temperatureSample(docs, $"lang", $"text",
        alpha = 0.5, targetFrac = 0.25)
      .select("doc_id").as[Long].collect().toSet
    // rate replay in plain Scala (same op order), then the hash gate
    val corpus = docs.as[(Long, String, String)].collect()
    val counts = corpus.groupBy(_._2).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val total = counts.map(_._2).sum
    val sumW = counts.foldLeft(0.0)((a, gn) =>
      a + math.sqrt(gn._2.toDouble / total.toDouble))
    val bp = counts.map { case (g, n) =>
      val r = math.min(0.25 * total.toDouble *
        math.sqrt(n.toDouble / total.toDouble) / (sumW * n.toDouble), 1.0)
      g -> math.floor(r * 10000).toLong
    }.toMap
    val want = corpus.filter { case (_, lang, text) =>
      java.lang.Math.floorMod(graft.functions.TextHash.fnv64(
        org.apache.spark.unsafe.types.UTF8String.fromString(text)), 10000L) <
        bp(lang)
    }.map(_._1).toSet
    assert(got == want)
    // flattening: rarer languages sample at a HIGHER rate than 'en'
    val en = bp("en")
    counts.filter(_._1 != "en").foreach { case (g, n) =>
      assert(bp(g) > en, s"stratum $g (n=$n) rate ${bp(g)} <= en rate $en")
    }
    // pure function of the data: partitioning must not change the set
    val reshuffled = Sampling.temperatureSample(docs.repartition(13),
        $"lang", $"text", alpha = 0.5, targetFrac = 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(reshuffled == got)
    // a stratum pushed past rate 1.0 caps (upsampling would need
    // epoch repetition, not a >1 gate)
    val tiny = docs.filter($"lang" =!= "en").limit(3)
      .unionByName(docs.filter($"lang" === "en"))
    val capped = Sampling.temperatureSample(tiny, $"lang", $"text",
      alpha = 0.5, targetFrac = 0.9)
    assert(capped.count() > 0)
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(docs, $"lang", $"text", alpha = 0.0)
    }
  }

  test("bm25TopK equals a naive in-memory Okapi BM25 on the testdata") {
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val terms = Seq("table", "join", "zebra") // zebra: df=0, no rows
    val k = 5
    val corpus = docs.as[(Long, String)].collect()
    val tokenized = corpus.map { case (id, txt) =>
      id -> "[a-z0-9]+".r.findAllIn(txt.toLowerCase).toSeq }.toMap
    val n = corpus.length.toLong
    val avgdl = tokenized.values.map(_.length.toLong).sum.toDouble / n
    val want = terms.flatMap { term =>
      val tfs = tokenized.toSeq
        .map { case (id, ts) => id -> ts.count(_ == term).toLong }
        .filter(_._2 > 0)
      val df = tfs.size.toLong
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      tfs.map { case (id, tf) =>
        val dl = tokenized(id).length.toLong
        val s = (idf * tf) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        (term, id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }.sortBy { case (_, id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((t, id, s), i) => (t, id, i + 1, s) }
    }.toSet
    val got = LmScore.bm25TopK(docs, "doc_id", "text", terms, k)
      .as[(String, Long, Int, Double)].collect().toSet
    assert(got == want, s"diff: ${got.diff(want)} / ${want.diff(got)}")
    assert(!got.exists(_._1 == "zebra"))
  }

  test("persisted BM25 index: same answers as inline BM25, bucket-pruned " +
    "postings scan, zero postings-side exchanges") {
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val terms = Seq("table", "join", "vector")
    LmScore.buildBm25Index(docs, "bm25_index_test", numBuckets = 8)
    try {
      val inline = LmScore.bm25TopK(docs, "doc_id", "text", terms, k = 5)
        .as[(String, Long, Int, Double)].collect().toSet
      val indexed = LmScore.bm25TopKIndexed(spark, "bm25_index_test",
          terms, k = 5)
        .as[(String, Long, Int, Double)].collect().toSet
      assert(indexed == inline,
        s"diff: ${indexed.diff(inline)} / ${inline.diff(indexed)}")
      // the postings layout must satisfy BOTH the df aggregation and
      // the per-term rank window: no hash exchange on term anywhere,
      // and the IN filter prunes the bucketed scan to the terms'
      // buckets (dfreq rides an explicit broadcast, which survives a
      // disabled auto-broadcast threshold)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = LmScore.bm25TopKIndexed(spark, "bm25_index_test",
          terms, k = 5).queryExecution.executedPlan.toString
        assert(!plan.linesIterator.exists(l =>
          l.contains("Exchange hashpartitioning") && l.contains("term")),
          s"postings side shuffled on term:\n$plan")
        val buckets = plan.linesIterator
          .find(_.contains("SelectedBucketsCount")).getOrElse("")
        assert(buckets.contains("SelectedBucketsCount"),
          s"no bucket pruning in scan:\n$plan")
        val sel = "SelectedBucketsCount: (\\d+) out of 8".r
          .findFirstMatchIn(buckets).map(_.group(1).toInt)
        assert(sel.exists(_ < 8), s"scan read all buckets: $buckets")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bm25_index_test")
      spark.sql("DROP TABLE IF EXISTS bm25_index_test_stats")
    }
  }

  test("BM25 index append: build on half the corpus + append the rest " +
    "equals inline BM25 over the full corpus (stats row advanced)") {
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val halfA = docs.filter($"doc_id" % 2 === 0)
    val halfB = docs.filter($"doc_id" % 2 =!= 0)
    val terms = Seq("table", "join")
    LmScore.buildBm25Index(halfA, "bm25_append_test", numBuckets = 8)
    try {
      LmScore.appendToBm25Index(halfB, "bm25_append_test", numBuckets = 8)
      val indexed = LmScore.bm25TopKIndexed(spark, "bm25_append_test",
          terms, k = 5)
        .as[(String, Long, Int, Double)].collect().toSet
      val inline = LmScore.bm25TopK(docs, "doc_id", "text", terms, k = 5)
        .as[(String, Long, Int, Double)].collect().toSet
      // scores depend on N/avgdl/df, so parity here proves the stats
      // row absorbed the delta exactly as a full rebuild would
      assert(indexed == inline,
        s"diff: ${indexed.diff(inline)} / ${inline.diff(indexed)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bm25_append_test")
      spark.sql("DROP TABLE IF EXISTS bm25_append_test_stats")
    }
  }

  test("capPerGroup keeps exactly the n smallest (hash, tiebreak) per " +
    "group and is stable under re-partitioning") {
    import graft.plans.HashExpressions
    val rows = (1L to 40L).map { i =>
      (i, s"src${i % 4}", s"document number $i with text payload") }
    val df = rows.toDF("doc_id", "source", "text")
    val got = Sampling.capPerGroup(df, col("source"),
        HashExpressions.fnv64(col("text")), col("doc_id"), n = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // contract replayed in plain Scala with the same hash
    val want = rows.groupBy(_._2).values.flatMap { g =>
      g.map { case (id, _, text) =>
        (graft.functions.TextHash.fnv64(
          org.apache.spark.unsafe.types.UTF8String.fromString(text)), id)
      }.sorted.take(3).map(_._2)
    }.toSeq.sorted
    assert(got == want)
    assert(got.size == 12)
    // re-sharding must not move the cap boundary
    val reshuffled = Sampling.capPerGroup(df.repartition(7), col("source"),
        HashExpressions.fnv64(col("text")), col("doc_id"), n = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(reshuffled == want)
  }

  test("topFractionPerGroup keeps exactly ceil(frac*n) best rows per group; " +
    "the approx swap keeps a near-identical set with no window in the plan") {
    val rows = (1L to 30L).map(i => (i, s"g${i % 3}", (i % 10).toDouble))
    val df = rows.toDF("id", "g", "score")
    val got = Sampling.topFractionPerGroup(df, col("g"), col("score"),
        col("id"), frac = 0.5)
      .select("id").as[Long].collect().toSet
    // replay: per group, sort by (score desc, id asc), take ceil(0.5*10)=5
    val want = rows.groupBy(_._2).values.flatMap(g =>
      g.sortBy { case (id, _, s) => (-s, id) }.take(5).map(_._1)).toSet
    assert(got == want)
    val approxDf = Sampling.topFractionPerGroup(df, col("g"), col("score"),
      col("id"), frac = 0.5, approx = true)
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"approx path should not sort/window:\n$plan")
    val ap = approxDf.select("id").as[Long].collect().toSet
    // t-digest boundary slack: the approx cut can drift by the tied
    // boundary rows but must agree on the clear interior
    assert((got.size - (got & ap).size) <= got.size / 3, s"approx far off: $ap vs $got")
  }

  test("rrfFuse matches the hand-computed reciprocal-rank fusion, " +
    "including docs present in only one list") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (4L, 2)).toDF("doc_id", "rank")
    val got = LmScore.rrfFuse(a, b, "doc_id", kRrf = 60, k = 10)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toSeq
    def rr(r: Int) = 1.0 / (60 + r)
    // doc 3: both lists (rank 3 + rank 1) -> highest fused score
    assert(got.head._1 === 3L)
    assert(math.abs(got.head._4 - math.rint((rr(3) + rr(1)) * 1e6) / 1e6) < 1e-9)
    assert(got.map(_._1) === Seq(3L, 1L, 2L, 4L))
    // one-sided docs carry a null rank for the missing list
    assert(got.find(_._1 == 1L).get._3.isEmpty)
    assert(got.find(_._1 == 4L).get._2.isEmpty)
  }

  test("tokenBudgetMix: per-source kept tokens reach the budget with at " +
    "most one doc of overshoot; the approx hash-gate form lands near " +
    "the budget with zero shuffles of the corpus") {
    val docs = (1 to 200).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      (i.toLong, src, Seq.fill(5 + i % 7)(s"tok$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val budgets = Map("a" -> 100L, "b" -> 150L)
    val got = Sampling.tokenBudgetMix(docs, "doc_id", "text", "source", budgets)
      .as[(Long, String, Long)].collect()
    val bySrc = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    budgets.foreach { case (s, b) =>
      val kept = bySrc(s)
      assert(kept >= b, s"$s: kept $kept < budget $b")
      assert(kept < b + 12, s"$s: overshoot ${kept - b} exceeds one doc")
    }
    // deterministic
    val again = Sampling.tokenBudgetMix(docs, "doc_id", "text", "source",
      budgets).as[(Long, String, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // approx: expected kept tokens ~= budget (generous tolerance at
    // this corpus size); sources without a budget are excluded
    val approx = Sampling.tokenBudgetMixApprox(docs, "doc_id", "text",
        "source", Map("a" -> 300L))
      .as[(Long, String, Long)].collect()
    assert(approx.forall(_._2 == "a"))
    val keptA = approx.map(_._3).sum
    assert(keptA > 150 && keptA < 450, s"approx kept $keptA for budget 300")
  }

  test("normalizedDedup collapses casing/punctuation/whitespace variants " +
    "that byte-exact dedup keeps apart") {
    import graft.operators.Dedup
    val df = Seq(
      (1L, "Hello, World!  This is fine."),
      (2L, "hello world this is fine"),      // variant of 1
      (3L, "HELLO   world -- this is FINE"), // variant of 1
      (4L, "an entirely different page")
    ).toDF("doc_id", "text")
    val got = Dedup.normalizedDedup(df, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 4L -> 1L), got.toString)
    val exact = Dedup.exactDedup(df, "text", "doc_id").count()
    assert(exact == 4, "byte-exact sees 4 distinct docs")
  }

  test("capPerGroup plans as WindowGroupLimit partial+final around one " +
    "exchange (per-partition pre-prune before the shuffle)") {
    import graft.plans.HashExpressions
    val df = Sampling.capPerGroup(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      col("source"), HashExpressions.fnv64(col("text")), col("doc_id"), 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
    val partial = plan.linesIterator.count(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial"))
    assert(partial == 1, s"expected a Partial pre-prune stage:\n$plan")
  }

  test("epochShuffle is a contiguous permutation, re-shard stable, and " +
    "epochs permute independently") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val e1 = Sampling.epochShuffle(docs, "doc_id", col("text"), 1L)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    // contiguous 1..n permutation
    assert(e1.size == n && e1.values.toSeq.sorted == (1L to n).toSeq)
    // pure function of the data: partitioning cannot change the order
    val e1b = Sampling.epochShuffle(docs.repartition(13), "doc_id",
      col("text"), 1L).select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(e1 == e1b)
    // another epoch is a different (still contiguous) permutation
    val e2 = Sampling.epochShuffle(docs, "doc_id", col("text"), 2L)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(e2.values.toSeq.sorted == (1L to n).toSeq)
    val moved = e1.count { case (id, p) => e2(id) != p }
    assert(moved > n * 0.9, s"epoch 2 should reshuffle nearly all positions ($moved/$n moved)")
  }

  test("bigramNll matches a hand-computed interpolated bigram model") {
    // corpus: "a b a b" (doc 1), "a c" (doc 2)
    // unigrams: a=3, b=2, c=1, N=6; bigrams: (a,b)=2, (b,a)=1, (a,c)=1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = LmScore.bigramNll(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    val lam = 0.75
    def p(c12: Double, c1: Double, c2: Double) =
      lam * (c12 / c1) + (1 - lam) * (c2 / 6.0)
    val d1 = -(math.log(p(2, 3, 2)) + math.log(p(1, 2, 3)) + math.log(p(2, 3, 2))) / 3.0
    val d2 = -math.log(p(1, 3, 1))
    assert(math.abs(got(1L) - (math.rint(d1 * 1e4) / 1e4)) < 1e-9, got.toString)
    assert(math.abs(got(2L) - (math.rint(d2 * 1e4) / 1e4)) < 1e-9, got.toString)
    // a 1-token doc has no bigram and drops out
    val one = LmScore.bigramNll(Seq((9L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text").count()
    assert(one == 0)
  }

  test("weightedSamplePerGroup matches the naive k-smallest-clock replay, " +
    "excludes nonpositive/null weights, and is re-shard stable") {
    import graft.plans.HashExpressions
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"source", $"text", $"n_chars")
    val k = 7
    // independent replay: same clock formula, but selection via a plain
    // collect-and-sort per group instead of the WindowGroupLimit plan
    val clocks = docs
      .filter($"n_chars".isNotNull && $"n_chars" > 0)
      .withColumn("u",
        (shiftrightunsigned(HashExpressions.fnv64($"text"), 11)
          .cast("double") + 0.5) / 9007199254740992.0)
      .withColumn("clk", -log($"u") / $"n_chars".cast("double"))
      .select($"source", $"doc_id", $"clk")
      .as[(String, Long, Double)].collect()
    val want = clocks.groupBy(_._1).view.mapValues(
      _.sortBy(r => (r._3, r._2)).take(k).map(_._2).toSet).toMap
    val got = Sampling.weightedSamplePerGroup(docs, $"source", $"text",
        $"n_chars", $"doc_id", k)
      .select($"source", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got == want)
    got.values.foreach(s => assert(s.size <= k))
    // pure function of content: re-sharding cannot move the sample
    val resharded = Sampling.weightedSamplePerGroup(docs.repartition(13),
        $"source", $"text", $"n_chars", $"doc_id", k)
      .select($"source", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(resharded == got)
    // zero/negative/null weights have zero inclusion probability
    val weighted = Seq((1L, "g", "a", 10L), (2L, "g", "b", 0L),
      (3L, "g", "c", -5L)).toDF("id", "g", "t", "w")
      .union(Seq((4L, "g", "d")).toDF("id", "g", "t")
        .withColumn("w", lit(null: java.lang.Long)))
    val kept = Sampling.weightedSamplePerGroup(weighted, $"g", $"t", $"w",
      $"id", 10).select($"id").as[Long].collect().toSet
    assert(kept == Set(1L))
    // a null KEY gives a NULL clock, which an ascending sort would rank
    // first — it must be excluded, not always-selected
    val nullKey = Seq((1L, "g", "a", 10L), (2L, "g", "b", 10L),
      (3L, "g", "c", 10L)).toDF("id", "g", "t", "w")
      .union(Seq((4L, "g", 10L)).toDF("id", "g", "w")
        .withColumn("t", lit(null: String)).select($"id", $"g", $"t", $"w"))
    val keptNk = Sampling.weightedSamplePerGroup(nullKey, $"g", $"t", $"w",
      $"id", 2).select($"id").as[Long].collect().toSet
    assert(!keptNk.contains(4L) && keptNk.size == 2)
  }

  test("weightedSamplePerGroup favors heavy rows and appends compete " +
    "without reshuffling prior picks") {
    // 50 unit-weight rows + 3 rows at weight 10^7: the heavy rows'
    // Exp(1e7) clocks are ~1e-7-scale, below any realistic Exp(1) draw,
    // so all three must be selected at k=10 (deterministic given the
    // fixed content hashes; a failure here means the weight inverted)
    val rows = (1L to 50L).map(i => (i, "g", s"light row $i", 1L)) ++
      Seq((101L, "g", "heavy A", 10000000L), (102L, "g", "heavy B", 10000000L),
        (103L, "g", "heavy C", 10000000L))
    val df = rows.toDF("id", "g", "t", "w")
    val sel = Sampling.weightedSamplePerGroup(df, $"g", $"t", $"w", $"id", 10)
      .select($"id").as[Long].collect().toSet
    assert(Set(101L, 102L, 103L).subsetOf(sel), s"heavy rows lost: $sel")
    assert(sel.size == 10)
    // exponential-clocks monotonicity: adding one row can only displace
    // one prior pick — sample(S ∪ {x}) ⊆ sample(S) ∪ {x}
    val plus = df.union(Seq((200L, "g", "late arrival", 500L)).toDF(
      "id", "g", "t", "w"))
    val sel2 = Sampling.weightedSamplePerGroup(plus, $"g", $"t", $"w",
      $"id", 10).select($"id").as[Long].collect().toSet
    assert((sel2 - 200L).subsetOf(sel), s"append reshuffled picks: $sel2 vs $sel")
  }

  test("weightedSamplePerGroup plans as WindowGroupLimit partial+final " +
    "(per-partition k-prune before the one exchange)") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val plan = Sampling.weightedSamplePerGroup(docs, col("source"),
        col("text"), col("n_chars"), col("doc_id"), 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
    assert(plan.linesIterator.count(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial")) == 1,
      s"expected a Partial pre-prune stage:\n$plan")
  }

  test("fimSplit reassembles to the original text, renders PSM/SPM with " +
    "caller sentinels, varies cuts across docs, and is a zero-shuffle plan") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val out = Chunking.fimSplit(docs, Seq("doc_id"), $"text")
      .join(docs, "doc_id")
      .select($"doc_id", $"fim_prefix", $"fim_middle", $"fim_suffix",
        $"fim_text", $"text")
      .as[(Long, String, String, String, String, String)].collect()
    assert(out.length == docs.count())
    out.foreach { case (id, p, m, s, r, t) =>
      assert(p + m + s == t, s"doc $id: parts do not reassemble")
      assert(r == s"<PRE>$p<SUF>$s<MID>$m", s"doc $id: PSM render drifted")
    }
    // cuts are content-driven: not all docs split at the same offset
    assert(out.map(_._2.length).distinct.length > 10,
      "prefix lengths suspiciously uniform — cut hash degenerate?")
    // ~uniform a over [0, n]: mean prefix fraction should be near 1/2
    val fracs = out.collect { case (_, p, _, _, _, t) if t.nonEmpty =>
      p.length.toDouble / t.length }
    val mean = fracs.sum / fracs.length
    assert(mean > 0.4 && mean < 0.6, s"mean prefix fraction $mean not ~0.5")
    // SPM mode + custom sentinels
    val spm = Chunking.fimSplit(docs, Seq("doc_id"), $"text",
        preTok = "[P]", sufTok = "[S]", midTok = "[M]", spm = true)
      .select($"doc_id", $"fim_prefix", $"fim_middle", $"fim_suffix", $"fim_text")
      .as[(Long, String, String, String, String)].collect()
    spm.foreach { case (id, p, m, s, r) =>
      assert(r == "[P][S]" + s + "[M]" + p + m, s"doc $id: SPM render drifted")
    }
    // empty text: all-empty parts, sentinels survive
    val empty = Chunking.fimSplit(Seq((9L, "")).toDF("doc_id", "text"),
        Seq("doc_id"), $"text")
      .select($"fim_text").as[String].head()
    assert(empty == "<PRE><SUF><MID>")
    // one codegen projection — no exchange anywhere in the plan
    val plan = Chunking.fimSplit(docs, Seq("doc_id"), $"text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fimSplit should not shuffle:\n$plan")
  }
  // ---- keyword extraction + phrase search (round 13) ----------------------

  test("keywordsTfIdf matches a naive tf/df ranking and keeps exactly " +
    "top-k with term tie-break") {
    val docs = Seq(
      (1L, "alpha alpha alpha beta common common"),
      (2L, "beta beta gamma common"),
      (3L, "gamma gamma gamma common common common")).toDF("doc_id", "text")
    val got = LmScore.keywordsTfIdf(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "term", "score_micro", "rank")
      .as[(Long, String, Long, Int)].collect().toSeq
    // df: alpha 1, beta 2, gamma 2, common 3
    // doc1: alpha 3/1 = 3e6; common 2/3 = 666666; beta 1/2 = 5e5
    // doc2: beta 2/2 = 1e6; gamma 1/2 = 5e5 beats common 1/3 = 333333
    // doc3: gamma 3/2 = 15e5; common 3/3 = 1e6
    assert(got == Seq(
      (1L, "alpha", 3000000L, 1), (1L, "common", 666666L, 2),
      (2L, "beta", 1000000L, 1), (2L, "gamma", 500000L, 2),
      (3L, "gamma", 1500000L, 1), (3L, "common", 1000000L, 2)))
  }

  test("phraseCount finds consecutive-token occurrences only, counts " +
    "repeats, tokenizes like the BM25 family") {
    val docs = Seq(
      (1L, "the quick Brown-Fox jumps, the quick brown fox sleeps"),
      (2L, "quick the brown fox"),                 // words present, order wrong
      (3L, "quick brown dog")).toDF("doc_id", "text")
    val got = LmScore.phraseCount(docs, "doc_id", "text",
      Seq("quick", "brown", "fox")).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    // doc1: "brown-fox" tokenizes to brown, fox -> two occurrences
    assert(got == Seq((1L, 2L)))
  }

  test("phraseCount handles repeated words in the phrase") {
    val docs = Seq((1L, "ha ha ha"), (2L, "ha")).toDF("doc_id", "text")
    val got = LmScore.phraseCount(docs, "doc_id", "text", Seq("ha", "ha"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))  // positions 0-1 and 1-2
  }
}
