package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NearDup

class NearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Small corpus with planted near-dups (901/902 near 1/2) and
    * unrelated docs. */
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (901L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, "spark shuffles hash partitions across the cluster for joins"),
    (902L, "spark shuffles hash partitions across the cluster for joins today"),
    (3L, "completely different content about cooking pasta with garlic"),
    (4L, "another unrelated document mentioning satellites and orbits")
  ).toDF("doc_id", "text")

  test("minhashPairs finds planted near-dups and verifies with exact Jaccard") {
    val pairs = NearDup.minhashPairs(corpus, "doc_id", "text",
      k = 3, numBands = 8, rowsPerBand = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(found.contains((1L, 901L)), s"missing planted pair in $found")
    assert(found.contains((2L, 902L)), s"missing planted pair in $found")
    // jaccard column is the exact shingle Jaccard, in (0, 1]
    assert(pairs.forall(p => p._3 > 0.5 && p._3 <= 1.0))
    // unrelated docs never pair
    assert(!found.exists { case (a, b) => Set(a, b).intersect(Set(3L, 4L)).nonEmpty })
  }

  test("maxBucket drops are observed, not silent: a degenerate corpus " +
    "reports its dropped buckets through the cap metrics") {
    // 40 identical docs: every band bucket holds all 40 ids, far over
    // a maxBucket of 8 — every bucket drops, zero pairs survive
    val degenerate = (1L to 40L).map(i =>
      (i, "the same boilerplate line repeated in every document"))
      .toDF("doc_id", "text")
    val caps = graft.operators.BucketCap.CapCounters(spark, "spec_minhash")
    val out = NearDup.minhashPairs(degenerate, "doc_id", "text",
      k = 3, numBands = 8, rowsPerBand = 4, maxBucket = 8,
      capMetrics = Some(caps)).count()
    assert(out === 0L, "capped buckets must yield no pairs")
    // all 8 band buckets hold the full 40 ids and drop — and the count
    // SURVIVES AQE's empty-relation pruning of the downstream join
    // (the Dataset.observe formulation did not: see BucketCap scaladoc)
    assert(caps.droppedBuckets.value === 8L,
      s"drop not counted: buckets=${caps.droppedBuckets.value}")
    assert(caps.droppedIds.value === 320L,
      s"dropped id volume not counted: ids=${caps.droppedIds.value}")
    // and a healthy corpus reports zero drops
    val ok = graft.operators.BucketCap.CapCounters(spark, "spec_minhash_ok")
    NearDup.minhashPairs(corpus, "doc_id", "text",
      k = 3, numBands = 8, rowsPerBand = 4, capMetrics = Some(ok)).count()
    assert(ok.droppedBuckets.value === 0L)
  }

  test("cosineNearDupPairs counts its maxBucket drops too") {
    // 30 identical unit vectors: one bucket per table holds all 30 ids
    val vecs = (1L to 30L).map(i => (i, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val caps = graft.operators.BucketCap.CapCounters(spark, "spec_cosine")
    val out = graft.operators.Similarity.cosineNearDupPairs(
      vecs, threshold = 0.9, dim = 4, bits = 2, numTables = 2,
      maxBucket = 5, capMetrics = Some(caps)).count()
    assert(out === 0L)
    assert(caps.droppedBuckets.value === 2L,
      s"drop not counted: buckets=${caps.droppedBuckets.value}")
    assert(caps.droppedIds.value === 60L,
      s"dropped id volume not counted: ids=${caps.droppedIds.value}")
  }

  test("LSH candidates are generated per bucket — recall vs brute force " +
    "on planted dups is total") {
    // brute-force exact Jaccard over the tiny corpus (test-only crossJoin)
    val sh = corpus.select($"doc_id", NearDup.wordShingles($"text", 3).as("sh"))
    val a = sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = sh.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
    val exact = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("j", size(array_intersect($"sh_a", $"sh_b")).cast("double") /
        size(array_union($"sh_a", $"sh_b")).cast("double"))
      .filter($"j" >= 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = NearDup.minhashPairs(corpus, "doc_id", "text",
      k = 3, numBands = 8, rowsPerBand = 4, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact == lsh,
      s"LSH must find exactly the >=0.5-Jaccard pairs here: exact=$exact lsh=$lsh")
  }

  test("simhashPairs finds planted near-dups via 16-bit block LSH") {
    // simhash needs enough tokens for the bit-vote to stabilize: a
    // one-token edit on a 60-token doc lands within a few Hamming bits
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val longCorpus = Seq(
      (1L, base),
      (901L, base + " extra"),
      (3L, (100 to 160).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = NearDup.simhashPairs(longCorpus, "doc_id", "text", maxHamming = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 901L)), pairs.toString)
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }, pairs.toString)
  }

  test("maxBucket caps pathological buckets instead of exploding the join") {
    // 60 identical docs -> one bucket of 60; cap at 10 -> no pairs emitted
    val boiler = (1L to 60L).map(i => (i, "same boilerplate text repeated verbatim"))
      .toDF("doc_id", "text")
    val capped = NearDup.minhashPairs(boiler, "doc_id", "text",
      k = 3, numBands = 8, rowsPerBand = 4, threshold = 0.1, maxBucket = 10)
    assert(capped.count() == 0)
  }

  test("editVerify computes normalized Levenshtein exactly and keeps " +
    "only pairs at minSim+") {
    val docs = Seq(
      (1L, "kitten"), (2L, "sitting"),         // dist 3, max len 7
      (3L, "identical text"), (4L, "identical text"),
      (5L, "aaaaaaaaaa"), (6L, "zzzzzzzzzz")   // dist 10 → sim 0.0
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val got = NearDup.editVerify(pairs, docs, minSim = 0.4)
      .as[(Long, Long, Double)].collect().toMap2
    assert(got.keySet == Set((1L, 2L), (3L, 4L)))
    assert(math.abs(got((1L, 2L)) - (1.0 - 3.0 / 7.0)) < 1e-6)
    assert(got((3L, 4L)) == 1.0)
  }

  test("editVerify deduplicates candidate pairs before scoring: a pair " +
    "emitted by several bands yields ONE output row") {
    val docs = Seq((1L, "kitten"), (2L, "sitting")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("id_a", "id_b")
    val got = NearDup.editVerify(pairs, docs, minSim = 0.4).collect()
    assert(got.length == 1)
  }

  implicit private class TupleMap(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map { case (a, b, s) => (a, b) -> s }.toMap
  }

  test("dedupAgainstIndex drops batch near-dups of the FROZEN indexed " +
    "corpus and keeps fresh docs; streaming twin agrees") {
    // clean any orphaned warehouse location from a previously killed
    // run (catalog-less leftover dirs fail CTAS with overwrite mode)
    Seq("ndidx_test_bands", "ndidx_test_shingles").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    NearDup.buildNearDupIndex(corpus, "ndidx_test", numBuckets = 4)
    val batch = Seq(
      // near-dup of indexed doc 1 (one word dropped)
      (1000L, "the quick brown fox jumps over the lazy dog near the river"),
      (1001L, "entirely novel content nothing like the corpus at all here"),
      // exact re-ship of indexed doc 3
      (1002L, "completely different content about cooking pasta with garlic")
    ).toDF("doc_id", "text")
    val kept = NearDup.dedupAgainstIndex(spark, "ndidx_test", batch,
        threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1001L), s"kept $kept")

    // with broadcast off, the candidate probe must leave the bucketed
    // bands side exchange-free (any band_id hash exchange is the
    // batch side's own)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = NearDup.dedupAgainstIndex(spark, "ndidx_test", batch,
        threshold = 0.5).queryExecution.executedPlan.toString
      val bandExchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && l.contains("band_id"))
      assert(bandExchanges <= 1, s"index side shuffled on probe:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    stream.addData(Seq(
      (1000L, "the quick brown fox jumps over the lazy dog near the river"),
      (1001L, "entirely novel content nothing like the corpus at all here"),
      (1002L, "completely different content about cooking pasta with garlic")))
    val out = scala.collection.mutable.Set[Long]()
    val q = graft.streaming.EventsStreaming.nearDupFilterStream(
      stream.toDF().toDF("doc_id", "text"), "ndidx_test",
      threshold = 0.5) { (survivors, _) =>
      out ++= survivors.select(col("doc_id")).collect().map(_.getLong(0))
    }
    q.processAllAvailable(); q.stop()
    assert(out.toSet == kept, s"stream $out vs batch $kept")
    spark.sql("DROP TABLE IF EXISTS ndidx_test_bands")
    spark.sql("DROP TABLE IF EXISTS ndidx_test_shingles")
  }
}
