package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine matches a hand computation") {
    val df = Seq((Array(1.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(got - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("bruteForceTopK returns the true neighbors in rank order") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("query_id", "query_vec")
    val got = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(got == Seq((2L, 1), (3L, 2)))
  }

  test("multi-table LSH recalls most true nearest neighbors on the " +
    "testdata (near-orthogonal vectors: the hard case)") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    // NN cosine on this data is ~0.35 (θ≈69°, p≈0.617): recall per table
    // p^3≈0.23, over 16 tables ≈ 0.985
    val lsh = Similarity.lshTopK(emb, queries, k = 1, dim = 64,
      bits = 3, numTables = 16)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val agree = exact.keySet.count(q => lsh.get(q).contains(exact(q)))
    assert(agree >= 6, s"LSH recall too low: $agree/10 (exact=$exact lsh=$lsh)")
  }

  test("IVF top-k recalls most true nearest neighbors") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    // probing 6 of 16 cells scans ~3/8 of the corpus per query; on
    // near-orthogonal vectors the true NN still usually shares a cell
    val ivf = Similarity.ivfTopK(emb, queries, k = 1,
      nlist = 16, nprobe = 6, iters = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val agree = exact.keySet.count(q => ivf.get(q).contains(exact(q)))
    assert(agree >= 5, s"IVF recall too low: $agree/10 (exact=$exact ivf=$ivf)")
  }

  test("IVF cells partition the corpus: each (query, id) candidate is unique") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val out = Similarity.ivfTopK(emb, queries, k = 5, nlist = 8, nprobe = 8)
    // nprobe = nlist probes everything -> must equal brute force exactly
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    val got = out.select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == exact)
  }

  test("knnGraph with nprobe = nlist equals brute force with the corpus " +
    "as its own query set") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val asQueries = emb.select($"vec_id".as("query_id"),
      $"embedding".as("query_vec"))
    val exact = Similarity.bruteForceTopK(emb, asQueries, k = 3)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val got = Similarity.knnGraph(emb, k = 3, nlist = 8, nprobe = 8)
      .select($"src_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == exact)
  }

  test("knnGraph candidates are unique (cells partition the corpus) and " +
    "recall at nprobe=4 is high") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val g = Similarity.knnGraph(emb, k = 3, nlist = 16, nprobe = 4)
    val edges = g.select($"src_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSeq
    assert(edges.size == edges.toSet.size, "duplicate (src, dst) edge")
    val asQueries = emb.select($"vec_id".as("query_id"),
      $"embedding".as("query_vec"))
    val exact = Similarity.bruteForceTopK(emb, asQueries, k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val approx = g.filter($"rank" === 1)
      .select($"src_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val n = exact.size
    val agree = exact.keysIterator.count(q => approx.get(q).contains(exact(q)))
    assert(agree >= (n * 0.5).toInt,
      s"kNN-graph NN recall too low: $agree/$n")
  }

  test("knnGraphAuto equals knnGraph at the derived nlist (and clamps " +
    "nprobe)") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val n = emb.count()
    val nlist = math.max(1, ((n + 63) / 64).toInt)
    val auto = Similarity.knnGraphAuto(emb, k = 3, targetCell = 64, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val fixed = Similarity.knnGraph(emb, k = 3, nlist, math.min(4, nlist))
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(auto == fixed)
  }

  test("knnGraphIndexed over the persisted IVF layout equals the inline " +
    "graph at the same depth, including after a delta append") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val delta = emb.filter($"vec_id" % 5 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("knn_idx").resolve("idx").toString
    val cents = Similarity.buildIvfIndex(base, path, nlist = 8)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select($"src_id", $"neighbor_id", $"rank", $"sim")
        .as[(Long, Long, Int, Double)].collect().toSet
    val inlineBase = Similarity.knnGraph(base, k = 3, nlist = 8, nprobe = 4)
    // the indexed graph must match an inline graph built under the SAME
    // frozen quantizer (auto-retraining would shift cells)
    val inline0 = edges(Similarity.knnGraphWithCents(base, cents, 3, 4,
      "vec_id", "embedding"))
    assert(edges(Similarity.knnGraphIndexed(spark, path, cents, k = 3,
      nprobe = 4)) == inline0)
    assert(inline0 == edges(inlineBase)) // same cents -> same graph
    Similarity.appendToIvfIndex(delta, path, cents)
    val full = edges(Similarity.knnGraphIndexed(spark, path, cents, k = 3,
      nprobe = 4))
    assert(full == edges(Similarity.knnGraphWithCents(emb, cents, 3, 4,
      "vec_id", "embedding")))
  }

  test("semanticClusters groups planted copies with their originals and " +
    "leaves unrelated vectors as singletons") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val perturbed = emb.select($"vec_id",
        transform($"embedding", (x, i) =>
          x + sin(i.cast("double") + $"vec_id".cast("double")) * 0.01)
          .as("embedding"))
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val labels = Similarity.semanticClusters(emb.unionByName(perturbed),
      tau = 0.9, k = 4, nlist = 16, nprobe = 4)
      .as[(Long, Long)].collect().toMap
    val n = emb.count()
    // every vector is labeled, copies join their original's component
    assert(labels.size == 2 * n)
    val paired = (0L until n).count(id => labels(id + 100000L) == labels(id))
    assert(paired >= (n * 0.9).toInt,
      s"planted copies not clustered with originals: $paired/$n")
    // components containing a planted pair are canonicalized to the
    // ORIGINAL id (component minimum < 100000)
    assert((0L until n).forall(id => labels(id + 100000L) < 100000L + n))
  }

  test("knnDensityPrune: per-cell drop arithmetic is exact, dropped rows " +
    "dominate kept rows by density, null-density rows survive, " +
    "dropFrac=0 keeps all") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val perturbed = emb.select($"vec_id",
        transform($"embedding", (x, i) =>
          x + sin(i.cast("double") + $"vec_id".cast("double")) * 0.01)
          .as("embedding"))
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val corpus = emb.unionByName(perturbed)
    val n = corpus.count()
    // dropFrac = 0 keeps the whole corpus and yields every row's
    // density: the reference frame for the 0.25 run
    val full = Similarity.knnDensityPrune(corpus, dropFrac = 0.0,
      k = 4, targetCell = 64, nprobe = 4)
      .as[(Long, Int, Option[Long])].collect()
    assert(full.length == n)
    val kept = Similarity.knnDensityPrune(corpus, dropFrac = 0.25,
      k = 4, targetCell = 64, nprobe = 4)
      .as[(Long, Int, Option[Long])].collect()
    val keptIds = kept.map(_._1).toSet
    val byCell = full.groupBy(_._2)
    byCell.foreach { case (cell, rows) =>
      val cn = rows.length
      val scoredDrops = rows.count(r => r._3.isDefined && !keptIds(r._1))
      val budget = math.floor(cn * 0.25).toLong
      // exactly floor(0.25*cn) scored rows drop, capped by how many
      // rows are drop-eligible (null-density rows never are)
      val eligible = rows.count(_._3.isDefined)
      assert(scoredDrops == math.min(budget, eligible.toLong),
        s"cell $cell: dropped $scoredDrops of $cn (eligible $eligible)")
      // no null-density (no-neighbor) row is ever dropped
      rows.filter(_._3.isEmpty).foreach(r =>
        assert(keptIds(r._1), s"null-density ${r._1} was dropped"))
      // every dropped row is at least as dense as every kept scored row
      val droppedD = rows.filter(r => !keptIds(r._1)).flatMap(_._3)
      val keptD = rows.filter(r => keptIds(r._1)).flatMap(_._3)
      if (droppedD.nonEmpty && keptD.nonEmpty)
        assert(droppedD.min >= keptD.max - 0,
          s"cell $cell: dropped min ${droppedD.min} < kept max ${keptD.max}")
    }
  }

  test("semanticCard partitions the corpus: counts sum to n, exemplar " +
    "is each cell's minimum id, micro means are in [-1e6, 1e6]") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val n = emb.count()
    val card = Similarity.semanticCard(emb, targetCell = 16)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(card.map(_._2).sum == n)
    assert(card.forall(r => r._4 >= -1000000L && r._4 <= 1000000L))
    // the mean re-derives from the mergeable accumulator (sum, count)
    card.foreach { case (_, cnt, sum, mean, _) =>
      assert(mean == math.floor(sum.toDouble / cnt + 0.5).toLong) }
    // exemplar must be a member of the cell with the smallest id: check
    // via a direct re-assignment at the same auto depth
    val nlist = math.max(1, ((n + 15) / 16).toInt)
    val cents = Similarity.trainQuantizer(emb, nlist, 1)
    import graft.plans.VecExpressions.nearestCell
    val asg = emb.select($"vec_id",
        $"embedding".cast("array<double>").as("v"))
      .withColumn("cell", nearestCell($"v", cents))
      .groupBy($"cell").agg(min($"vec_id").as("m"))
      .as[(Int, Long)].collect().toMap
    card.foreach { case (cell, _, _, _, ex) => assert(asg(cell) == ex) }
  }

  test("persisted LSH index: same answers as inline LSH, no corpus-side " +
    "exchange on the probe join") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    Similarity.buildLshIndex(emb, "lsh_index_test", dim = 64,
      bits = 3, numTables = 16)
    try {
      val inline = Similarity.lshTopK(emb, queries, k = 1, dim = 64,
        bits = 3, numTables = 16)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
      val indexed = Similarity.lshTopKIndexed(spark, "lsh_index_test",
        queries, k = 1, dim = 64, bits = 3, numTables = 16)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
      assert(indexed == inline)
      // with broadcast off, the probe join must leave the bucketed
      // index side exchange-free (the one hash exchange is the query side)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = Similarity.lshTopKIndexed(spark, "lsh_index_test",
          queries, k = 1, dim = 64, bits = 3, numTables = 16)
          .queryExecution.executedPlan.toString
        val probeExchanges = plan.linesIterator.count(l =>
          l.contains("Exchange hashpartitioning") &&
            l.contains("table_id"))
        assert(probeExchanges <= 1,
          s"index side shuffled on probe:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP TABLE IF EXISTS lsh_index_test")
  }

  test("persisted IVF index: partition-pruned probes, exact parity with " +
    "brute force when probing all cells") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val path = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ivfidx").toString + "/idx"
    val cents = Similarity.buildIvfIndex(emb, path, nlist = 8, iters = 1)
    // probing every cell == exhaustive search -> brute-force parity
    val all = Similarity.ivfTopKIndexed(spark, path, cents, queries,
      k = 5, nprobe = 8)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(all == exact)
    // with nprobe=2 the scan must read ONLY the probed cells'
    // partitions: the partition filter appears in the scan node
    val pruned = Similarity.ivfTopKIndexed(spark, path, cents, queries,
      k = 1, nprobe = 2)
    val scan = pruned.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("cell"), s"no partition filter on the scan:\n$scan")
    assert(pruned.count() > 0)
  }

  test("incremental index append: half-then-append equals built-at-once " +
    "for BOTH index kinds, and probes stay pruned/bucketed") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val halfA = emb.filter($"vec_id" % 2 === 0)
    val halfB = emb.filter($"vec_id" % 2 === 1)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    // IVF: build on half A (quantizer trains there), append half B
    // with the SAME centroids; compare against a one-shot index over
    // the full corpus under those centroids
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ivfappend").toString
    val cents = Similarity.buildIvfIndex(halfA, s"$base/incr", nlist = 8)
    Similarity.appendToIvfIndex(halfB, s"$base/incr", cents)
    Similarity.appendToIvfIndex(emb, s"$base/full", cents)
    def probe(path: String) = Similarity.ivfTopKIndexed(spark, path,
        cents, queries, k = 3, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(probe(s"$base/incr") == probe(s"$base/full"))
    // appended index still partition-prunes
    val scan = Similarity.ivfTopKIndexed(spark, s"$base/incr", cents,
        queries, k = 1, nprobe = 2)
      .queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("cell"), s"no partition filter after append:\n$scan")
    // cell stats: counts cover the appended index exactly, and the
    // scan that produces them reads the partition column only
    val (cellCounts, balance) = Similarity.ivfCellStats(spark, s"$base/incr")
    assert(cellCounts.agg(sum($"n_vectors")).head().getLong(0) ==
      emb.count())
    assert(balance >= 1.0, s"balance=$balance")
    val statsScan = cellCounts.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!statsScan.contains("\"v\""),
      s"cell stats scan reads vectors:\n$statsScan")
    // LSH: build on half A, append half B; equals inline LSH over the
    // full corpus (same planes)
    Similarity.buildLshIndex(halfA, "lsh_append_test", dim = 64,
      bits = 3, numTables = 8)
    try {
      Similarity.appendToLshIndex(halfB, "lsh_append_test", dim = 64,
        bits = 3, numTables = 8)
      val indexed = Similarity.lshTopKIndexed(spark, "lsh_append_test",
          queries, k = 2, dim = 64, bits = 3, numTables = 8)
        .as[(Long, Long, Int, Double)].collect().toSet
      val inline = Similarity.lshTopK(emb, queries, k = 2, dim = 64,
          bits = 3, numTables = 8)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(indexed == inline)
    } finally spark.sql("DROP TABLE IF EXISTS lsh_append_test")
  }

  test("IVF append drift guard: a distribution-shifted delta trips the " +
    "balance warning; an in-distribution delta does not") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ivfdrift").toString
    val cents = Similarity.buildIvfIndex(emb, s"$base/idx", nlist = 8)
    val builtBalance = Similarity.ivfCellStats(spark, s"$base/idx")._2
    // in-distribution delta (the corpus itself, re-keyed): balance
    // stays near the build-time value, no warning
    Similarity.lastAppendBalance.set(-1.0)
    Similarity.appendToIvfIndex(
      emb.withColumn("vec_id", $"vec_id" + 100000L), s"$base/idx", cents,
      warnBalanceAbove = Some(builtBalance * 2))
    val sameBalance = Similarity.lastAppendBalance.get().doubleValue()
    assert(sameBalance > 0, "guard did not run")
    assert(sameBalance <= builtBalance * 2,
      s"in-distribution append tripped: $sameBalance vs built $builtBalance")
    // shifted delta: every vector sits at ONE centroid, piling a
    // corpus-sized delta into a single cell -> balance blows past the
    // build-time reference and the rebuild advice fires
    val c0 = cents(0)
    val shifted = emb.select(($"vec_id" + 200000L).as("vec_id"),
      typedLit(c0.map(_.toFloat)).as("embedding"))
    Similarity.lastAppendBalance.set(-1.0)
    Similarity.appendToIvfIndex(shifted, s"$base/idx", cents,
      warnBalanceAbove = Some(builtBalance * 2))
    val driftBalance = Similarity.lastAppendBalance.get().doubleValue()
    assert(driftBalance > builtBalance * 2,
      s"shifted append should trip: $driftBalance vs built $builtBalance")
  }

  test("cosineNearDupPairs finds planted perturbed copies, not random pairs") {
    val pairs = SparkEntry.queries("q_embed_neardup")(spark, TestSpark.sf0001)
      .select($"id_a", $"id_b", $"sim").as[(Long, Long, Double)].collect()
    // every reported pair is a planted (v, v+noise) couple at cos>=0.9:
    // random pairs on this data sit near cos~0
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, s) => b == a + 100000L && s >= 0.9 },
      pairs.take(5).mkString(","))
    // recall: most of the 500 planted pairs collide in >=1 of 8 tables
    assert(pairs.length >= 350, s"recall too low: ${pairs.length}/500")
  }

  test("cosineNearDupPairsAuto derives the depth that keeps bucket " +
    "occupancy constant, and matches the fixed-bits result exactly") {
    // 4000-vector corpus at targetBucket=32 → n/32 = 125 → ceil(log2)
    // = 7, the q_embed_neardup hand-picked depth — auto must reproduce
    // the fixed-bits pair set bit for bit (same hyperplanes, same
    // buckets), so the convenience entry point can't drift from the
    // oracle-gated operator
    val emb = Tables.embeddings(spark, TestSpark.sf0001).select($"vec_id",
      $"embedding".cast("array<double>").as("embedding"))
    val perturbed = emb.select($"vec_id",
        transform($"embedding", (x, i) =>
          x + sin(i.cast("double") + $"vec_id".cast("double")) * 0.05)
          .as("embedding"))
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val corpus = emb.unionByName(perturbed)
    val n = corpus.count()
    val expectedBits = math.max(4, math.ceil(
      math.log(n / 32.0) / math.log(2.0)).toInt)
    val auto = Similarity.cosineNearDupPairsAuto(corpus, threshold = 0.9,
      dim = 64, targetBucket = 32, numTables = 8)
      .as[(Long, Long, Double)].collect().toSet
    val fixed = Similarity.cosineNearDupPairs(corpus, threshold = 0.9,
      dim = 64, bits = expectedBits, numTables = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == fixed)
    assert(auto.nonEmpty)
    // knownCount skips the count pass and must not change the result
    val known = Similarity.cosineNearDupPairsAuto(corpus, threshold = 0.9,
      dim = 64, targetBucket = 32, numTables = 8, knownCount = Some(n))
      .as[(Long, Long, Double)].collect().toSet
    assert(known == auto)
  }

  test("semDedupAuto derives nlist = ceil(n/targetCell) and matches " +
    "the fixed-nlist result exactly") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val n = emb.count()
    val target = 100
    val expectedNlist = math.max(2, ((n + target - 1) / target).toInt)
    val auto = Similarity.semDedupAuto(emb, targetCell = target,
      tau = 0.95, iters = 1).as[(Long, Int)].collect().toSet
    val fixed = Similarity.semDedup(emb, nlist = expectedNlist,
      tau = 0.95, iters = 1).as[(Long, Int)].collect().toSet
    assert(auto == fixed)
    assert(auto.nonEmpty)
    val known = Similarity.semDedupAuto(emb, targetCell = target,
      tau = 0.95, iters = 1, knownCount = Some(n)).as[(Long, Int)].collect().toSet
    assert(known == auto)
  }

  test("centroidOutliers flags exactly the far-from-every-cluster " +
    "vector on a hand-built corpus") {
    // two tight clusters on the first two axes; vector 99 sits on the
    // third axis, far from both centroids — the one true outlier
    val corpus = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.99, 0.01, 0.0)),
      (3L, Array(0.98, 0.02, 0.0)),
      (10L, Array(0.0, 1.0, 0.0)), (11L, Array(0.0, 0.99, 0.01)),
      (99L, Array(0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(corpus, nlist = 2, tau = 0.5,
      iters = 3).select($"vec_id").as[Long].collect().toSet
    // 99 lands in SOME cell but its cosine to that centroid is ~0;
    // every clustered vector sits at ~1.0 to its own centroid
    assert(out == Set(99L), s"flagged $out")
  }

  test("semDedup keeps exactly the greedy smaller-id-wins set on a " +
    "hand-built two-cluster corpus") {
    // cluster A: 1,2,3 mutually near-identical; cluster B: 10 isolated,
    // 11 near 10. Greedy: keep 1 (drops 2,3), keep 10 (drops 11).
    val corpus = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.999, 0.01, 0.0)),
      (3L, Array(0.998, 0.02, 0.0)),
      (10L, Array(0.0, 1.0, 0.0)), (11L, Array(0.0, 0.999, 0.01))
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(corpus, nlist = 2, tau = 0.95, iters = 1)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L), s"kept $kept")
  }

  test("semDedup prunes the planted perturbed copies and keeps the originals") {
    val kept = SparkEntry.queries("q_semdedup")(spark, TestSpark.sf0001)
      .select($"vec_id").as[Long].collect()
    assert(kept.length == kept.distinct.length)
    val (orig, pert) = kept.partition(_ < 100000L)
    // every original survives (no natural 0.95-pair at this sf), and
    // nearly every perturbed copy lands in its original's cell and dies;
    // a perturbed copy only survives the rare cell-boundary split
    val n = Tables.embeddings(spark, TestSpark.sf0001).count()
    assert(orig.length == n, s"originals kept: ${orig.length}/$n")
    assert(pert.length <= n / 20, s"perturbed copies kept: ${pert.length}")
    // determinism
    val again = SparkEntry.queries("q_semdedup")(spark, TestSpark.sf0001)
      .select($"vec_id").as[Long].collect()
    assert(kept.sorted.toSeq == again.sorted.toSeq)
  }

  test("hyperplanes are the EXACT splitmix64 Box-Muller sequence the " +
    "DuckDB oracles replay (golden bit patterns)") {
    // bit-for-bit golden values from the validated JVM/DuckDB parity
    // run: component (b=0, d) of table seed 42 is Box-Muller over
    // mix64(seed + 2i*G), mix64(seed + (2i+1)*G) with i = b*dim+d.
    // If this spec breaks, the q_ann_lsh / q_embed_neardup /
    // q_ann_ivf oracle SQL no longer replays the engine — change both
    // together or not at all.
    val p42 = Similarity.hyperplanes(64, 4, 42L)
    val p43 = Similarity.hyperplanes(64, 4, 43L)
    def bits(d: Double): String =
      java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(d))
    assert(bits(p42(0)(0)) == "3fda8ac4b546f505")
    assert(bits(p42(0)(1)) == "bfec8a54f4e91a80")
    assert(bits(p42(0)(2)) == "3ffbac69cd4142c4")
    assert(bits(p43(0)(0)) == "bfe35a60854448ea")
    // plane matrices are per-table-seed distinct and fully populated
    assert(p42.length == 4 && p42.forall(_.length == 64))
    assert(p42(0)(0) != p43(0)(0))
  }

  test("hyperplane-LSH observed recall tracks the analytic " +
    "1-(1-p^bits)^tables curve on pairs planted at a known angle") {
    // plant 500 pairs at exactly 60 degrees: v' = cos60*v + sin60*u
    // with u orthonormal to v. Random-hyperplane collision probability
    // per bit is p = 1 - theta/pi = 2/3, so with bits=4, tables=8 the
    // analytic pair recall is 1-(1-(2/3)^4)^8 = 0.8287. With 500
    // independent pairs, 3*sigma ~ 0.05 — assert a 0.07 band, which
    // fails reliably if the bucketing math degrades (e.g. a sign error
    // makes p=1/2: recall 0.41, or per-table dedup double-counts).
    val rnd = new scala.util.Random(42)
    val dim = 64
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val theta = math.Pi / 3
    val rows = (0 until 500).flatMap { i =>
      val v = unit(Array.fill(dim)(rnd.nextGaussian()))
      val raw = Array.fill(dim)(rnd.nextGaussian())
      val d = raw.zip(v).map { case (a, b) => a * b }.sum
      val u = unit(raw.zip(v).map { case (a, b) => a - d * b })
      val vRot = v.zip(u).map { case (a, b) =>
        math.cos(theta) * a + math.sin(theta) * b }
      Seq((i.toLong, v.toSeq), (i.toLong + 10000L, vRot.toSeq))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val found = Similarity.cosineNearDupPairs(corpus, threshold = 0.45,
        dim = dim, bits = 4, numTables = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .count { case (a, b) => b == a + 10000L }
    val observed = found / 500.0
    val analytic = 1.0 - math.pow(1.0 - math.pow(2.0 / 3.0, 4), 8)
    assert(math.abs(observed - analytic) < 0.07,
      f"observed recall $observed%.3f vs analytic $analytic%.3f")
  }

  test("randomProject preserves pairwise cosine within the JL epsilon " +
    "band and is a deterministic pure function of (data, seed)") {
    val rnd = new scala.util.Random(7)
    val dim = 64
    val rows = (0L until 40L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian())))
    val corpus = rows.toDF("vec_id", "embedding")
    val rp = Similarity.randomProject(corpus, outDim = 16, dim = dim)
      .as[(Long, Seq[Double])].collect().toMap
    // determinism: a second run (and a re-partitioned input) agrees exactly
    val rp2 = Similarity.randomProject(corpus.repartition(7), 16, dim)
      .as[(Long, Seq[Double])].collect().toMap
    assert(rp == rp2)
    // JL: random-pair cosines move, but not structurally (coarse band —
    // k=16 is small; the point is "correlated", not "tight")
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val origs = rows.toMap
    val errs = for (a <- 0L until 10L; b <- (a + 1) until 10L) yield
      math.abs(cos(origs(a), origs(b)) - cos(rp(a), rp(b)))
    assert(errs.max < 0.5 && errs.sum / errs.size < 0.2,
      s"JL distortion too large: mean=${errs.sum / errs.size}, max=${errs.max}")
  }

  test("PQ: codes are in range, deterministic, and ADC top-k recalls " +
    "most exact neighbors on clustered data") {
    val rnd = new scala.util.Random(5)
    val dim = 64
    // 8 well-separated cluster centers, 25 points each
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 4))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val books = Similarity.trainPq(corpus, m = 4, ksub = 8, iters = 1)
    assert(books.length == 4 && books.forall(_.length == 8) &&
      books.forall(_.forall(_.length == 16)))
    val codes = Similarity.pqEncodeCorpus(corpus, books)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.size == 200)
    assert(codes.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 8)))
    // same input -> same codebooks bitwise; a REPARTITIONED input may
    // drift by summation-order ulps in the Lloyd means (same contract
    // as trainQuantizer), so that comparison is approximate
    val booksSame = Similarity.trainPq(corpus, m = 4, ksub = 8, iters = 1)
    assert(books.flatten.flatten.toSeq == booksSame.flatten.flatten.toSeq)
    val books2 = Similarity.trainPq(corpus.repartition(7), m = 4, ksub = 8, iters = 1)
    val flatA = books.flatMap(_.flatMap(_.toSeq)).toSeq
    val flatB = books2.flatMap(_.flatMap(_.toSeq)).toSeq
    flatA.zip(flatB).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"codebook drift beyond ulps: $a vs $b") }
    // ADC top-k preserves COARSE geometry: every same-cluster member
    // quantizes to (nearly) the same codes, so within-cluster rank is
    // intentionally lost — the correct PQ assertion is that the top-k
    // neighbors come from the query's own cluster, not that they match
    // the exact within-cluster ordering
    val queries = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val got = Similarity.pqTopK(corpus, queries, k = 5, m = 4, ksub = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(got.length == 8 * 5)
    val sameCluster = got.count { case (q, n) => n % 8 == q % 8 }
    val frac = sameCluster.toDouble / got.length
    assert(frac >= 0.9, s"PQ ADC cluster recall too low: $frac")
  }

  test("IVFPQ: probing all cells == pure PQ ADC, indexed == inline with " +
    "partition-pruned probes, and coarse pruning keeps cluster recall") {
    val rnd = new scala.util.Random(5)
    val dim = 64
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 4))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    // nprobe = nlist covers every cell, so the candidate set is all
    // pairs and IVFPQ must EQUAL the pure ADC ranking — the coarse
    // quantizer's only effect is pruning, never scoring
    val allCells = Similarity.ivfPqTopK(corpus, queries, k = 5,
        nlist = 8, nprobe = 8, m = 4, ksub = 8)
      .as[(Long, Long, Int, Double)].collect().toSet
    val pureAdc = Similarity.pqTopK(corpus, queries, k = 5, m = 4, ksub = 8)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(allCells == pureAdc,
      "IVFPQ at nprobe=nlist diverged from pure PQ ADC")
    // persisted layout: same answers as inline, and the probe scan
    // carries the cell partition filter (reads only probed cells)
    val path = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ivfpq").toString + "/idx"
    val (cents, books) = Similarity.buildIvfPqIndex(corpus, path,
      nlist = 8, m = 4, ksub = 8)
    val indexed = Similarity.ivfPqTopKIndexed(spark, path, cents, books,
      queries, k = 5, nprobe = 3)
    val inline = Similarity.ivfPqTopK(corpus, queries, k = 5,
      nlist = 8, nprobe = 3, m = 4, ksub = 8)
    assert(indexed.as[(Long, Long, Int, Double)].collect().toSet ==
      inline.as[(Long, Long, Int, Double)].collect().toSet)
    val scan = indexed.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("cell"), s"no partition filter on the scan:\n$scan")
    // recall-vs-exact: with a tight probe budget the neighbors must
    // still come from the query's own planted cluster
    val got = Similarity.ivfPqTopK(corpus, queries, k = 5,
        nlist = 8, nprobe = 2, m = 4, ksub = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    val frac = got.count { case (q, n) => n % 8 == q % 8 }.toDouble / got.length
    assert(frac >= 0.9, s"IVFPQ cluster recall too low: $frac")
  }

  test("residual IVFPQ: same code budget reconstructs tighter than raw " +
    "encoding, and tight-probe cluster recall holds") {
    val rnd = new scala.util.Random(5)
    val dim = 64
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 4))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = Similarity.trainQuantizer(corpus, nlist = 8, iters = 1)
    val means = Similarity.cellMeans(corpus, cents)
    val res = Similarity.ivfResiduals(corpus, cents, means)
    val rawBooks = Similarity.trainPq(corpus, m = 4, ksub = 8)
    val resBooks = Similarity.trainPq(res.select($"vec_id", $"rv"),
      m = 4, ksub = 8, iters = 1, "vec_id", "rv")
    val dsub = dim / 4
    def decode(codes: Seq[Int], books: Array[Array[Array[Double]]]) =
      codes.zipWithIndex.flatMap { case (j, s) => books(s)(j) }.toArray
    val vecs = rows.toMap
    val cellOf = res.select($"vec_id", $"cell").as[(Long, Int)]
      .collect().toMap
    val rawCodes = Similarity.pqEncodeCorpus(corpus, rawBooks)
      .as[(Long, Seq[Int])].collect().toMap
    val resCodes = Similarity
      .pqEncodeCorpus(res.select($"vec_id", $"rv"), resBooks, "vec_id", "rv")
      .as[(Long, Seq[Int])].collect().toMap
    def sq(a: Array[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val rawErr = vecs.map { case (id, v) =>
      sq(decode(rawCodes(id), rawBooks), v) }.sum
    val resErr = vecs.map { case (id, v) =>
      val r = decode(resCodes(id), resBooks)
      val c = means(cellOf(id))
      sq(r.zip(c).map { case (x, y) => x + y }, v)
    }.sum
    // the by_residual claim: the m x ksub budget spent on within-cell
    // structure reconstructs strictly tighter than re-describing cell
    // location (here by a wide margin — clustered data is its regime)
    assert(resErr < rawErr * 0.5,
      f"residual recon $resErr%.1f not clearly under raw $rawErr%.1f")
    // recall at a tight probe budget still >= 0.9 on planted clusters
    val queries = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val got = Similarity.ivfPqTopKResidual(corpus, queries, k = 5,
        nlist = 8, nprobe = 2, m = 4, ksub = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    val frac = got.count { case (q, n) => n % 8 == q % 8 }.toDouble / got.length
    assert(frac >= 0.9, s"residual IVFPQ cluster recall too low: $frac")
  }

  test("quantizeI8: |q| <= 127, round-trip error <= scale/2 per " +
    "component, cosine preserved to ~1e-2, zero vector -> zeros") {
    val rnd = new scala.util.Random(11)
    val dim = 64
    val rows = (0L until 30L).map(i =>
      (i, Seq.fill(dim)(rnd.nextGaussian() * (i + 1)))) :+ (99L, Seq.fill(dim)(0.0))
    val corpus = rows.toDF("vec_id", "embedding")
    val gotPairs = Similarity.quantizeI8(corpus)
      .as[(Long, Double, Seq[Int])].collect()
    val origs = rows.toMap
    gotPairs.foreach { case (id, scale, q) =>
      val v = origs(id)
      assert(q.forall(x => math.abs(x) <= 127), s"$id out of int8 range")
      if (v.exists(_ != 0.0)) {
        assert(scale > 0)
        v.zip(q).foreach { case (x, qx) =>
          assert(math.abs(x - qx * scale) <= scale / 2 + 1e-12,
            s"$id component error above scale/2") }
        val dq = q.map(_ * scale)
        val num = v.zip(dq).map { case (a, b) => a * b }.sum
        val den = math.sqrt(v.map(x => x * x).sum * dq.map(x => x * x).sum)
        assert(num / den > 0.99, s"$id cosine(v, dequant) too low")
      } else {
        assert(scale == 0.0 && q.forall(_ == 0))
      }
    }
  }

  test("marginMine recovers exactly the planted alignments: each x pairs " +
    "with its translation, distractors are never mined, margins exceed " +
    "the plain-cosine baseline's normalization") {
    val xs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val ys = Seq(
      (101L, Array(0.99f, 0.10f, 0.0f, 0.0f)), // translation of x1
      (102L, Array(0.08f, 0.99f, 0.0f, 0.0f)), // translation of x2
      (103L, Array(0.0f, 0.0f, 1.0f, 0.0f))    // distractor
    ).toDF("vec_id", "embedding")
    val mined = Similarity.marginMine(xs, ys, k = 2,
        targetCell = 64, nprobe = 4, threshold = 1.5)
      .select($"x_id", $"y_id", $"margin").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(mined.map(m => (m._1, m._2)).toSeq == Seq((1L, 101L), (2L, 102L)))
    // the planted pair's cosine ~0.995 against a ~0.5 mean neighborhood:
    // the ratio margin sits far above the threshold
    assert(mined.forall(_._3 > 1.5))
    // tightening the threshold above the planted margins empties the set
    assert(Similarity.marginMine(xs, ys, k = 2, threshold = 10.0).count() == 0)
  }
}
