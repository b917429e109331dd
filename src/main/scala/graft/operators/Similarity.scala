package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force top-k is the correctness baseline: the (small) query set
  * is broadcast against a single scan of the corpus — a
  * BroadcastNestedLoopJoin whose cost is |corpus| × |queries| dot
  * products, linear in the corpus and embarrassingly parallel. The scale
  * path is [[lshTopK]]: random-hyperplane signatures bucket the corpus so
  * each query only scores its bucket's candidates.
  */
object Similarity {

  /** Dot product of two array<double> columns — custom codegen kernel
    * ([[graft.plans.VecOps.dot]]): the zip_with/aggregate formulation is
    * a CodegenFallback higher-order function (~1 ms/row interpreted);
    * the kernel is a tight loop inside whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VecExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** One-pass cosine similarity kernel ([[graft.plans.VecOps.cosine]]). */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VecExpressions.cosineSim(a, b)

  /** Exact top-k cosine neighbors of each query vector.
    * `queries` must be small (it is broadcast). Ties break on vec id for
    * determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qidCol: String = "query_id", qvecCol: String = "query_vec"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val q = queries.select(col(qidCol), col(qvecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col(idCol) =!= col(qidCol))
      .withColumn("sim", cosine(col("v"), col("qv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** Embedding-cosine near-dup pairs: multi-table hyperplane-LSH
    * buckets prune the pair space, then exact cosine decides.
    * Returns (id_a, id_b, sim) with id_a < id_b and sim >= threshold.
    *
    * Scale shape: candidate pairs are generated as IDs ONLY — one
    * hash-shuffle groupBy on (table, bucket), in-row pair expansion
    * bounded by `maxBucket`² per bucket, then a distinct over narrow
    * (id_a, id_b) rows. The 8·dim-byte vectors are joined back in only
    * AFTER the distinct, so each surviving pair is scored exactly once
    * and no vector ever rides through the pair shuffle. Oversized
    * buckets (degenerate corpora) are dropped explicitly via
    * `maxBucket` instead of exploding quadratically. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double, dim: Int,
                         bits: Int = 4, numTables: Int = 8, seed: Long = 42L,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         maxBucket: Int = 10000,
                         capMetrics: Option[BucketCap.CapCounters] = None): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val sigs = signatureFrame(corpus, idCol, col(vecCol), "v",
      dim, bits, numTables, seed).drop("v")
    // oversized buckets drop explicitly; the drop is counted + logged
    // ([[BucketCap.applyCap]]) so the recall loss is visible, not silent
    val buckets = BucketCap.applyCap(
      sigs.groupBy(col("table_id"), col("bucket"))
        .agg(collect_list(col(idCol)).as("ids")),
      "cosine_pairs", size(col("ids")), 2, maxBucket, capMetrics)
    val pairs = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val ea = c.select(col(idCol).as("id_a"), col("v").as("v_a"))
    val eb = c.select(col(idCol).as("id_b"), col("v").as("v_b"))
    pairs.join(ea, "id_a").join(eb, "id_b")
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** [[cosineNearDupPairs]] with the LSH depth derived from the corpus
    * size instead of hand-picked: bits = ceil(log2(n / targetBucket)),
    * floored at `minBits`. Expected bucket occupancy stays ~constant
    * (`targetBucket`) as the corpus grows, so candidate-pair volume —
    * the operator's dominant cost, Σ|bucket|² per table — scales
    * LINEARLY with n instead of quadratically at fixed bits (measured:
    * fixed bits=7 went 30× on a 10× corpus; auto-sized stayed ~linear,
    * see PLANS.md round 9). The price is one count() pass over the id
    * column (metadata-sized; on a managed table, table stats already
    * carry n — pass `knownCount` to skip the pass) and the recall
    * shift of deeper hashes: per-pair collision probability per table
    * is p_agree^bits, so keep `numTables` sized to the threshold as
    * documented on [[cosineNearDupPairs]]. */
  def cosineNearDupPairsAuto(corpus: DataFrame, threshold: Double, dim: Int,
                             targetBucket: Int = 32, minBits: Int = 4,
                             numTables: Int = 8, seed: Long = 42L,
                             idCol: String = "vec_id", vecCol: String = "embedding",
                             maxBucket: Int = 10000,
                             knownCount: Option[Long] = None,
                             capMetrics: Option[BucketCap.CapCounters] = None): DataFrame = {
    val n = knownCount.getOrElse(corpus.select(col(idCol)).count())
    val bits = math.max(minBits, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt)
    cosineNearDupPairs(corpus, threshold, dim, bits, numTables, seed,
      idCol, vecCol, maxBucket, capMetrics)
  }

  /** Deterministic random hyperplanes (seeded) — computed once on the
    * driver and carried into the plan as a referenced object.
    *
    * NOT `java.util.Random.nextGaussian` (polar method, rejection
    * sampling — unreplayable outside the JVM): component (b, d) is
    * Box-Muller over two splitmix64 uniforms keyed by a counter, so an
    * independent engine can regenerate the exact planes with integer
    * mod-2^64 arithmetic plus `sqrt/ln/cos` — the `q_ann_lsh` /
    * `q_embed_neardup` DuckDB oracles do exactly that (HUGEINT chain;
    * verified bitwise-identical across JVM Math and libm for the whole
    * plane matrix). The uniform takes the TOP 53 bits + 0.5, so it is
    * an exact dyadic rational in (0,1) on both sides. */
  private[graft] def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    import graft.functions.TextHash.mix64
    val G = 0x9e3779b97f4a7c15L
    def unit(h: Long): Double = ((h >>> 11) + 0.5) / 9007199254740992.0
    Array.tabulate(bits) { b =>
      Array.tabulate(dim) { d =>
        val i = b.toLong * dim + d
        val u1 = unit(mix64(seed + (2L * i) * G))
        val u2 = unit(mix64(seed + (2L * i + 1) * G))
        math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      }
    }
  }

  /** IVF(-flat) ANN — the second scale path next to [[lshTopK]], the
    * FAISS-style inverted-file layout re-expressed in Spark:
    *
    *  1. Coarse quantizer: `nlist` centroids picked as a deterministic
    *     hash-ordered sample of the corpus, optionally refined with
    *     `iters` Lloyd iterations — each iteration is one DataFrame
    *     aggregation (assign = codegen [[graft.plans.NearestCell]]
    *     kernel, re-center = posexplode + groupBy(cell, dim) avg).
    *     Only the nlist×dim centroid matrix ever reaches the driver
    *     (the quantizer IS driver-side state, exactly as a FAISS index
    *     header is; the corpus never is).
    *  2. Index: every corpus vector is assigned to its single nearest
    *     cell — cells PARTITION the corpus, so candidate (query, id)
    *     pairs are already unique and need no distinct.
    *  3. Search: each query probes its `nprobe` nearest cells; an
    *     equi-join on cell + kernel cosine + per-query top-k window.
    *     Candidate work per query ≈ nprobe/nlist of the corpus.
    *
    * At 100 TB the indexed corpus would be written out bucketed by
    * `cell` once and reused across query batches; the per-batch cost is
    * the probe join only. */
  /** Train the IVF coarse quantizer: deterministic hash-ordered sample
    * of `nlist` vectors, refined with `iters` Lloyd iterations (one
    * full-scan DataFrame aggregation each; only nlist×dim averaged
    * components ever reach the driver). Returns normalized centroids —
    * the FAISS index-header analog, reusable across query batches. */
  def trainQuantizer(corpus: DataFrame, nlist: Int, iters: Int = 1,
                     idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    import graft.plans.VecExpressions.nearestCell
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))

    def normalize(rows: Array[Array[Double]]): Array[Array[Double]] =
      rows.map { p =>
        val n = math.sqrt(p.map(x => x * x).sum)
        if (n == 0.0) p else p.map(_ / n)
      }

    // mix64, not xxhash64: the hash only provides a deterministic
    // pseudo-random ordering, and splitmix64 is replayable by the
    // DuckDB oracle in HUGEINT arithmetic where xxhash64 is not
    var cents = normalize(
      c.orderBy(graft.plans.HashExpressions.mix64(col(idCol).cast("long")),
          col(idCol)).limit(nlist)
        .select(col("v")).collect().map(_.getSeq[Double](0).toArray))

    (0 until iters).foreach { _ =>
      // the argmax kernel must land BELOW the explode: a single select
      // would put it in the Project ABOVE the extracted Generate and
      // recompute the nlist-centroid scan once per EXPLODED row — dim×
      // the work (measured 35.7 s → 1.5 s at sf3/nlist=938)
      val withCell = c.select(nearestCell(col("v"), cents).as("cell"),
        col("v"))
      val assigned = withCell.select(col("cell"),
        posexplode(col("v")).as(Seq("dim", "x")))
      val means = assigned.groupBy(col("cell"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(map_from_arrays(collect_list(col("dim")),
          collect_list(col("m"))).as("byDim"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        val cell = r.getInt(0)
        r.getMap[Int, Double](1).foreach { case (d, m) => next(cell)(d) = m }
      }
      cents = normalize(next)
    }
    cents
  }

  /** Persist the IVF index: corpus assigned to cells and written
    * PARTITIONED BY cell. A probe join against the query side's
    * nprobe cells then triggers dynamic partition pruning — only the
    * probed cells' files are read. Returns the trained quantizer
    * (store it with the index; the same centroids must be used to
    * query). */
  def buildIvfIndex(corpus: DataFrame, path: String, nlist: Int = 16,
                    iters: Int = 1, idCol: String = "vec_id",
                    vecCol: String = "embedding"): Array[Array[Double]] = {
    import graft.plans.VecExpressions.nearestCell
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cell", nearestCell(col("v"), cents))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    cents
  }

  /** Append a corpus DELTA to a persisted IVF index: assign with the
    * SAME quantizer the index was built with and append to the
    * cell-partitioned layout — no rebuild, no touch of existing files,
    * and probes/partition pruning stay valid because the cell space is
    * unchanged. This is the 100 TB ingestion shape: daily embedding
    * deltas are one assignment scan + append each, and the full
    * rebuild is reserved for when the delta stream has shifted the
    * distribution enough that cell balance degrades (watch cell row
    * counts; the quantizer deliberately does NOT retrain here — new
    * centroids would strand existing rows in stale cells). */
  /** Post-append cell balance factor of the last guarded
    * [[appendToIvfIndex]] (-1 = no guarded append yet): the
    * BucketCap/autoTimeSplits observability pattern — the drift
    * signal is recorded where tests and operators can read it, not
    * only logged. */
  val lastAppendBalance =
    new java.util.concurrent.atomic.AtomicReference[java.lang.Double](-1.0)

  def appendToIvfIndex(delta: DataFrame, path: String,
                       cents: Array[Array[Double]],
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       warnBalanceAbove: Option[Double] = None): Unit = {
    import graft.plans.VecExpressions.nearestCell
    delta.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cell", nearestCell(col("v"), cents))
      .write.mode("append").partitionBy("cell").parquet(path)
    // drift guard: the rebuild-vs-append decision needs a trigger, not
    // just a metric — compare the post-append balance factor against
    // the caller's build-time reference (× slack) and log rebuild
    // advice when the frozen quantizer has stopped fitting the corpus.
    // Cost: one partition-column-only aggregate (footers, no vectors).
    warnBalanceAbove.foreach { threshold =>
      val balance = ivfCellStats(delta.sparkSession, path)._2
      lastAppendBalance.set(balance)
      if (balance > threshold)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          f"IVF index $path: cell balance factor $balance%.2f exceeds " +
          f"$threshold%.2f after append — the frozen quantizer no " +
          "longer fits the appended corpus; retrain and rebuild " +
          "(buildIvfIndex) before probe cost skews further")
    }
  }

  /** Cell-balance profile of a persisted IVF index: one aggregate over
    * the partition column ONLY (row groups are skipped — `cell` is a
    * directory key, so the scan reads footers, not vectors). Returns
    * (cell, n_vectors) plus a driver-side balance factor =
    * max/mean cell size. Use it to drive the rebuild-vs-append
    * decision for [[appendToIvfIndex]]: a balance factor drifting
    * well past its build-time value means the frozen quantizer no
    * longer fits the corpus and probe cost is skewing — retrain and
    * rebuild. */
  def ivfCellStats(spark: org.apache.spark.sql.SparkSession,
                   path: String): (DataFrame, Double) = {
    val counts = spark.read.parquet(path)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
    val row = counts.agg(max(col("n_vectors")), avg(col("n_vectors"))).head()
    val balance =
      if (row.isNullAt(0) || row.getDouble(1) == 0.0) 1.0
      else row.getLong(0).toDouble / row.getDouble(1)
    (counts, balance)
  }

  /** Query a persisted IVF index (see [[buildIvfIndex]]). The probed
    * cell ids are known on the driver, so they are pushed as a static
    * partition filter — the scan reads ONLY the probed cells'
    * directories. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     cents: Array[Array[Double]], queries: DataFrame, k: Int,
                     nprobe: Int = 4, idCol: String = "vec_id",
                     qidCol: String = "query_id", qvecCol: String = "query_vec"): DataFrame = {
    import graft.plans.VecExpressions.nearestCells
    val probes = queries
      .select(col(qidCol), col(qvecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(nearestCells(col("qv"), cents, nprobe)))
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val indexed = spark.read.parquet(path)
      .filter(col("cell").isin(probedCells: _*)) // partition pruning
    // cells PARTITION the corpus, so each (query, vector) candidate
    // appears exactly once — no cross-probe dedup needed
    val scored = indexed.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("sim", cosine(col("v"), col("qv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "query_id", qvecCol: String = "query_vec"): DataFrame = {
    import graft.plans.VecExpressions.{nearestCell, nearestCells}
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    val indexed = c.withColumn("cell", nearestCell(col("v"), cents))
    val probes = queries
      .select(col(qidCol), col(qvecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(nearestCells(col("qv"), cents, nprobe)))
    val scored = indexed.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("sim", cosine(col("v"), col("qv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** Corpus k-NN graph: every vector's `k` approximate nearest
    * neighbors, as an edge list (src_id, neighbor_id, rank, sim) —
    * the substrate for graph-based curation (semantic-duplicate
    * clustering over cosine edges, density estimation for
    * SSL-prototype pruning, diffusion-style diversity selection).
    *
    * [[ivfTopK]] with the corpus on BOTH sides: vectors are assigned
    * to their single nearest IVF cell (cells PARTITION the corpus, so
    * a (src, dst) candidate pair arises at most once — dst's unique
    * cell is or isn't among src's probes; no distinct needed), every
    * vector probes its `nprobe` nearest cells, and candidates meet in
    * an equi-join ON `cell`. Unlike the query path the probe side is
    * corpus-sized, so it is NOT broadcast — the join is a hash
    * shuffle on `cell`, candidate volume ≈ nprobe × Σ|cell|²/n per
    * n. At 100 TB: both sides shuffle once on the cell key; keep
    * cells bounded with [[trainQuantizer]]'s nlist ∝ n (the
    * [[semDedupAuto]] sizing rule applies verbatim) so the per-cell
    * quadratic term stays constant as the corpus grows. Recall knob
    * is `nprobe`, identical semantics to the FAISS IVF self-query
    * idiom. Deterministic (splitmix64-seeded quantizer), so the
    * DuckDB oracle replays it exactly. */
  def knnGraph(corpus: DataFrame, k: Int, nlist: Int = 16,
               nprobe: Int = 4, iters: Int = 1, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    knnGraphWithCents(corpus,
      trainQuantizer(corpus, nlist, iters, idCol, vecCol),
      k, nprobe, idCol, vecCol)

  /** [[knnGraph]] under a caller-supplied (already trained) quantizer
    * — lets composites like [[knnDensityPrune]] reuse one centroid
    * matrix for assignment AND the graph instead of training twice. */
  private[graft] def knnGraphWithCents(corpus: DataFrame,
      cents: Array[Array[Double]], k: Int, nprobe: Int,
      idCol: String, vecCol: String): DataFrame = {
    import graft.plans.VecExpressions.{nearestCell, nearestCells}
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val indexed = c.withColumn("cell", nearestCell(col("v"), cents))
    val probes = c.select(col(idCol).as("src_id"), col("v").as("sv"))
      .withColumn("cell", explode(nearestCells(col("sv"), cents, nprobe)))
    val scored = indexed.join(probes, Seq("cell"))
      .filter(col(idCol) =!= col("src_id"))
      .withColumn("sim", cosine(col("v"), col("sv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("src_id")).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("src_id"), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** [[knnGraph]] over a PERSISTED IVF index ([[buildIvfIndex]]'s
    * cell-partitioned parquet + frozen quantizer): the corpus is read
    * already assigned — no re-train, no re-assignment scan — and both
    * join sides come from the same layout, so recomputing the graph
    * after an [[appendToIvfIndex]] delta or for a different (k,
    * nprobe) budget costs only the probe/scoring stages. This is the
    * batch-reuse path the inline graph's scaladoc promises at 100 TB:
    * write the assignment once, rebuild graphs many times. */
  def knnGraphIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                      cents: Array[Array[Double]], k: Int, nprobe: Int = 4,
                      idCol: String = "vec_id"): DataFrame = {
    import graft.plans.VecExpressions.nearestCells
    val indexed = spark.read.parquet(path)
    val probes = indexed
      .select(col(idCol).as("src_id"), col("v").as("sv"))
      .withColumn("cell", explode(nearestCells(col("sv"), cents,
        math.min(nprobe, cents.length))))
    val scored = indexed.join(probes, Seq("cell"))
      .filter(col(idCol) =!= col("src_id"))
      .withColumn("sim", cosine(col("v"), col("sv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("src_id")).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("src_id"), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** [[knnGraph]] with nlist derived from the corpus size — the same
    * nlist ∝ n discipline as [[semDedupAuto]], and for the same
    * reason: with cells PARTITIONING the corpus the candidate volume
    * is nprobe·Σ|cell|²/n ≈ nprobe·n²/nlist, so a FIXED nlist makes
    * the self-join quadratic at 10× data (the exact failure mode the
    * fixed-depth LSH near-dup measured at 41× for 10×); nlist =
    * ceil(n/targetCell) pins expected cell size and keeps it
    * nprobe·n·targetCell — linear. nprobe is clamped to nlist (a tiny
    * corpus degrades to one cell = exact brute force). */
  def knnGraphAuto(corpus: DataFrame, k: Int, targetCell: Int = 64,
                   nprobe: Int = 4, iters: Int = 1, minNlist: Int = 1,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   knownCount: Option[Long] = None): DataFrame = {
    val n = knownCount.getOrElse(corpus.select(col(idCol)).count())
    val nlist = math.max(minNlist, ((n + targetCell - 1) / targetCell).toInt)
    knnGraph(corpus, k, nlist, math.min(nprobe, nlist), iters, idCol, vecCol)
  }

  /** Margin-based cross-corpus pair mining (Artetxe & Schwenk 2019 —
    * the bitext-mining scorer behind CCMatrix/WikiMatrix-style
    * parallel-corpus construction, and equally the cross-release
    * "which new doc duplicates which old doc" aligner): candidate
    * pairs come from a forward approximate kNN of X into Y and are
    * scored by the RATIO margin
    *   margin(x, y) = cos(x, y) / ((avgF(x) + avgB(y)) / 2)
    * where avgF(x) is x's mean cosine to its k nearest Y-neighbors
    * and avgB(y) is y's mean to its k nearest X-neighbors — the
    * normalization that suppresses hubness false positives a plain
    * cosine threshold admits (a "hub" y scores high against
    * EVERYTHING, so its avgB is high and its margins collapse).
    * Retrieval is the paper's "max" strategy: each x keeps its best
    * candidate by margin, thresholded.
    *
    * Scale shape: ONE deterministic quantizer trained on the union
    * (nlist = ceil(n/targetCell), the [[knnGraphAuto]] sizing rule)
    * assigns both sides; each direction is a cell-equi-join kNN
    * exactly like [[knnGraph]] — hash shuffle on cell, probe side
    * corpus-sized so never broadcast, candidate volume
    * nprobe·n·targetCell (linear); the means are single hash aggs on
    * k-bounded edge lists; the margin join attaches two id→mean
    * frames to the forward edges. Edge sims are carried as exact
    * integer MICRO-units after the rank cut, so every margin is a
    * fixed chain of IEEE ops over exactly-representable integers —
    * bitwise-replayable cross-engine (the [[knnDensityPrune]]
    * determinism discipline).
    *
    * PRECONDITIONS: the two sides' id spaces are disjoint; a
    * candidate (x, y) needs y to have a non-empty backward
    * neighborhood (true whenever any X vector is assigned to one of
    * y's probed cells — candidates whose y has none are dropped, the
    * conservative policy since their margin denominator is
    * unmeasured). */
  def marginMine(xSide: DataFrame, ySide: DataFrame, k: Int,
                 targetCell: Int = 64, nprobe: Int = 4,
                 threshold: Double = 1.5, iters: Int = 1,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.plans.VecExpressions.{nearestCell, nearestCells}
    val x = xSide.select(col(idCol).as("x_id"),
      col(vecCol).cast("array<double>").as("xv"))
    val y = ySide.select(col(idCol).as("y_id"),
      col(vecCol).cast("array<double>").as("yv"))
    val union = x.select(col("x_id").as(idCol), col("xv").as("v"))
      .unionByName(y.select(col("y_id").as(idCol), col("yv").as("v")))
    val n = union.count()
    val nlist = math.max(1, ((n + targetCell - 1) / targetCell).toInt)
    val np = math.min(nprobe, nlist)
    val cents = trainQuantizer(union, nlist, iters, idCol, "v")

    // one direction of the cross kNN: corpus side assigned to its one
    // cell, probe side exploded to its np nearest cells, rank window
    // per probe id; sims leave as micro-units (rank decided unrounded)
    def knnDir(corpus: DataFrame, cid: String, cvec: String,
               probes: DataFrame, pid: String, pvec: String): DataFrame = {
      val indexed = corpus.withColumn("cell", nearestCell(col(cvec), cents))
      val probed = probes.withColumn("cell",
        explode(nearestCells(col(pvec), cents, np)))
      indexed.join(probed, Seq("cell"))
        .withColumn("sim", cosine(col(cvec), col(pvec)))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col(pid)).orderBy(col("sim").desc, col(cid))))
        .filter(col("rank") <= k)
        .select(col(pid), col(cid),
          round(col("sim") * 1e6).cast("long").as("sim_micro"))
    }

    val fwd = knnDir(y, "y_id", "yv", x, "x_id", "xv")
    val bwd = knnDir(x, "x_id", "xv", y, "y_id", "yv")
    // mean-of-neighborhood frames: CAST(sum)/CAST(count) is one IEEE
    // division of two exactly-representable integers
    val fAvg = fwd.groupBy(col("x_id")).agg(
      (sum(col("sim_micro")).cast("double") / count(lit(1)).cast("double"))
        .as("avg_f"))
    val bAvg = bwd.groupBy(col("y_id")).agg(
      (sum(col("sim_micro")).cast("double") / count(lit(1)).cast("double"))
        .as("avg_b"))
    fwd.join(fAvg, Seq("x_id")).join(bAvg, Seq("y_id"))
      .withColumn("margin",
        col("sim_micro").cast("double") / ((col("avg_f") + col("avg_b")) * 0.5))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("x_id")).orderBy(col("margin").desc, col("y_id"))))
      .filter(col("rk") === 1 && col("margin") >= threshold)
      .select(col("x_id"), col("y_id"), col("sim_micro"),
        round(col("margin"), 6).as("margin"))
  }

  /** kNN-density pruning (the SSL-prototypes / D4-family policy:
    * Sorscher et al. 2022 prune by prototype distance, Tirumala et
    * al. 2023 compose semantic dedup with density-based selection):
    * a vector's density is the mean cosine to its k approximate
    * nearest neighbors from the [[knnGraph]], carried in exact integer
    * MICRO-units (1e-6 cosine — see the determinism note in the
    * body); the floor(dropFrac·|cell|) DENSEST vectors of each cell
    * are dropped — dense neighborhoods are semantically redundant, so
    * the kept corpus preserves coverage while shedding the crowded
    * cores that near-dup thresholds are too blunt to thin. Returns
    * kept rows (idCol, cell, density_micro); vectors with NO
    * candidate neighbors have null density and are NEVER dropped,
    * whatever the budget — they are the unique-coverage outliers the
    * policy exists to keep (so a cell is also never emptied).
    *
    * Scale shape: the density aggregate is one hash shuffle on the
    * k-bounded edge list; the per-CELL fraction cut is a bounded
    * window on the cell partitioning (a GLOBAL density cut would need
    * a corpus-wide sort — per-cell keeps the policy shuffle-local and
    * is faithful to the papers, which select within clusters).
*/
  def knnDensityPrune(corpus: DataFrame, dropFrac: Double, k: Int = 4,
                      targetCell: Int = 64, nprobe: Int = 4, iters: Int = 1,
                      minNlist: Int = 1, idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      knownCount: Option[Long] = None): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac must be in [0, 1), got $dropFrac")
    import graft.plans.VecExpressions.nearestCell
    val n = knownCount.getOrElse(corpus.select(col(idCol)).count())
    val nlist = math.max(minNlist, ((n + targetCell - 1) / targetCell).toInt)
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val indexed = c.withColumn("cell", nearestCell(col("v"), cents))
    // mean sim in integer MICRO-units (1e-6 cosine): a float avg's
    // partial sums are partition-order-dependent, and decimal round()
    // SEMANTICS diverge between engines at exact half boundaries
    // (Spark rounds the shortest decimal repr, DuckDB the binary
    // value) — so sum round(sim*1e6) longs (order-insensitive), and
    // half-up via floor(x + 0.5) on the single division: /, +, floor
    // are pure IEEE ops with identical semantics everywhere, making
    // the integer replay exact
    val density = knnGraphWithCents(corpus, cents, k,
        math.min(nprobe, nlist), idCol, vecCol)
      .groupBy(col("src_id"))
      .agg(sum(round(col("sim") * 1e6).cast("long")).as("__micro"),
        count(lit(1)).as("__deg"))
      .select(col("src_id"),
        floor(col("__micro") / col("__deg").cast("double") + 0.5)
          .cast("long").as("density_micro"))
    val labeled = indexed.select(col(idCol), col("cell"))
      .join(density, col(idCol) === col("src_id"), "left")
      .select(col(idCol), col("cell"), col("density_micro"))
    val byCell = Window.partitionBy(col("cell"))
    val ranked = labeled
      .withColumn("__rn", row_number().over(
        byCell.orderBy(col("density_micro").desc_nulls_last, col(idCol))))
      .withColumn("__cn", count(lit(1)).over(byCell))
    // floor, not ceil: ceil over-drops small cells (a 1-member cell
    // would be EMPTIED at any dropFrac > 0 — and that lone vector is
    // exactly the unique-coverage outlier the policy keeps); and a
    // null-density (no-neighbor) row is never drop-eligible even when
    // the budget reaches past the scored rows
    ranked.filter(col("density_micro").isNull
        || col("__rn") > floor(col("__cn") * dropFrac))
      .select(col(idCol), col("cell"), col("density_micro"))
  }

  /** Semantic-duplicate clusters ACROSS cells: connected components
    * over the [[knnGraph]] edges with cosine ≥ `tau`. [[semDedup]]
    * compares pairs only WITHIN a quantizer cell, so a duplicate pair
    * split by a Voronoi boundary is invisible to it; the kNN graph
    * probes `nprobe` cells per vector, so the same pair still meets as
    * an edge, and label propagation stitches chains of near-dups into
    * one cluster (A≈B≈C groups even when cos(A,C) < tau). Returns
    * (idCol, canonical_id), canonical = component minimum — every
    * vector labeled, singletons map to themselves.
    *
    * Scale shape: the edge list is top-k-bounded (≤ k·n rows of three
    * fixed-width columns, text/vectors never enter the loop) and CC is
    * the same ~log-round label propagation the surface-form dedup
    * family runs ([[graft.operators.Dedup.connectedComponents]]).
    * The threshold compares the ROUNDED (6 dp) edge sim so the DuckDB
    * oracle replays the cut exactly. */
  def semanticClusters(corpus: DataFrame, tau: Double, k: Int = 4,
                       nlist: Int = 16, nprobe: Int = 4, iters: Int = 1,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val edges = knnGraph(corpus, k, nlist, nprobe, iters, idCol, vecCol)
      .filter(col("sim") >= tau)
      .select(col("src_id"), col("neighbor_id"))
    graft.operators.Dedup.connectedComponents(
      corpus.select(col(idCol)), edges, idCol, "src_id", "neighbor_id")
  }

  /** [[semanticClusters]] over the [[knnGraphAuto]] edge list —
    * nlist ∝ n so the clustering input stays linear in the corpus. */
  def semanticClustersAuto(corpus: DataFrame, tau: Double, k: Int = 4,
                           targetCell: Int = 64, nprobe: Int = 4,
                           iters: Int = 1, minNlist: Int = 1,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           knownCount: Option[Long] = None): DataFrame = {
    val edges = knnGraphAuto(corpus, k, targetCell, nprobe, iters,
        minNlist, idCol, vecCol, knownCount)
      .filter(col("sim") >= tau)
      .select(col("src_id"), col("neighbor_id"))
    graft.operators.Dedup.connectedComponents(
      corpus.select(col(idCol)), edges, idCol, "src_id", "neighbor_id")
  }

  /** Semantic coverage card: one row per quantizer cell with member
    * count, mean cosine-to-centroid (integer micro-units, the
    * [[knnDensityPrune]] determinism discipline), and the minimum-id
    * exemplar — the release-card view of EMBEDDING-space composition,
    * next to the token/source cards in [[Profile]]: a release whose
    * mass shifts between semantic cells shows up here before any
    * downstream eval does. Auto-sized (nlist = ceil(n/targetCell)).
    *
    * Scale shape: ONE scan (assignment + centroid cosine in the same
    * codegen projection) + ONE hash aggregation on cell; output is
    * nlist rows — metadata-sized, mergeable across releases by
    * re-aggregating counts and micro-sums. */
  def semanticCard(corpus: DataFrame, targetCell: Int = 64,
                   iters: Int = 1, minNlist: Int = 1,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   knownCount: Option[Long] = None): DataFrame = {
    import graft.plans.VecExpressions.nearestCell
    val n = knownCount.getOrElse(corpus.select(col(idCol)).count())
    val nlist = math.max(minNlist, ((n + targetCell - 1) / targetCell).toInt)
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cell", nearestCell(col("v"), cents))
      .withColumn("__sim_micro",
        round(round(cosine(col("v"), element_at(centLit, col("cell") + 1)), 6)
          * 1e6).cast("long"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("__sim_micro")).as("sim_micro_sum"),
        min(col(idCol)).as("exemplar_id"))
      .select(col("cell"), col("n_vecs"), col("sim_micro_sum"),
        floor(col("sim_micro_sum") / col("n_vecs").cast("double") + 0.5)
          .cast("long").as("mean_centroid_sim_micro"),
        col("exemplar_id"))
  }

  /** Cluster-balanced diversity sampling (the SemDeDup-family policy,
    * Abbas et al. 2023: semantic clusters → per-cluster selection):
    * assign every vector to its IVF cell and keep the `perCell` most
    * central vectors per cell (highest cosine to the cell centroid,
    * vec-id tie-break) — a diversity-preserving corpus subset whose
    * per-cluster budget caps semantic redundancy.
    *
    * Scale shape: quantizer training is the only full-scan iteration;
    * selection is one hash shuffle on `cell` + a bounded window. The
    * centroid matrix rides as ONE array literal (no per-component
    * codegen blowup) and the assignment/cosine are the same codegen
    * kernels as the ANN path. Deterministic end to end (splitmix64
    * sampling), so the DuckDB oracle replays it exactly. */
  def diverseSample(corpus: DataFrame, nlist: Int = 16, perCell: Int = 8,
                    iters: Int = 1, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    import graft.plans.VecExpressions.nearestCell
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    c.withColumn("cell", nearestCell(col("v"), cents))
      .withColumn("sim", cosine(col("v"), element_at(centLit, col("cell") + 1)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= perCell)
      .select(col(idCol), col("cell"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** SemDedup (Abbas et al. 2023): semantic deduplication by exact
    * pairwise cosine WITHIN k-means cells — the published recipe for
    * pruning embedding-level near-duplicates that MinHash/SimHash
    * (surface-form) dedup can't see. Returns the KEPT rows as
    * (idCol, cell).
    *
    * Retention policy: a vector is dropped iff a SMALLER-ID vector in
    * the same cell has cosine >= tau (the deterministic greedy
    * simplification of the paper's keep-one-per-eps-group — one
    * relational predicate, no iteration; transitive chains a→b→c where
    * only b bridges are resolved by dropping both b and c, the
    * conservative direction for dedup). Cross-cell near-dups are
    * invisible BY DESIGN — that is SemDedup's published recall
    * trade-off, and exactly why [[cosineNearDupPairs]] (multi-table
    * LSH) coexists with it.
    *
    * Scale shape: the quantizer train is the only full-corpus
    * iteration (driver holds nlist×dim centroids); the pair pass is
    * ONE shuffle of (id, vec) on cell, then Σ|cell|² codegen cosine
    * kernels — the paper's own cost model, bounded by choosing nlist
    * so cells stay ~constant-size (nlist ∝ corpus size; they use 50k
    * clusters at web scale). The anti-join back is on narrow ids. */
  def semDedup(corpus: DataFrame, nlist: Int = 16, tau: Double = 0.95,
               iters: Int = 1, idCol: String = "vec_id",
               vecCol: String = "embedding",
               warnCellOver: Long = 100000L): DataFrame = {
    import graft.plans.VecExpressions.nearestCell
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    // deliberately NOT persisted: the result is lazy, so a persist
    // here could never be unpersisted safely (the connectedComponents
    // discipline) and would pin the corpus per call. The assignment is
    // a cheap deterministic projection recomputed by the three
    // consumers below; at corpus scale callers persist `corpus` once
    // themselves.
    val assigned = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("cell", nearestCell(col("__v"), cents))
    // Guard the Σ|cell|² pair pass: an undersized nlist on a large or
    // skewed corpus degrades toward a quadratic in-cell cross join.
    // One map-combined count agg (nlist rows to the driver — the call
    // is already eager through trainQuantizer's collect) and a loud
    // warning with the corrective nlist; the run still proceeds.
    val sizes = assigned.groupBy(col("cell")).count()
      .agg(max(col("count")).as("mx"), sum(col("count")).as("n")).collect()(0)
    val (maxCell, total) = (sizes.getLong(0), sizes.getLong(1))
    if (maxCell > warnCellOver)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"semDedup: largest cell has $maxCell vectors (> $warnCellOver); " +
        s"pair pass is sum(|cell|^2) comparisons. Raise nlist " +
        s"(~${math.max(nlist, (total / warnCellOver + 1).toInt)} for " +
        s"~$warnCellOver-vector cells; the paper uses nlist ~ corpus/2k).")
    val dropped = assigned
      .select(col("cell"), col(idCol).as("__id_a"), col("__v").as("__va"))
      .join(assigned.select(col("cell"), col(idCol).as("__id_b"),
        col("__v").as("__vb")), Seq("cell"))
      .filter(col("__id_a") < col("__id_b") &&
        cosine(col("__va"), col("__vb")) >= tau)
      .select(col("__id_b").as(idCol)).distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** [[semDedup]] with nlist derived from the corpus size instead of
    * hand-picked: nlist = ceil(n / targetCell), floored at `minNlist`.
    * Expected cell size stays ~`targetCell` as the corpus grows, so
    * the Σ|cell|² pair pass scales LINEARLY (n · targetCell) — the
    * paper's own nlist ∝ corpus discipline (they run ~corpus/2k) made
    * the default instead of a scaladoc note. One count() pass (or
    * caller-known `knownCount`); the [[semDedup]] oversized-cell
    * warning still guards skew. */
  def semDedupAuto(corpus: DataFrame, targetCell: Int = 2000,
                   tau: Double = 0.95, iters: Int = 1,
                   minNlist: Int = 2, idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   knownCount: Option[Long] = None): DataFrame = {
    val n = knownCount.getOrElse(corpus.select(col(idCol)).count())
    val nlist = math.max(minNlist,
      ((n + targetCell - 1) / targetCell).toInt)
    semDedup(corpus, nlist, tau, iters, idCol, vecCol)
  }

  /** Embedding-space outlier detection (CLIP-filtering analog): flag
    * vectors whose cosine to their OWN cell centroid falls below
    * `tau` — mislabeled, noisy, or out-of-distribution points that sit
    * far from every semantic cluster. Returns the flagged rows as
    * (idCol, cell, sim); callers drop them with a broadcast anti-join
    * on idCol (ids only — the corpus never reshuffles).
    *
    * Plan shape: the [[diverseSample]] scoring pass without the rank
    * window — quantizer train (driver holds nlist×dim centroids), then
    * ONE codegen projection (nearest-cell assign + own-centroid
    * cosine) and a filter, zero exchanges. Embarrassingly parallel at
    * any scale; nlist follows the same ∝-corpus discipline as
    * [[semDedupAuto]]. */
  def centroidOutliers(corpus: DataFrame, nlist: Int = 16,
                       tau: Double = 0.5, iters: Int = 1,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    import graft.plans.VecExpressions.nearestCell
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    c.withColumn("cell", nearestCell(col("v"), cents))
      .withColumn("sim", cosine(col("v"), element_at(centLit, col("cell") + 1)))
      .filter(col("sim") < tau)
      .select(col(idCol), col("cell"), round(col("sim"), 6).as("sim"))
  }

  /** Johnson-Lindenstrauss random projection: reduce the embedding
    * column to `outDim` dimensions through the SAME deterministic
    * Gaussian plane machinery the LSH paths use ([[hyperplanes]] —
    * Box-Muller over splitmix64 uniforms, so a SQL oracle regenerates
    * the exact matrix), scaled by 1/sqrt(outDim) so expected pairwise
    * distances are preserved (the JL estimator).
    *
    * Scale shape: ONE codegen projection
    * ([[graft.plans.RandomProject]] — the k×dim matrix rides as a
    * referenced object, broadcast once per executor), zero exchanges,
    * embarrassingly parallel. This is the standard pre-reduction in
    * front of ANN / near-dup / SemDedup at 100 TB: a 1536-d corpus
    * reduced to 64-d cuts every downstream dot product — and the
    * (id, vec) shuffle volume of the cell/bucket paths — by 24×,
    * while [[cosineNearDupPairs]]-style recall degrades by the JL
    * epsilon bound, not structurally. */
  def randomProject(corpus: DataFrame, outDim: Int, dim: Int,
                    seed: Long = 42L, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, outDim, seed)
    corpus.select(col(idCol),
      graft.plans.VecExpressions.randomProject(
        col(vecCol).cast("array<double>"), planes).as("rp"))
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|/127,
    * q_j = floor(x_j/scale + 0.5) (round-half-up — the one rule that
    * replays as SQL floor(x+0.5); |q| ≤ 127 without clamping). The
    * storage-scale move for embedding columns: 4-byte floats become
    * 1-byte codes + one double per vector (≈4× smaller corpus, ≈4×
    * less (id, vec) shuffle volume in every downstream cell/bucket
    * path), with cosine ranking preserved to ~1e-3 — the same
    * trade-off FAISS's SQ8 codec ships. Dequantize as q_j · scale.
    *
    * Plan: ONE codegen projection (two kernel passes per row —
    * [[graft.plans.VecMaxAbs]] then [[graft.plans.QuantizeI8]]), zero
    * exchanges. */
  def quantizeI8(corpus: DataFrame, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    import graft.plans.VecExpressions.{quantizeI8 => qi8, vecMaxAbs}
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("scale", vecMaxAbs(col("v")) / lit(127.0))
      .select(col(idCol), col("scale"), qi8(col("v"), col("scale")).as("qv"))
  }

  /** Train product-quantization codebooks (Jégou et al. 2011): the
    * vector space splits into `m` subspaces of dim/m components; each
    * subspace gets its own `ksub`-centroid L2 quantizer. Init is the
    * SAME deterministic mix64-ordered sample as [[trainQuantizer]]
    * (one row set, sliced per subspace — so the SQL oracle replays the
    * init from the identical ordered CTE), refined with `iters` Lloyd
    * iterations where assignment is the [[graft.plans.PqEncode]]
    * kernel and the re-center is ONE DataFrame aggregation over all
    * subspaces at once (cells that lose every vector keep their init,
    * as in [[trainQuantizer]]). Only the m×ksub×(dim/m) codebook — the
    * FAISS ProductQuantizer header — ever reaches the driver. */
  def trainPq(corpus: DataFrame, m: Int = 4, ksub: Int = 8, iters: Int = 1,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    import graft.plans.VecExpressions.pqEncode
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val initRows = c.orderBy(graft.plans.HashExpressions.mix64(
        col(idCol).cast("long")), col(idCol)).limit(ksub)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(initRows.length == ksub, s"corpus smaller than ksub=$ksub")
    val dim = initRows.head.length
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub = dim / m
    var books = Array.tabulate(m)(s =>
      initRows.map(r => r.slice(s * dsub, (s + 1) * dsub)))
    (0 until iters).foreach { _ =>
      val sCol = (col("dim") / lit(dsub)).cast("int")
      // kernel BELOW the explode (the trainQuantizer lesson): one
      // select would re-encode the vector once per exploded dimension
      val means = c
        .select(pqEncode(col("v"), books).as("codes"), col("v"))
        .select(col("codes"), posexplode(col("v")).as(Seq("dim", "x")))
        .select(sCol.as("s"),
          element_at(col("codes"), sCol + 1).as("j"),
          col("dim"), col("x"))
        .groupBy(col("s"), col("j"), col("dim"))
        .agg(avg(col("x")).as("mval"))
        .collect()
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        val s = r.getInt(0); val j = r.getInt(1)
        next(s)(j)(r.getInt(2) - s * dsub) = r.getDouble(3)
      }
      books = next
    }
    books
  }

  /** PQ-encode the corpus: (id, codes array<int>) — the 100 TB vector
    * MEMORY path: m bytes-ish per vector instead of 8·dim (64× at
    * m=8, dim=64), which is what lets a trillion-vector index hold
    * codes hot. One codegen projection, zero exchanges. Store the
    * codes column alongside the cell partition of [[buildIvfIndex]]
    * for the standard IVFPQ layout (probe prunes cells, ADC scores
    * codes). */
  def pqEncodeCorpus(corpus: DataFrame, books: Array[Array[Array[Double]]],
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol),
      graft.plans.VecExpressions.pqEncode(
        col(vecCol).cast("array<double>").as("v"), books).as("codes"))

  /** Asymmetric-distance (ADC) top-k over PQ codes: per query the
    * m×ksub inner-product lookup table is precomputed DRIVER-side
    * (queries are a small broadcast set; the LUT stack is the
    * per-batch query state, like the IVF probe list), and each
    * (vector, query) pair costs m lookups + adds via the
    * [[graft.plans.PqLutScore]] codegen kernel — instead of `dim`
    * multiplies. The estimator approximates dot(q, x) ≈
    * Σ_s dot(q_s, centroid_s(code_s)); ranking quality is the PQ
    * reconstruction trade-off, spec-pinned against exact brute force.
    * Ties rank by vector id for determinism. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 3,
             m: Int = 4, ksub: Int = 8, iters: Int = 1,
             idCol: String = "vec_id", vecCol: String = "embedding",
             qidCol: String = "query_id", qvecCol: String = "query_vec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val books = trainPq(corpus, m, ksub, iters, idCol, vecCol)
    val codes = pqEncodeCorpus(corpus, books, idCol, vecCol)
    val (luts, qIdx) = buildQueryLuts(queries, books, qidCol, qvecCol)
    codes.join(broadcast(qIdx), col(idCol) =!= col(qidCol))
      .withColumn("score", graft.plans.VecExpressions.pqLutScore(
        col("codes"), col("__qi"), luts))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol))
          .orderBy(col("score").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("rank"),
        round(col("score"), 6).as("score"))
  }

  /** IVFPQ top-k (Jégou et al. 2011 §IV): the composed layout FAISS
    * calls IVFPQ — the IVF coarse quantizer prunes the search to
    * `nprobe` cells, and within them ADC scores m-byte PQ codes
    * instead of full vectors. This is THE trillion-vector serving
    * shape: at 100 TB the cell partition bounds what a probe READS
    * (only probed cells' files) and the PQ codes bound what it HOLDS
    * (m small codes per vector, 64× less than raw at m=8/dim=64).
    *
    * Vectors are PQ-encoded RAW (not as residuals from their coarse
    * centroid, FAISS's default): raw encoding keeps the codebook
    * independent of the cell assignment, so [[appendToIvfIndex]]-style
    * deltas reuse the frozen codebook unchanged and the SQL oracle
    * replays one codebook chain instead of nlist of them. Residual
    * encoding is the documented accuracy upgrade when cells are tight.
    *
    * Plan shape: both quantizers train driver-side (metadata-sized
    * headers — the IVF-header pattern), the corpus takes ONE codegen
    * projection (cell assignment + PQ encode), probes broadcast, and
    * scoring is the [[graft.plans.PqLutScore]] m-lookup kernel; the
    * only wide exchange is the top-k rank window on the candidate
    * set. Deterministic end to end (both samples are the shared
    * mix64 order), so DuckDB replays it exactly. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 3,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 4, ksub: Int = 8,
                iters: Int = 1, idCol: String = "vec_id",
                vecCol: String = "embedding", qidCol: String = "query_id",
                qvecCol: String = "query_vec"): DataFrame = {
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    val books = trainPq(corpus, m, ksub, iters, idCol, vecCol)
    val indexed = ivfPqEncode(corpus, cents, books, idCol, vecCol)
    ivfPqProbe(indexed, cents, books, queries, k, nprobe, idCol, qidCol, qvecCol)
  }

  /** Persist the IVFPQ index: (id, codes, cell) partitioned by cell —
    * [[buildIvfIndex]]'s layout with the PQ codes column in place of
    * the raw vectors (probes read only probed cells, and what they
    * read is m-byte codes). Returns both quantizer headers; store them
    * with the index — the same (centroids, codebooks) pair must be
    * used to probe and to append. */
  def buildIvfPqIndex(corpus: DataFrame, path: String, nlist: Int = 16,
                      m: Int = 4, ksub: Int = 8, iters: Int = 1,
                      idCol: String = "vec_id", vecCol: String = "embedding")
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    val books = trainPq(corpus, m, ksub, iters, idCol, vecCol)
    ivfPqEncode(corpus, cents, books, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    (cents, books)
  }

  /** Probe a persisted IVFPQ index: the probed cell ids are known on
    * the driver, so they push down as a static partition filter —
    * the scan reads ONLY the probed cells' code files. */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                       path: String, cents: Array[Array[Double]],
                       books: Array[Array[Array[Double]]], queries: DataFrame,
                       k: Int = 3, nprobe: Int = 4, idCol: String = "vec_id",
                       qidCol: String = "query_id",
                       qvecCol: String = "query_vec"): DataFrame = {
    import graft.plans.VecExpressions.nearestCells
    val probedCells = queries
      .select(explode(nearestCells(col(qvecCol).cast("array<double>"),
        cents, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val indexed = spark.read.parquet(path)
      .filter(col("cell").isin(probedCells: _*)) // partition pruning
    ivfPqProbe(indexed, cents, books, queries, k, nprobe, idCol, qidCol, qvecCol)
  }

  /** RESIDUAL-encoded IVFPQ top-k — FAISS's `by_residual` default and
    * the accuracy upgrade over [[ivfPqTopK]]'s raw encoding when cells
    * are tight: PQ codebooks train on (v − mean[cell]) residuals,
    * whose variance is what remains AFTER the coarse partitioning — so
    * the same m×ksub code budget spends its resolution on the
    * within-cell structure instead of re-describing the cell
    * location. The reference point is the CELL MEAN ([[cellMeans]]),
    * not the quantizer centroid: the shipped quantizer is angular
    * (normalized centroids), so subtracting its unit centroids would
    * leave residuals nearly as large as the vectors — the mean is the
    * L2 center that actually shrinks them (spec-measured: ≥2× tighter
    * reconstruction on clustered data). Scoring adds the exact
    * per-(query, probed-cell) term: dot(q, v) ≈ dot(q, mean_cell) +
    * Σ_s lut_s[code_s] with LUTs built from the residual codebooks;
    * the cell term costs one inner product per PROBE ROW (nq × nprobe
    * — metadata-sized), evaluated in the probe frame.
    *
    * The trade vs raw encoding: the codebook now depends on the cell
    * structure, so a quantizer rebuild invalidates the codes (raw
    * encoding survives it), and delta appends must residual-encode
    * under the frozen centroids. Same plan shape as [[ivfPqTopK]];
    * deterministic (shared mix64 sample), SQL-replayable. */
  def ivfPqTopKResidual(corpus: DataFrame, queries: DataFrame, k: Int = 3,
                        nlist: Int = 16, nprobe: Int = 4, m: Int = 4,
                        ksub: Int = 8, iters: Int = 1,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        qidCol: String = "query_id",
                        qvecCol: String = "query_vec"): DataFrame = {
    val cents = trainQuantizer(corpus, nlist, iters, idCol, vecCol)
    val means = cellMeans(corpus, cents, idCol, vecCol)
    val res = ivfResiduals(corpus, cents, means, idCol, vecCol)
    val books = trainPq(res.select(col(idCol), col("rv")), m, ksub, iters,
      idCol, "rv")
    val indexed = res.select(col(idCol),
      graft.plans.VecExpressions.pqEncode(col("rv"), books).as("codes"),
      col("cell"))
    ivfPqProbe(indexed, cents, books, queries, k, nprobe,
      idCol, qidCol, qvecCol, cellDotRefs = Some(means))
  }

  /** Per-cell MEAN vectors under the cosine quantizer's assignment —
    * the residual REFERENCE points. The shipped quantizer's centroids
    * are normalized (angular cells), so subtracting them would leave
    * residuals nearly as large as the vectors; the cell mean is the
    * L2 center that actually shrinks within-cell variance (what
    * FAISS's by_residual subtracts). One posexplode aggregation;
    * nlist×dim doubles reach the driver (the IVF-header pattern).
    * Empty cells keep zero vectors (they host no vectors, so their
    * reference is never read). */
  def cellMeans(corpus: DataFrame, cents: Array[Array[Double]],
                idCol: String = "vec_id",
                vecCol: String = "embedding"): Array[Array[Double]] = {
    import graft.plans.VecExpressions.nearestCell
    val dim = cents(0).length
    val rows = corpus.select(col(vecCol).cast("array<double>").as("v"))
      // kernel BELOW the explode (the trainQuantizer lesson)
      .select(nearestCell(col("v"), cents).as("cell"), col("v"))
      .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d")).agg(avg(col("x")).as("m"))
      .collect()
    val out = Array.fill(cents.length)(new Array[Double](dim))
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    out
  }

  /** (id, cell, rv = v − refs[cell]) — the residual frame both the
    * codebook training and the encode read (assignment by `cents`,
    * reference point from `refs` = [[cellMeans]]); public because a
    * delta APPEND under a frozen (cents, refs, books) triple
    * re-encodes through exactly this projection. zip_with/element_at
    * built-ins, so the DuckDB oracle replays it as list arithmetic. */
  def ivfResiduals(corpus: DataFrame, cents: Array[Array[Double]],
                   refs: Array[Array[Double]],
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    import graft.plans.VecExpressions.nearestCell
    val refsLit = array(refs.map(c => array(c.map(lit): _*)): _*)
    corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cell", nearestCell(col("v"), cents))
      .select(col(idCol), col("cell"),
        zip_with(col("v"), element_at(refsLit, col("cell") + 1),
          (a, b) => a - b).as("rv"))
  }

  /** One codegen projection: cell assignment + PQ encode. */
  private def ivfPqEncode(corpus: DataFrame, cents: Array[Array[Double]],
                          books: Array[Array[Array[Double]]],
                          idCol: String, vecCol: String): DataFrame = {
    import graft.plans.VecExpressions.{nearestCell, pqEncode}
    corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .select(col(idCol), pqEncode(col("v"), books).as("codes"),
        nearestCell(col("v"), cents).as("cell"))
  }

  /** Driver-side per-query ADC state shared by [[pqTopK]] and the
    * IVFPQ probe paths: queries collected id-SORTED (the LUT index is
    * positional), the per-query m×ksub inner-product LUT stack, and
    * the (qid → LUT index) frame. One definition so the LUT math and
    * tie order cannot drift between the pure-ADC and IVFPQ paths
    * (their nprobe=nlist equality is spec-pinned). */
  private def buildQueryLuts(queries: DataFrame,
                             books: Array[Array[Array[Double]]],
                             qidCol: String, qvecCol: String)
      : (Array[Array[Array[Double]]], DataFrame) = {
    val spark = queries.sparkSession
    import spark.implicits._
    val m = books.length
    val dsub = books(0)(0).length
    val qRows = queries
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val luts: Array[Array[Array[Double]]] = qRows.map { case (_, qv) =>
      Array.tabulate(m) { s =>
        books(s).map { cb =>
          var ip = 0.0; var d = 0
          while (d < dsub) { ip += qv(s * dsub + d) * cb(d); d += 1 }
          ip
        }
      }
    }
    (luts, qRows.map(_._1).zipWithIndex.toSeq.toDF(qidCol, "__qi"))
  }

  /** Shared probe half of the inline and indexed IVFPQ paths: LUTs
    * precompute driver-side per query ([[pqTopK]]'s batch state),
    * probes broadcast onto the cell key, ADC scores the codes, one
    * rank window cuts top-k. Cells PARTITION the corpus, so a
    * (query, vector) candidate appears at most once — no dedup. */
  private def ivfPqProbe(indexed: DataFrame, cents: Array[Array[Double]],
                         books: Array[Array[Array[Double]]],
                         queries: DataFrame, k: Int, nprobe: Int,
                         idCol: String, qidCol: String, qvecCol: String,
                         cellDotRefs: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    import graft.plans.VecExpressions.nearestCells
    val (luts, qIdx) = buildQueryLuts(queries, books, qidCol, qvecCol)
    val probes0 = queries
      .select(col(qidCol), col(qvecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(nearestCells(col("qv"), cents, nprobe)))
      .join(qIdx, qidCol)
    // residual scoring: the exact dot(q, refs[cell]) rides on the
    // probe rows (nq × nprobe of them — metadata-sized); sequential
    // left-fold matches the driver LUT loop and list_inner_product
    val probes = cellDotRefs match {
      case Some(refs) =>
        val refsLit = array(refs.map(c => array(c.map(lit): _*)): _*)
        probes0
          .withColumn("__cdot", aggregate(
            zip_with(col("qv"), element_at(refsLit, col("cell") + 1),
              (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x))
          .select(col(qidCol), col("__qi"), col("cell"), col("__cdot"))
      case None =>
        probes0.select(col(qidCol), col("__qi"), col("cell"),
          lit(0.0).as("__cdot"))
    }
    val lutScore = graft.plans.VecExpressions.pqLutScore(
      col("codes"), col("__qi"), luts)
    val scoreCol =
      if (cellDotRefs.isDefined) lutScore + col("__cdot") else lutScore
    indexed.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("score", scoreCol)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("rank"),
        round(col("score"), 6).as("score"))
  }

  /** Sign-of-dot-product signature: bit i = 1 iff dot(v, plane_i) > 0.
    * Kernel expression — see [[graft.plans.VecOps.hyperplaneSig]]. */
  def signature(vec: Column, planes: Array[Array[Double]]): Column =
    graft.plans.VecExpressions.hyperplaneSig(vec, planes)

  /** The ONE multi-table signature layout every LSH path shares:
    * (id, <vecName>, table_id, bucket) rows, one per (vector, table).
    * Build, append, index probe, and inline query all derive from
    * this frame — change the layout here or the persisted index and
    * its probes silently diverge. */
  private def signatureFrame(df: DataFrame, idCol: String, vecCol: Column,
                             vecName: String, dim: Int, bits: Int,
                             numTables: Int, seed: Long): DataFrame = {
    val tables = (0 until numTables).map(t => t -> hyperplanes(dim, bits, seed + t))
    df.select(col(idCol), vecCol.cast("array<double>").as(vecName))
      .select(col("*"), explode(array(tables.map { case (tid, planes) =>
        struct(lit(tid).as("table_id"),
          signature(col(vecName), planes).as("bucket"))
      }: _*)).as("tb"))
      .select(col(idCol), col(vecName), col("tb.table_id"), col("tb.bucket"))
  }

  /** Bucketed catalog write shared by [[buildLshIndex]] (overwrite)
    * and [[appendToLshIndex]] (append; the catalog validates the
    * bucket spec against the existing table). */
  private def writeLshIndex(sigs: DataFrame, table: String,
                            numBuckets: Int, mode: String): Unit =
    sigs.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, "table_id", "bucket")
      .sortBy("table_id", "bucket")
      .saveAsTable(table)

  /** Persist the multi-table LSH index: the bucketed signature frame
    * (id, vector, table_id, bucket) written hash-bucketed on
    * (table_id, bucket) via the session catalog. Built ONCE per corpus;
    * every subsequent query batch probes it with zero corpus-side
    * shuffle (the bucket layout satisfies the join's distribution).
    * This is the 100 TB shape: index build is the one full-corpus job,
    * per-batch cost is the probe join. */
  def buildLshIndex(corpus: DataFrame, table: String, dim: Int,
                    bits: Int = 4, numTables: Int = 8, seed: Long = 42L,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    numBuckets: Int = 16): Unit = {
    writeLshIndex(signatureFrame(corpus, idCol, col(vecCol), "v",
      dim, bits, numTables, seed), table, numBuckets, "overwrite")
  }

  /** Append a corpus DELTA to a persisted LSH index table: signatures
    * from the SAME planes (`seed`/`bits`/`numTables`/`numBuckets` must
    * match the build) appended through the catalog, which validates
    * the bucket spec — the bucketed layout the probe join relies on is
    * preserved, so per-batch probes stay zero-corpus-shuffle after any
    * number of appends. */
  def appendToLshIndex(delta: DataFrame, table: String, dim: Int,
                       bits: Int = 4, numTables: Int = 8, seed: Long = 42L,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       numBuckets: Int = 16): Unit = {
    writeLshIndex(signatureFrame(delta, idCol, col(vecCol), "v",
      dim, bits, numTables, seed), table, numBuckets, "append")
  }

  /** Query a persisted LSH index (see [[buildLshIndex]]); identical
    * semantics to [[lshTopK]] with the corpus-side signature work and
    * shuffle already paid at build time. The same plane seed must be
    * used for index build and query. */
  def lshTopKIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
                     queries: DataFrame, k: Int, dim: Int,
                     bits: Int = 4, numTables: Int = 8, seed: Long = 42L,
                     idCol: String = "vec_id",
                     qidCol: String = "query_id", qvecCol: String = "query_vec"): DataFrame = {
    val q = signatureFrame(queries, qidCol, col(qvecCol), "qv",
      dim, bits, numTables, seed)
    val c = spark.table(table)
    val candidates = c.join(q, Seq("table_id", "bucket"))
      .filter(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol), col("v"), col("qv"))
      .withColumn("sim", cosine(col("v"), col("qv")))
      .groupBy(col(qidCol), col(idCol))
      .agg(max(col("sim")).as("sim")) // union across tables
    candidates.withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** Multi-table LSH ANN: `numTables` independent `bits`-bit
    * hyperplane signatures; each query scores the union of its buckets
    * across tables (equi-join on (table, bucket) — a hash shuffle, no
    * cross product). Recall for neighbors at angle θ is
    * 1-(1-p^bits)^numTables with p = 1-θ/π, tunable per corpus; bucket
    * size shrinks 2^-bits, so candidate work stays
    * numTables·|corpus|/2^bits per query. The corpus is replicated
    * numTables times into the bucket index — the standard LSH
    * space-for-recall trade; at 100 TB the index is built once and
    * reused across query batches. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              bits: Int = 4, numTables: Int = 8, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "query_id", qvecCol: String = "query_vec"): DataFrame = {
    val cv = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val qv = queries.select(col(qidCol), col(qvecCol).cast("array<double>").as("qv"))
    // candidate IDs only through the bucket join + cross-table distinct;
    // vectors are attached after, so each candidate is scored once and
    // the dedup shuffle moves narrow (query_id, vec_id) rows
    val c = signatureFrame(corpus, idCol, col(vecCol), "v",
      dim, bits, numTables, seed).drop("v")
    val q = signatureFrame(queries, qidCol, col(qvecCol), "qv",
      dim, bits, numTables, seed).drop("qv")
    val candidates = c.join(q, Seq("table_id", "bucket"))
      .filter(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol))
      .dropDuplicates(qidCol, idCol) // union across tables
    val scored = candidates.join(cv, idCol).join(broadcast(qv), qidCol)
      .withColumn("sim", cosine(col("v"), col("qv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }
}
