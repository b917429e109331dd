package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics over a crawl: PageRank as the canonical
  * "which domains/pages carry authority" signal a web-corpus curation
  * pipeline feeds into quality weighting (the OPIC/Common-Crawl rank
  * columns). The reference engine has no graph surface; this is part
  * of the LLM-pipeline extension (SURVEY §2b).
  *
  * Design for exact cross-engine replay AND 100 TB scale:
  *
  *   - **Integer micro-units, not doubles.** Ranks live in units of
  *     1e-6 (`microBase` = 1.0). Per-edge contribution is integer
  *     floor division `rank div outdeg`; the damping step is
  *     `base + (dampNum * inMass) div dampDen`. Long sums are
  *     order-independent, so the result is bit-identical however
  *     Spark schedules the shuffle — the same discipline as
  *     [[Similarity]]'s micro-unit distance chains. Headroom: total
  *     mass is ≤ n·1e6, so Long is safe to n ≈ 9·10^12 nodes.
  *   - **Fixed iteration count** (the production norm — PageRank is
  *     consumed as a feature, not solved to fixpoint), so the DuckDB
  *     oracle replays it as an unrolled CTE chain.
  *   - **One shuffle pair per iteration**: join ranks to the
  *     degree-annotated edge list on `src`, aggregate contributions
  *     on `dst` (map-side partial agg), left-join back to the node
  *     set. The edge list is degree-annotated ONCE and persisted.
  *   - **One JOB per round barrier** ([[materializeFold]]): each
  *     round's frame is materialized into a persisted InternalRow RDD
  *     and any scalar the next step needs (HITS' renormalization max)
  *     is folded over the SAME pass — not a checkpoint job followed
  *     by a separate aggregate/broadcast job. The rebuilt frame keeps
  *     the round's output partitioning (`LogicalRDD.fromDataset`, the
  *     `Dataset.checkpoint` contract), so the next round's join does
  *     not re-exchange it. Under `checkpointDir` the same pass also
  *     writes a reliable checkpoint for executor-loss recovery on a
  *     real cluster.
  *   - **Dangling mass evaporates** (nodes with no out-edges absorb
  *     rank but emit none). This is the common simplification in
  *     curation settings where rank is a relative ordering signal;
  *     redistributing dangling mass would add a driver-side scalar
  *     per round without changing the ordering materially.
  *
  * Multi-edges would double-contribute, so the edge list is
  * deduplicated here; the extra `distinct` shares its hash
  * partitioning with the out-degree aggregation that follows it.
  */
object Graph {

  /** Rows per task the iterative loops aim for when right-sizing
    * their shuffle width: frames are (id, long) pairs, so ~128k rows
    * ≈ 2-3 MB per task — enough work to amortize task launch, small
    * enough to stay far from spill. */
  private val LoopRowsPerTask: Long = 131072L

  /** Right-size the per-round shuffle width to the frame the loop
    * actually moves. The iterative loops' stages are EXCHANGE-FREE by
    * design (both join sides pre-partitioned, the round barrier
    * preserves partitioning), which means AQE never gets a shuffle to
    * coalesce — width is locked at whatever the initial repartition
    * chose, and the default width runs node-sized frames (100k–1.5M
    * rows) through 10-30 rounds of mostly-empty tasks: a pure
    * scheduling floor at local scale. Width ∝ rows fixes the floor
    * while keeping the 100 TB path: a 10B-edge graph with the session
    * default at cluster width keeps that width (the min), and the
    * count that sizes it is one cheap job over the already-persisted
    * edge frame. */
  private[operators] def loopWidth(spark: org.apache.spark.sql.SparkSession,
                                   rows: Long): Int = {
    val dflt = spark.conf.get("spark.sql.shuffle.partitions").toInt
    math.max(1, math.min(dflt,
      ((rows + LoopRowsPerTask - 1) / LoopRowsPerTask).toInt))
  }

  /** Run `body` with `spark.sql.shuffle.partitions` set to `w` so the
    * loop's INTERNAL exchanges (the per-round partial-agg shuffle)
    * match the pre-partitioned caches' width. A conf-based scope is
    * what keeps the loop's map-side partial aggregation — an explicit
    * repartition below the agg would drop the combine and push
    * edge-count rows through every round's exchange. The override is
    * THREAD-CONFINED ([[GraftSqlShim.withConfOverride]]: a cloned
    * SQLConf installed as this thread's `SQLConf.withExistingConf`
    * thread-local, which planning consults before the session conf),
    * so a query planned CONCURRENTLY on the same SparkSession from
    * another thread — e.g. the grouped bench pass, or any multi-tenant
    * session — keeps the session width. The session conf itself is
    * never mutated. GraphSpec pins the isolation both ways. */
  private[operators] def withShuffleWidth[A](
      spark: org.apache.spark.sql.SparkSession,
      w: Int)(body: => A): A =
    GraftSqlShim.withConfOverride(spark,
      Map("spark.sql.shuffle.partitions" -> w.toString))(body)

  /** One-job round barrier for the iterative loops: materialize `df`
    * into a persisted (optionally reliably-checkpointed) InternalRow
    * RDD and fold `seq`/`comb` over the SAME action, so the per-round
    * cost is one job — not a materialize job plus an aggregate job.
    * Returns the rebuilt frame (output partitioning/ordering
    * preserved), the cache handle for later `unpersist`, and the fold
    * result. The fold only READS primitive columns, so the unsafe-row
    * buffer reuse inside the scan is safe; the persisted copy is
    * `_.copy()`-ed exactly as `Dataset.localCheckpoint` does. */
  private def materializeFold[A: ClassTag](df: DataFrame, zero: A,
      reliable: Boolean)(seq: (A, InternalRow) => A)(
      comb: (A, A) => A): (DataFrame, RDD[InternalRow], A) = {
    val cached = GraftSqlShim.toInternalRowRdd(df).map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // mark BEFORE the action: the checkpoint job then reads the
    // just-persisted blocks instead of recomputing the round
    if (reliable) cached.checkpoint()
    val folded = cached.aggregate(zero)(seq, comb)
    (GraftSqlShim.materializedFrom(df, cached), cached, folded)
  }

  /** PageRank in integer micro-units. Returns (`node`, `rank_micro`)
    * for every node appearing as a source or destination.
    *
    * @param edges    directed edge list; duplicates are removed
    * @param srcCol   source-id column (integral)
    * @param dstCol   destination-id column (integral)
    * @param iters    fixed number of power iterations
    * @param dampNum  damping numerator (85 → d = 0.85)
    * @param dampDen  damping denominator
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10,
               dampNum: Long = 85L, dampDen: Long = 100L,
               checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      "damping must satisfy 0 <= dampNum <= dampDen")
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val reliable = checkpointDir.isDefined
    val microBase = 1000000L
    // base = (1-d)·1.0 in micro-units, exact: 1e6·(den-num) div den
    val baseMicro = microBase * (dampDen - dampNum) / dampDen

    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist()
    // the loop width derives from the edge count (the largest frame
    // any round moves); the count doubles as the cache warm-up
    val w = loopWidth(spark, e.count())
    // out-degree rides every edge row; annotate once, persist — the
    // loop below re-reads this frame `iters` times. Pre-partitioned
    // on the per-round join key so only the (much smaller) rank frame
    // moves each iteration, not the edge list.
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, "src").repartition(w, col("src")).persist()

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().repartition(w, col("node")).persist()

    var ranks = nodes.withColumn("rank_micro", lit(microBase))
    var prev: Option[RDD[InternalRow]] = None
    withShuffleWidth(spark, w) {
      for (_ <- 1 to iters) {
        val contribs = ed.join(ranks, ed("src") === ranks("node"))
          .select(col("dst"), expr("rank_micro div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
        val next = nodes.join(contribs, nodes("node") === contribs("dst"), "left")
          .select(col("node"),
            (lit(baseMicro) +
              expr(s"($dampNum * coalesce(in_mass, 0L)) div $dampDen"))
              .as("rank_micro"))
        // one materialization barrier (one JOB) per round; the
        // per-round stages are w-wide (loopWidth), so the local floor
        // is task-count-proportional to the DATA, not to the default
        // shuffle width
        val (truncated, cache, _) =
          materializeFold(next, 0L, reliable)((m, _) => m + 1L)(_ + _)
        prev.foreach(_.unpersist(false))
        prev = Some(cache)
        ranks = truncated
      }
    }
    // the final frame is cache/checkpoint-backed (its blocks stay
    // resident — the retained-cache contract of an iterative result);
    // its inputs can go
    e.unpersist(false)
    ed.unpersist(false)
    nodes.unpersist(false)
    ranks
  }

  /** HITS (Kleinberg) hubs & authorities in integer micro-units —
    * the complementary link signal to [[pageRank]]: directories/link
    * farms score as hubs, canonical pages as authorities, and the
    * PAIR is what a crawl-curation policy wants (a high-PageRank hub
    * farm is exactly the thing to down-weight).
    *
    * Same exactness discipline as [[pageRank]]: scores live in
    * micro-units; each half-step sums Longs (order-independent) and
    * renormalizes to ≤ 1e6 by an integer division
    * `x div ceil(max/1e6)` — a pure-integer stand-in for the usual
    * max-normalization that never multiplies (no overflow for any
    * corpus size: raw sums are bounded by n·1e6, never squared). The
    * max is folded out of the SAME job that materializes the raw
    * half-step ([[materializeFold]]) and lands in the scaling
    * projection as a literal — one job per half-step, no broadcast
    * exchange, no second pass over the cache.
    *
    * The edge list is persisted TWICE, pre-partitioned on `src` and
    * on `dst` — the half-steps alternate join keys, and without both
    * orientations every half-step re-shuffles the (largest) edge side.
    *
    * @param checkpointDir reliable-checkpoint directory for
    *   executor-loss recovery on a real cluster (same contract as
    *   [[pageRank]]); default executor-local persisted blocks only.
    *
    * Returns (`node`, `auth_micro`, `hub_micro`) for every node.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 8,
           checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val reliable = checkpointDir.isDefined
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist()
    // loop width from the edge count (see loopWidth); count warms e
    val w = loopWidth(spark, e.count())
    val eBySrc = e.repartition(w, col("src")).persist()
    val eByDst = e.repartition(w, col("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().repartition(w, col("node")).persist()

    // renormalize x -> x div ceil(max/1e6): ONE job materializes the
    // raw frame into a persisted RDD AND folds its max; the scaled
    // view is a narrow projection over the same cache with the
    // divisor as a literal
    def rescale(raw: DataFrame, c: String): (DataFrame, RDD[InternalRow]) = {
      val idx = raw.schema.fieldIndex(c)
      val (t, cache, mx) = materializeFold(raw, Long.MinValue, reliable)(
        (m, r) => if (r.isNullAt(idx)) m else math.max(m, r.getLong(idx)))(
        math.max)
      val divisor = math.max(1L, (mx + 999999L) / 1000000L)
      (t.select(col("node"), expr(s"$c div ${divisor}L").as(c)), cache)
    }

    var hub = nodes.withColumn("hub_micro", lit(1000000L))
    var auth: DataFrame = null
    var prev: List[RDD[InternalRow]] = Nil
    withShuffleWidth(spark, w) {
      for (_ <- 1 to iters) {
        val aRaw = nodes.join(
            eBySrc.join(hub, eBySrc("src") === hub("node"))
              .groupBy(col("dst")).agg(sum(col("hub_micro")).as("a_raw")),
            nodes("node") === col("dst"), "left")
          .select(col("node"), coalesce(col("a_raw"), lit(0L)).as("auth_micro"))
        val (aScaled, aCache) = rescale(aRaw, "auth_micro")
        auth = aScaled
        val hRaw = nodes.join(
            eByDst.join(auth, eByDst("dst") === auth("node"))
              .groupBy(col("src")).agg(sum(col("auth_micro")).as("h_raw")),
            nodes("node") === col("src"), "left")
          .select(col("node"), coalesce(col("h_raw"), lit(0L)).as("hub_micro"))
        val (hScaled, hCache) = rescale(hRaw, "hub_micro")
        hub = hScaled
        // the PREVIOUS round's caches fed this round's (already
        // materialized) half-steps; this round's pair must outlive the
        // loop — the final result projects over them
        prev.foreach(_.unpersist(false))
        prev = List(aCache, hCache)
      }
    }
    // every node appears exactly once in each scaled frame (the raw
    // half-steps are nodes-left-joins), so the node set needs no
    // third join; the output reads only the last two cached RDDs
    val out = auth
      .join(hub, Seq("node"))
      .select(col("node"), col("auth_micro"), col("hub_micro"))
    e.unpersist(false)
    eBySrc.unpersist(false)
    eByDst.unpersist(false)
    nodes.unpersist(false)
    out
  }

  /** Per-node triangle counts + local clustering coefficient — the
    * community-density signal (link farms and boilerplate rings are
    * triangle-dense; organic link neighborhoods are sparse).
    *
    * The compact-forward / degree-orientation algorithm: edges are
    * oriented from the lower-(degree, id) endpoint to the higher, so
    * every node's ORIENTED out-degree is O(√m) on any graph — wedge
    * volume (the one superlinear risk) is Σ outdeg² ≤ O(m^1.5)
    * instead of Σ deg² (which a hub-heavy crawl graph makes
    * quadratic). Each triangle is generated EXACTLY once: from its
    * lowest-rank vertex, with the out-neighbor pair ordered by id.
    * Three hash-join shuffles, no iteration, exact integer counts;
    * the coefficient `2·T / (d·(d−1))` is one final float division
    * (null for degree < 2).
    *
    * Input edges are symmetrized and deduplicated here; self-loops
    * are dropped. The (edge-sized) working caches are released before
    * returning: the per-node result is materialized once
    * ([[materializeFold]]) and the returned frame reads those blocks
    * — the same retained-cache contract as the iterative results.
    * Returns (node, degree, triangles, clustering). */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val raw = edges.select(col(aCol).cast("long").as("x"),
        col(bCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
    val und = raw.select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .distinct().persist()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree")).persist()

    // orient u—v from the lower (degree, id) endpoint (rank compare)
    val du = deg.select(col("node").as("u"), col("degree").as("du"))
    val dv = deg.select(col("node").as("v"), col("degree").as("dv"))
    val oriented = und.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))

    // wedges at the lowest-rank vertex; the out-neighbor pair is
    // id-ordered so each candidate (t1, t2) appears once, and the
    // closing edge is looked up in canonical id order
    val o1 = oriented.select(col("s"), col("t").as("t1"))
    val o2 = oriented.select(col("s"), col("t").as("t2"))
    val wedges = o1.join(o2, "s").where(col("t1") < col("t2"))
    val tri = wedges.join(und,
      col("t1") === col("u") && col("t2") === col("v"))
      .select(col("s"), col("t1"), col("t2"))

    val perNode = tri
      .select(explode(array(col("s"), col("t1"), col("t2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    val out = deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          (lit(2.0) * col("triangles").cast("double")) /
            (col("degree").cast("double") * (col("degree").cast("double") - 1.0))))
    // node-sized result; materialize it so the edge-sized und/deg
    // caches can be dropped instead of accumulating across calls
    val (res, _, _) =
      materializeFold(out, 0L, reliable = false)((m, _) => m + 1L)(_ + _)
    und.unpersist(false)
    deg.unpersist(false)
    res
  }
}
