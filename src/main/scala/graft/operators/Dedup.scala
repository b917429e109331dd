package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-based re-expression of the reference's repo ingestion dedup
  * (db/insert_from_tmp_tables.sql:13-54).
  *
  * The reference does: groupBy(clone_path) computing
  * max(updated_at), max(pushed_at), min(open_issues_count); then an inner
  * self-join back on (key, all three extremes) plus DISTINCT; then a
  * LEFT JOIN against already-inserted rows keeping only misses; then
  * non-empty-key filters.
  *
  * Spark-first shape: the groupBy+self-join collapses into window
  * aggregates over a single hash partitioning of the key (one shuffle,
  * no join), and the "already present" check is a `left_anti` join.
  * At 100 TB the window shuffle partitions by the dedup key
  * (high-cardinality `clone_path`), so it scales horizontally; skewed
  * keys are handled by AQE skew-join settings, and the anti-join's right
  * side (already-present keys) is a narrow projection that Catalyst
  * broadcast-joins when small.
  */
object Dedup {


  /** Connected components of a near-dup pair graph — the clustering
    * step between candidate pairs and "keep one canonical doc per
    * group". Hash-min label propagation: every node starts as its own
    * component; each iteration pushes the running minimum label across
    * edges (join + union + groupBy-min, all hash-partitioned on the
    * node id) until a fixpoint. Iteration count is bounded by the
    * component diameter — near-dup graphs are clique-ish, so 2-4
    * passes in practice; `maxIters` is a safety valve, and the driver
    * only ever sees a 1-row convergence probe, never data. At larger
    * diameters swap in alternating large-star/small-star contraction
    * (halves the rounds); the per-iteration plan shape is identical.
    *
    * Returns (idCol, canonical_id) for EVERY node (singletons map to
    * themselves); canonical_id = the component's minimum id, giving
    * the deterministic keep-lowest-id policy downstream.
    *
    * `nodes` must cover every id appearing in `edges` — an endpoint
    * missing from `nodes` enters the label frame mid-iteration without
    * its own id as a candidate label, so its component minimum can be
    * wrong. (The near-dup queries derive edges from the node corpus,
    * so this holds by construction.)
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, idCol: String,
                          aCol: String, bCol: String,
                          maxIters: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    // Per-round lineage truncation. With a checkpoint dir the rounds
    // are RELIABLY checkpointed (survive executor loss — required on a
    // real cluster); without one, localCheckpoint keeps the local[32]
    // fast path (state dies with an executor, fine single-JVM).
    checkpointDir.foreach(nodes.sparkSession.sparkContext.setCheckpointDir)
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(true)
    // persist the EDGE LIST, not the symmetrized union: the union's two
    // branches would each evaluate the (expensive) pair-generation plan
    // once before the cache materializes; cached edges make the
    // symmetrization two cheap cache scans
    val cachedEdges = edges.persist()
    val sym = cachedEdges.select(col(aCol).as("x"), col(bCol).as("y"))
      .unionByName(cachedEdges.select(col(bCol).as("x"), col(aCol).as("y")))
    // each round references `labels` TWICE (join + union), so without
    // lineage truncation the logical plan doubles per round and
    // Catalyst analysis goes exponential past ~12 rounds. Eager
    // truncation materializes the round and resets the plan to a
    // leaf — cost stays linear in rounds.
    var labels = truncate(nodes.select(col(idCol).as("id"), col(idCol).as("comp")))
    // labels only ever DECREASE under min-propagation, so the sum of
    // labels is a strictly-decreasing convergence witness: one cheap
    // aggregate per round instead of a full old-vs-new join. Over zero
    // rows the sum is NULL — empty graph, already converged.
    var prevSum = Option(labels.agg(sum(col("comp"))).head().get(0))
    var done = prevSum.isEmpty
    var i = 0
    while (!done && i < maxIters) {
      val pushed = labels.join(sym, col("id") === col("x"))
        .select(col("y").as("id"), col("comp"))
      val updated = truncate(labels.unionByName(pushed)
        .groupBy(col("id")).agg(min(col("comp")).as("comp")))
      val newSum = Option(updated.agg(sum(col("comp"))).head().get(0))
      labels = updated
      done = newSum == prevSum
      prevSum = newSum
      i += 1
    }
    cachedEdges.unpersist()
    if (!done)
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIters=$maxIters " +
          "rounds — labels would be wrong (partial propagation); raise " +
          "maxIters (diameter bound) or pre-contract the graph")
    labels.select(col("id").as(idCol), col("comp").as("canonical_id"))
  }

  /** Keep the rows attaining ALL the given per-key extremes
    * (max over `maxCols`, min over `minCols`), then DISTINCT — exactly
    * the reference's semantics (insert_from_tmp_tables.sql:39-51),
    * including its NULL behavior (a NULL extreme never equals, so the
    * row drops) and its multi-row behavior on ties. */
  def latestWins(df: DataFrame, keys: Seq[String],
                 maxCols: Seq[String], minCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    // materialize the extremes as columns first (window functions are
    // not allowed directly inside a filter)
    val extremes =
      maxCols.map(c => (c, s"__max_$c", max(col(c)).over(w))) ++
      minCols.map(c => (c, s"__min_$c", min(col(c)).over(w)))
    val withExtremes = extremes.foldLeft(df) {
      case (d, (_, aux, e)) => d.withColumn(aux, e)
    }
    val cond = extremes.map { case (c, aux, _) => col(c) === col(aux) }
      .reduce(_ && _)
    withExtremes.filter(cond)
      .drop(extremes.map(_._2): _*)
      .dropDuplicates()
  }

  /** Rows of `incoming` whose key is absent from `existing`
    * (insert_from_tmp_tables.sql:52-54's `LEFT JOIN ... WHERE id IS
    * NULL`), with the reference's non-empty-key guards expressed as
    * arbitrary residual predicates. */
  def antiJoinNew(incoming: DataFrame, existing: DataFrame,
                  keys: Seq[String], guards: Seq[Column] = Nil): DataFrame = {
    val filtered = guards.foldLeft(incoming)((df, g) => df.filter(g))
    filtered.join(existing.select(keys.map(col): _*).dropDuplicates(keys),
      keys, "left_anti")
  }

  /** Exact content dedup for the LLM pipeline: one hash-shuffle on
    * sha2(content) with map-side partial aggregation; keeps the smallest
    * id per content group and the duplicate count. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dupes"))
      .select(col(idCol), col("n_dupes"))

  /** Insert-if-absent (the reference's fetch*ID existence checks,
    * ght2dm.go:440-490, done row-at-a-time there; set-based here):
    * result = existing ∪ (incoming \ existing by key), with incoming
    * deduplicated on the key first. */
  def idempotentUpsert(existing: DataFrame, incoming: DataFrame,
                       keys: Seq[String]): DataFrame = {
    val newRows = incoming.dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).dropDuplicates(keys),
        keys, "left_anti")
    existing.unionByName(newRows)
  }
}
