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
