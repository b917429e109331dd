package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing and its core primitive, a grouped
  * running sum that stays parallel when the grouping column has LOW
  * cardinality.
  *
  * The naive plan — `sum(x) over (partition by g order by o)` — hash
  * partitions on `g` alone, so with ~5 languages the entire corpus
  * funnels through 5 tasks: correct at any SF, serial at 100 TB. The
  * two-phase shape here is the same trick as
  * [[Surrogate.rangeDenseIds]]: range-partition on (group, order) so
  * each task owns a contiguous slice, compute the running sum locally
  * per slice, then shift each slice by the total of the earlier slices
  * of the same group. The only cross-partition state is the per-(slice,
  * group) totals — `numPartitions × groups-per-slice` METADATA rows
  * (each slice holds contiguous (g, o) ranges, so it spans at most two
  * groups' boundaries) — which ride a broadcast join back onto the
  * data. Parallelism is `numPartitions`, independent of |groups|.
  */
object Packing {

  /** Running sum of `valueCol` per `groups`, ordered by `order` within
    * each group, as column `cumName` — equal to
    * `sum(value) OVER (PARTITION BY groups ORDER BY order ROWS
    * UNBOUNDED PRECEDING)` — without a per-group serial task.
    *
    * `order` must be a total order within each group (ties across a
    * range-partition boundary would make the local/offset split
    * ambiguous); the packing use case orders by a unique doc id.
    *
    * The range-partitioned input is persisted because BOTH the offsets
    * aggregate and the data pass read it: range-boundary sampling
    * depends on row order, so two independent evaluations could
    * disagree on the row→partition mapping and mis-shift a slice
    * (same reasoning as [[Surrogate.rangeDenseIds]]). `materialize`
    * (default) eagerly pins the result and releases that cache.
    * `materialize = false` keeps the plan inspectable and skips the
    * checkpoint copy, but the persisted shard input then lives until
    * the session drops it — each CALL pins one cached copy of the
    * projected input, so repeated invocations in a long-lived session
    * must either keep the default or clear the cache between runs
    * (the bench/verify harnesses do). */
  def groupedRunningSum(df: DataFrame, groups: Seq[String], order: Seq[String],
                        valueCol: Column, cumName: String,
                        numPartitions: Int = 32,
                        materialize: Boolean = true): DataFrame = {
    val gCols = groups.map(col)
    val oCols = order.map(col)
    val parted = df.withColumn("__v", valueCol)
      .repartitionByRange(numPartitions, (gCols ++ oCols): _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // local pass: running sum within (slice, group) — parallelism is
    // the slice count, and the window's sort is a no-op re-sort of an
    // already range-sorted slice
    val localW = Window.partitionBy((col("__pid") +: gCols): _*)
      .orderBy(oCols: _*).rowsBetween(Window.unboundedPreceding, 0)
    // offsets: for each (slice, group), the sum of the SAME group's
    // values in earlier slices. Aggregated frame first — metadata-sized
    // — then a tiny window over it; partitioning that window by group
    // is fine BECAUSE it runs on ≤ numPartitions rows per group, not
    // on the data.
    val totals = parted.groupBy((col("__pid") +: gCols): _*)
      .agg(sum(col("__v")).as("__tot"))
    val offW = Window.partitionBy(gCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__offset", coalesce(sum(col("__tot")).over(offW), lit(0L)))
      .select((col("__pid").as("__opid") +:
        groups.map(g => col(g).as(s"__og_$g")) :+ col("__offset")): _*)
    // null-safe equality on the group columns: a NULL group is a group
    // (window PARTITION BY semantics), and a plain equi-join would
    // silently drop its rows
    val cond = ((col("__pid") === col("__opid")) +:
      groups.map(g => col(g) <=> col(s"__og_$g"))).reduce(_ && _)
    val out = parted
      .withColumn("__local", sum(col("__v")).over(localW))
      .join(broadcast(offsets), cond)
      .withColumn(cumName, col("__local") + col("__offset"))
      .drop(("__v" +: "__pid" +: "__local" +: "__opid" +: "__offset" +:
        groups.map(g => s"__og_$g")): _*)
    if (materialize) {
      val pinned = out.localCheckpoint(true)
      parted.unpersist(blocking = false)
      pinned
    } else out
  }

  /** Token-budget sequence packing (running-budget approximation of
    * LLM context-window packing): per group, docs in `order` are
    * chunked wherever the running token count crosses `budget`;
    * `seqName` = the chunk index a doc STARTS in. Output adds
    * (cum token count - n_tokens) div budget over the two-phase
    * running sum — no per-group serial task (see
    * [[groupedRunningSum]]). `tokensCol` must be non-negative. */
  def packSequences(df: DataFrame, groups: Seq[String], order: Seq[String],
                    tokensCol: Column, budget: Long, seqName: String,
                    numPartitions: Int = 32,
                    materialize: Boolean = true): DataFrame = {
    require(budget > 0, "budget must be positive")
    groupedRunningSum(df.withColumn("__n", tokensCol), groups, order,
        col("__n"), "__cum", numPartitions, materialize)
      // `div` (integer division), not float `/` + floor: the cumsum of
      // a 100 TB corpus outgrows a double's 2^53 integer range
      .withColumn(seqName, expr(s"(__cum - __n) div ${budget}L"))
      .drop("__n", "__cum")
  }
}
