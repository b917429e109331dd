package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, composed from
  * existing operators so Catalyst/AQE still own the physical plan
  * (custom-operator preference (a): compose before extending).
  *
  *  - [[asOfJoinBackward]]: for each left row, the latest right row at
  *    or before it (event enrichment against a slowly-changing
  *    dimension / snapshot stream).
  *  - [[rangeJoin]]: points joined to every containing interval
  *    without a cross product, via time-bucket equi-join.
  */
object Temporal {

  /** Backward as-of join: for every left row, attach the right row with
    * the greatest `rightTime` <= `leftTime` within the same `keys`
    * group (SQL `ASOF JOIN` semantics, left-outer flavor: unmatched
    * left rows keep nulls).
    *
    * NOT implemented as join-then-filter-then-max (that explodes to
    * |left| x |right-per-key| intermediate rows). Both sides are
    * unioned and sorted ONCE per key — a single hash-partition shuffle
    * + per-partition sort, the same physical cost as one
    * sort-merge join — and each left row picks up the running last
    * right payload via a window. Right rows order BEFORE left rows at
    * equal timestamps, so a right row exactly at `leftTime` matches
    * (<=, as in ASOF). The right payload rides inside a struct: `last(_,
    * ignoreNulls)` then skips left rows (null struct) but never a
    * matched right row whose payload VALUE is null.
    *
    * At 100 TB: with `timeSplits = 1` (default) partitioning is by key
    * only, so a pathologically hot key serializes into one task. For
    * such corpora pass `timeSplits > 1`: the time axis is cut at
    * approximate left-time quantiles and the window partitions on
    * (keys, time range) — a hot key spreads over `timeSplits` tasks.
    * Left rows near a range's start still see earlier right rows via a
    * boundary carry-forward: the latest right row of each (key, earlier
    * range) re-enters every later range as a synthetic row ordered
    * before that range's real rows (≤ keys·timeSplits²/2 metadata-sized
    * carry rows — never a data explosion). Results are IDENTICAL to the
    * single-pass plan; the quantile probe is one extra small job over
    * the left time column, and boundary quality only affects balance,
    * never correctness.
    *
    * Right rows with a NULL `rightTime` are dropped before the union:
    * SQL ASOF (and a `l.t >= r.t` predicate) never matches a NULL
    * time, whereas the ascending sort would otherwise place them first
    * and hand them to every left row before the first real snapshot.
    *
    * Right columns (minus keys and `rightTime`) must not collide with
    * left column names; `rightTime` surfaces as `matched_<rightTime>`.
    * The right side should be unique per (keys, rightTime) — dedupe
    * upstream (e.g. [[Dedup.latestWins]]) — otherwise which duplicate
    * wins is tie-order dependent.
    */
  def asOfJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       timeSplits: Int = 1): DataFrame = {
    require(timeSplits >= 1, "timeSplits must be >= 1")
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTime).toSeq
    require(payloadCols.intersect(left.columns.toSeq).isEmpty,
      s"right payload columns ${payloadCols.mkString(",")} collide with left")
    val matchedTime = s"matched_$rightTime"
    val rStruct = struct((col(rightTime).as(matchedTime) +:
      payloadCols.map(col)): _*)
    val rTagged = right.filter(col(rightTime).isNotNull).select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+
        rStruct.as("__r")): _*)
    val lTagged = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(rTagged.schema("__r").dataType).as("__r") :+
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l")): _*)
    val unioned = rTagged
      .withColumn("__l", lit(null).cast(lTagged.schema("__l").dataType))
      .unionByName(lTagged)
    // hot-key mitigation: augment the window partition key with a
    // coarse time-range id and carry each (key, range)'s latest right
    // row forward into all later ranges, ordered BEFORE their real
    // rows (its __t is strictly below the range's lower boundary, and
    // __side = -1 breaks any residual tie). Distinct boundaries only:
    // duplicate quantiles on a point-mass distribution would create
    // empty ranges, not wrong answers, but they waste carry rows.
    val (partCols, ordered) =
      if (timeSplits == 1) (keys.map(col), unioned)
      else {
        val probs = (1 until timeSplits).map(_.toDouble / timeSplits).toArray
        val bs = left.select(col(leftTime).cast("double").as("__q"))
          .na.drop().stat.approxQuantile("__q", probs, 0.01)
          .distinct.sorted.toSeq
        // range id = #{boundaries <= t}; the double cast is a
        // CONSISTENT mapping on both sides of every comparison, so a
        // lossy long→double rounding can only move a whole row across
        // a boundary, never split its semantics
        val rangeOf = bs.foldLeft(lit(0)) { (acc, b) =>
          acc + when(col("__t").cast("double") >= b, 1).otherwise(0) }
        val nb = bs.size
        val ranged = unioned.withColumn("__range", rangeOf)
        // aggregated from rTagged DIRECTLY (not a side-filter of the
        // union) so the carry branch never depends on the left scan.
        // The right input is still read twice — once here, once in the
        // union — the price of the split pass; the right side of an
        // as-of is the snapshot stream, normally the small one.
        val rAgg = rTagged.withColumn("__range", rangeOf)
          .groupBy((keys.map(col) :+ col("__range")): _*)
          .agg(max_by(struct(col("__t").as("t"), col("__r").as("r")),
            col("__t")).as("__m"))
        // explode guard: sequence(a, b) with a > b generates a
        // DESCENDING sequence, not an empty one — null out the
        // last range's carry instead (explode drops nulls)
        val carried = rAgg.select(
          (keys.map(col) :+ col("__m.t").as("__t") :+
            lit(-1).as("__side") :+ col("__m.r").as("__r") :+
            lit(null).cast(lTagged.schema("__l").dataType).as("__l") :+
            explode(when(col("__range") < nb,
              sequence(col("__range") + 1, lit(nb)))).as("__range")): _*)
        (keys.map(col) :+ col("__range"), ranged.unionByName(carried))
      }
    val w = Window.partitionBy(partCols: _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = ordered
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(col("__l.*") +:
      (matchedTime +: payloadCols).map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Pick `timeSplits` from OBSERVED key skew instead of asking the
    * caller: estimate the hottest key's row count from a bounded
    * deterministic sample of the left side and split so no single
    * (key, time-range) window partition holds more than `targetRows`
    * left rows. One small sample+aggregate job; the estimate only
    * steers parallelism, never correctness (any return value yields
    * identical join results).
    *
    * At 100 TB: `targetRows` bounds a task's sort buffer — the
    * default keeps a hot key's per-task slice in the tens of MB for
    * typical row widths. `maxSplits` caps the carry-row overhead
    * (≤ keys·splits²/2 metadata rows). */
  /** Last value [[autoTimeSplits]] computed (-1 = never ran): a
    * test/ops-observable record that the skew probe actually executed
    * and what it decided — the BucketCap observability pattern. */
  val lastAutoTimeSplits = new java.util.concurrent.atomic.AtomicInteger(-1)

  def autoTimeSplits(left: DataFrame, keys: Seq[String],
                     targetRows: Long = 4000000L,
                     sampleFraction: Double = 0.01,
                     maxSplits: Int = 64, seed: Long = 42L): Int = {
    require(targetRows > 0 && sampleFraction > 0 && sampleFraction <= 1)
    // aliased aggregate, not .count(): a join key literally named
    // "count" would otherwise make the max() reference ambiguous
    val hottestSampled = left.sample(withReplacement = false,
        sampleFraction, seed)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__graft_n"))
      .agg(max(col("__graft_n"))).head().get(0)
    val hottest = Option(hottestSampled)
      .map(_.asInstanceOf[Number].longValue() / sampleFraction).getOrElse(0.0)
    val splits = math.ceil(hottest / targetRows).toLong
    val chosen = math.max(1L, math.min(splits, maxSplits.toLong)).toInt
    lastAutoTimeSplits.set(chosen)
    chosen
  }

  /** [[asOfJoinBackward]] with `timeSplits` chosen by
    * [[autoTimeSplits]] — skewed inputs spread their hot keys, uniform
    * inputs keep the plain single-pass plan. */
  def asOfJoinBackwardAuto(left: DataFrame, right: DataFrame,
                           keys: Seq[String], leftTime: String,
                           rightTime: String,
                           targetRows: Long = 4000000L): DataFrame =
    asOfJoinBackward(left, right, keys, leftTime, rightTime,
      timeSplits = autoTimeSplits(left, keys, targetRows))

  /** Interval containment join: every (point, interval) pair with
    * `startCol <= pointTime <= endCol` and equal join keys — WITHOUT a
    * cross product or a broadcast-nested-loop plan.
    *
    * Each interval is exploded to the fixed-width time buckets it
    * covers; points carry their single bucket; an equi-join on
    * (keys, bucket) + the exact containment filter gives the result.
    * Every containing interval covers the point's bucket exactly once,
    * so pairs are already unique — no distinct needed.
    *
    * Shuffle volume: |points| + sum(interval_length / bucketMs) rows.
    * Pick `bucketMs` near the median interval length: much smaller
    * multiplies the interval side, much larger packs unrelated rows
    * into the same bucket and taxes the post-join filter. Degenerate
    * long intervals fan out linearly — cap them upstream if the
    * interval table is untrusted.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                keys: Seq[String], pointTime: String,
                startCol: String, endCol: String, bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointTime).cast("long") / bucketMs))
    // interval-side join keys are renamed so the joined frame has one
    // unambiguous copy of each key column (the point side's)
    val renamedKeys = keys.map(k => k -> s"__i_$k")
    val i0 = intervals.withColumn("__ibucket",
      explode(sequence(floor(col(startCol).cast("long") / bucketMs),
        floor(col(endCol).cast("long") / bucketMs))))
    val i = renamedKeys.foldLeft(i0) { case (df, (k, rk)) =>
      df.withColumnRenamed(k, rk) }
    val cond = (renamedKeys.map { case (k, rk) => col(k) === col(rk) } :+
      (col("__bucket") === col("__ibucket"))).reduce(_ && _)
    p.join(i, cond)
      .filter(col(startCol) <= col(pointTime) && col(pointTime) <= col(endCol))
      .drop("__bucket" +: "__ibucket" +: renamedKeys.map(_._2): _*)
  }
}
