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
    * At 100 TB: partitioning is by key only, so a pathologically hot
    * key serializes into one task — for such corpora pre-split the key
    * by coarse time range and as-of join per range with a boundary
    * carry-forward pass (two jobs, still no explosion).
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
                       leftTime: String, rightTime: String): DataFrame = {
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
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(col("__l.*") +:
      (matchedTime +: payloadCols).map(c => col(s"__m.$c").as(c)): _*)
  }

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
