package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staging writes — the reference's bulk `COPY` into
  * `tmp_gh_repositories` (ght2dm.go:494-548, pq.CopyIn) re-expressed as
  * a partitioned parquet staging area that the dedup+insert stage then
  * reads set-based.
  *
  * Scale notes: `partitionByCol` should be a low-cardinality natural
  * partition (ingest date, entity kind) so downstream jobs prune whole
  * directories; `bucketBy` on the dedup key would additionally
  * co-locate the latest-wins shuffle, but bucketing requires a table
  * catalog — the plain-directory variant keeps the staging area
  * catalog-free like the reference's tmp table.
  */
object Staging {

  /** Write `df` to the staging area, optionally hive-partitioned. */
  def writeStaged(df: DataFrame, path: String,
                  partitionByCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    partitionByCol.fold(w)(c => w.partitionBy(c)).parquet(path)
  }

  /** Read the staging area back (partition pruning applies to any
    * filter on the partition column). */
  def readStaged(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed staging: persist hash-bucketed (and bucket-sorted) on the
    * join/dedup key via the session catalog. Every downstream
    * join/groupBy on that key between same-bucketed tables is then
    * EXCHANGE-FREE — at 100 TB this converts the nightly fact-fact
    * joins from a full shuffle each run into a one-time layout cost at
    * write. (Directory staging above stays catalog-free like the
    * reference's tmp table; bucketing is the opt-in for hot keys.) */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}

/** Skew handling for hot keys: pre-aggregate under a salt, then merge.
  * The classic two-phase aggregation — at 100 TB a single pathological
  * key (one repo spammed across every dump, one boilerplate document)
  * otherwise pins a single reducer.
  */
object Skew {

  /** groupBy(keys).agg(count) with `salts`-way salting: phase 1
    * aggregates (keys, salt), phase 2 merges partials per key. Both
    * phases are map-side-combinable hash aggregations. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int,
                  countName: String = "n"): DataFrame =
    saltedAgg(df, keys, salts,
      partial = Seq(count(lit(1)).as(countName)),
      merge = Seq(sum(col(countName)).as(countName)))

  /** Skew-safe shuffle JOIN: the classic hot-key salting pattern. A
    * shuffled join hash-partitions both sides on the key, so one
    * pathological key (one spammed repo, one boilerplate document, one
    * mega-domain) lands its entire row set on ONE reducer and pins the
    * stage at 100 TB. Salting spreads each hot key over `salts`
    * reducers: hot fact rows get a deterministic row-hash salt, the
    * matching dim rows are replicated once per salt value (explode of a
    * `salts`-element sequence — dim-side cost = |hot dim rows| × salts,
    * bounded because hot keys are few by construction), and the join
    * key becomes (key, salt). Cold keys flow through an untouched plain
    * join; the two branches union. Row-for-row equal to the plain join
    * by the bijection (fact row, dim row) ↔ (salted fact row, the one
    * dim replica carrying that row's salt).
    *
    * AQE's skew-split covers sort-merge joins at runtime; this explicit
    * form is the tool when the skew is KNOWN ahead of plan time — it
    * also works under shuffled-hash joins, composes with bucketed
    * layouts, and keeps the plan deterministic for replay. The salt is
    * a row hash, not `rand()`, for the [[saltedAgg]] reason: identical
    * input must salt identically regardless of partition layout.
    *
    * `joinType` may be "inner" or "left" (the enrichment shapes a fact
    * pipeline runs); null fact keys route to the cold branch, where the
    * plain join gives them standard semantics (dropped / null-extended).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 hotKeys: Seq[Any], joinType: String = "inner"): DataFrame = {
    require(salts > 1, s"salting needs >1 salts, got $salts")
    require(Seq("inner", "left").contains(joinType),
      s"saltedJoin supports inner/left, got $joinType")
    if (hotKeys.isEmpty) fact.join(dim, Seq(key), joinType)
    else {
      val isHot = coalesce(col(key).isin(hotKeys: _*), lit(false))
      val factHot = fact.filter(isHot).withColumn("__salt",
        pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(salts))
          .cast("int"))
      val dimHot = dim.filter(coalesce(col(key).isin(hotKeys: _*), lit(false)))
        .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      val hot = factHot.join(dimHot, Seq(key, "__salt"), joinType).drop("__salt")
      val cold = fact.filter(!isHot).join(
        dim.filter(!coalesce(col(key).isin(hotKeys: _*), lit(false))),
        Seq(key), joinType)
      cold.unionByName(hot)
    }
  }

  /** [[saltedJoin]] with the hot-key list measured rather than given:
    * one [[Profile.heavyHitters]] pass over the fact keys (top-`maxHot`
    * by count via TakeOrderedAndProject), keep those above `minShare`
    * of all rows, collect that ≤ maxHot-row list driver-side
    * (metadata-sized by construction), and salt exactly those. The
    * pre-flight costs one map-combined count aggregation — noise next
    * to the join it protects. */
  def saltedJoinAuto(fact: DataFrame, dim: DataFrame, key: String,
                     salts: Int, maxHot: Int = 64, minShare: Double = 0.01,
                     joinType: String = "inner"): DataFrame = {
    val hot = Profile.heavyHitters(fact.select(col(key)), Seq(key), maxHot)
      .filter(col("share") >= minShare)
      .select(col(key)).collect().map(_.get(0)).toSeq
    saltedJoin(fact, dim, key, salts, hot, joinType)
  }

  /** General two-phase salted aggregation for ALGEBRAIC aggregates
    * (anything whose merge is itself an aggregate: count→sum, sum→sum,
    * min→min, max→max, or (sum,count) pairs for averages). `partial`
    * runs per (keys, salt); `merge` combines the partials per key —
    * column names must line up between the two lists.
    *
    * WHEN THE SALT PAYS (measured, `graft.tools.SkewAggProbe` +
    * BASELINE.md round-11 adjudication): for NARROW algebraic state
    * (count/sum/min/max) it never does — Spark's map-side combine is
    * already a per-input-partition salt, collapsing a hot key to one
    * 8-byte partial per map task, so the second exchange is pure
    * premium at any skew. It pays for DISTINCT-STATE / overlap-heavy
    * merge state (exact distinct via collect_set, set unions): the
    * deterministic ROW-HASH salt sends duplicate (key, value) rows to
    * the same salt, so phase 1 dedupes `salts` disjoint slices in
    * parallel instead of one reducer re-deduping every map task's
    * overlapping partial set, and phase 2 only concatenates (measured
    * 1.3-1.6× on a 90%-hot key, growing with hot-reducer state). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    // Layout-independent salt: hash the whole row rather than rand(),
    // whose per-partition re-seeding makes the salt distribution depend
    // on partition layout (same data, different split → different
    // salts). xxhash64 over all columns is codegen'd and deterministic;
    // fully duplicate rows share a salt, which is harmless — the
    // map-side combine has already collapsed them within a partition.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts)).cast("int"))
    salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
