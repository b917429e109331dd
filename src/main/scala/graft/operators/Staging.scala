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

  /** General two-phase salted aggregation for ALGEBRAIC aggregates
    * (anything whose merge is itself an aggregate: count→sum, sum→sum,
    * min→min, max→max, or (sum,count) pairs for averages). `partial`
    * runs per (keys, salt); `merge` combines the partials per key —
    * column names must line up between the two lists. */
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
