package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.HashExpressions

/** Deterministic stratified sampling — reproducible corpus
  * downsampling by stratum (language, source, quality band): a row
  * survives iff `fnv64(key) mod 10000 < rate(stratum) * 10000`.
  *
  * Content-hash gating (the `q_split_assign` idea applied to
  * sampling) makes the sample a pure FUNCTION of the data: stable
  * under re-sharding, re-partitioning, replay, and incremental
  * append — the properties `df.sample()` (seeded per-partition RNG)
  * loses the moment partitioning changes, which at 100 TB it always
  * does. Plan shape: broadcast the tiny (stratum → rate) table, one
  * codegen'd hash-filter on the scan — no shuffle, filters push past
  * it, and the survivor fraction per stratum is exact-in-expectation
  * with zero coordination.
  */
object Sampling {

  /** Keep each row of `df` with probability `rates(stratum)` (basis
    * points of 10000; strata absent from `rates` fall back to
    * `defaultRate`), deterministically by `fnv64(keyCol)`. Rates are
    * quantized to 1/10000 — floor(rate * 10000) basis points. */
  def stratifiedSampleByHash(df: DataFrame, stratumCol: Column,
                             keyCol: Column, rates: Map[String, Double],
                             defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be fractions in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val bp = rates.toSeq.map { case (s, r) =>
      (s, math.floor(r * 10000).toLong) }
      .toDF("__stratum", "__rate_bp")
    val defaultBp = math.floor(defaultRate * 10000).toLong
    val h = pmod(HashExpressions.fnv64(keyCol), lit(10000L))
    df.join(broadcast(bp), stratumCol === col("__stratum"), "left")
      .filter(h < coalesce(col("__rate_bp"), lit(defaultBp)))
      .drop("__stratum", "__rate_bp")
  }
}
