package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation statistics for curation pipelines: a quality
  * model's scores are only as useful as their ranking power, and the
  * pipeline needs to MEASURE that (on held-out labels) before gating
  * billions of documents on the score. Part of the LLM-pipeline
  * extension (SURVEY §2b); the reference engine has no eval surface.
  */
object Eval {

  /** Exact ROC AUC via the Mann-Whitney U statistic, tie-aware
    * (average ranks) — the textbook estimator, NOT a sampled or
    * binned approximation.
    *
    * Scale shape: the input is first collapsed to a per-distinct-score
    * histogram (`groupBy(score)` — map-side combinable, one shuffle on
    * score), and only the HISTOGRAM goes through the global-order
    * cumulative window. The single-partition sort is over distinct
    * score values, not rows — the O(distinct-scores) bound is
    * ENFORCED here, not assumed of the caller: the score is rounded
    * to `roundScoreTo` decimals (default 6) before the histogram, so
    * a probability-like score in [0,1] yields ≤ 1e6+1 groups whatever
    * the corpus size and the window stage is safe at 100 TB. Rounding
    * an integral score is the identity (Spark keeps the type), so
    * integer-scored callers are bit-unchanged. Pass
    * `roundScoreTo = None` only when the score is KNOWN
    * bounded-cardinality (integers, pre-bucketed) and the raw values
    * must flow through untouched — with an unbounded-precision double
    * that makes the histogram row-sized and funnels the input through
    * one WindowExec partition.
    *
    * Exactness: with `r` the minimum rank of a tie group, `cnt` its
    * size, and `cumBefore` the rows strictly below it, each member's
    * DOUBLED average rank is the integer `2·cumBefore + cnt + 1`.
    * Summing those over positives gives `SR2 = 2·Σ avgrank(pos)`,
    * all in Long arithmetic, and
    *
    *   AUC = (SR2 − 2·npos·(npos+1)/2) / (2·npos·nneg)
    *       = (SR2 − npos·(npos+1)) / (2·npos·nneg)
    *
    * — one float division at the very end, so Spark and any replaying
    * engine agree bitwise. Long headroom: SR2 ≤ 2n·(n+1) overflows
    * only past n ≈ 2·10^9 rows per evaluation slice.
    *
    * Returns one row: (`npos`, `nneg`, `auc`). AUC is null when
    * either class is empty.
    */
  def aucExact(df: DataFrame, score: Column, label: Column,
               roundScoreTo: Option[Int] = Some(6)): DataFrame = {
    val s = roundScoreTo.fold(score)(d => round(score, d))
    val hist = df.select(s.as("s"), label.cast("boolean").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("y").cast("long")).as("pos"))
    // pmod(hash(s), 1) is constantly 0 — semantically the
    // no-partition window the histogram needs — but NON-FOLDABLE, so
    // EliminateWindowPartitions can't strip it and WindowExec's
    // all-data-to-one-partition warning (expected here: the window IS
    // over the bounded histogram) stays out of the logs
    val w = Window.partitionBy(pmod(hash(col("s")), lit(1)))
      .orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum_before",
      sum(col("cnt")).over(w) - col("cnt"))
    cum.agg(
        sum(col("pos")).as("npos"),
        (sum(col("cnt")) - sum(col("pos"))).as("nneg"),
        sum(col("pos") * (lit(2L) * col("cum_before") + col("cnt") + lit(1L)))
          .as("sr2"))
      .select(col("npos"), col("nneg"),
        when(col("npos") > 0 && col("nneg") > 0,
          (col("sr2") - col("npos") * (col("npos") + lit(1L)))
            .cast("double") /
          (lit(2.0) * col("npos").cast("double") * col("nneg").cast("double")))
          .as("auc"))
  }
}
