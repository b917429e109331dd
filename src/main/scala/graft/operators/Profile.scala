package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling for pipeline validation: row count,
  * per-column non-null counts, and distinct counts, all in a single
  * aggregation job (one scan).
  *
  * `approxDistinct = false` (default) uses exact `countDistinct`,
  * which expands to Spark's partial-distinct aggregation — an
  * expand-shuffle proportional to the distinct value volume, and the
  * oracle-comparable variant. At 100 TB pass `approxDistinct = true`:
  * `approx_count_distinct` (HLL++) turns that into a constant-size
  * sketch merge per column — the shuffle carries one sketch per
  * partition instead of every distinct value. `rsd` is the sketch's
  * maximum relative standard deviation (Spark's default 0.05).
  */
object Profile {

  /** Wide profile frame: (n_rows, nn_<col>..., nd_<col>...). */
  def profile(df: DataFrame, cols: Seq[String],
              distinctCols: Seq[String],
              approxDistinct: Boolean = false,
              rsd: Double = 0.05): DataFrame = {
    val aggs =
      cols.map(c => count(col(c)).as(s"nn_$c")) ++
      distinctCols.map(c =>
        (if (approxDistinct) approx_count_distinct(col(c), rsd)
         else countDistinct(col(c))).as(s"nd_$c"))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
