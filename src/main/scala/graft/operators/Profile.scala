package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling for pipeline validation: row count,
  * per-column non-null counts, and exact distinct counts, all in a
  * single aggregation job (one scan; the distinct counts expand to
  * Spark's standard partial-distinct aggregation). For 100 TB-scale
  * profiling swap `countDistinct` for `approx_count_distinct` — the
  * HLL sketch turns the expand-shuffle into a constant-size merge; the
  * exact variant is kept here because it is oracle-comparable. */
object Profile {

  /** Wide profile frame: (n_rows, nn_<col>..., nd_<col>...). */
  def profile(df: DataFrame, cols: Seq[String],
              distinctCols: Seq[String]): DataFrame = {
    val aggs =
      cols.map(c => count(col(c)).as(s"nn_$c")) ++
      distinctCols.map(c => countDistinct(col(c)).as(s"nd_$c"))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
