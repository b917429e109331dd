package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment, replacing the reference's
  * `INSERT ... RETURNING id` sequence (db/insert_from_tmp_tables.sql:59-61).
  */
object Surrogate {

  /** Deterministic, oracle-comparable ids: dense_rank over a total order
    * of the natural key. NOTE: a global window means a single-partition
    * sort — fine for dimension-sized outputs (the reference assigns these
    * ids to deduped repos, i.e. post-dedup cardinality), wrong for fact
    * tables; use [[scaleSafeIds]] there. */
  def denseIds(df: DataFrame, orderBy: Seq[Column], idName: String): DataFrame =
    df.withColumn(idName, dense_rank().over(Window.orderBy(orderBy: _*)))

  /** Scale path: unique (not contiguous) 64-bit ids with no shuffle and
    * no global sort — partition id in the high bits, per-partition
    * counter in the low bits. Use when ids only need uniqueness +
    * stability within a run, which is all `RETURNING id` guarantees. */
  def scaleSafeIds(df: DataFrame, idName: String): DataFrame =
    df.withColumn(idName, monotonically_increasing_id())
}
