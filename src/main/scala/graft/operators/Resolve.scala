package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ID-resolution joins. The reference resolves relation rows one at a
  * time with lookup SELECTs (login -> gh_user_id, org login ->
  * gh_organization_id: ght2dm.go:657-772; login + "owner/repo" full_name
  * -> repository_id: ght2dm.go:814-959). Set-based, these are equi-joins
  * of a large fact against small dimension tables — the canonical
  * broadcast-hash-join shape. `broadcast()` is hinted explicitly so the
  * plan survives stats misestimates on a 1000-executor cluster; the fact
  * side is never shuffled.
  */
object Resolve {

  /** Join `fact` to a broadcast `dim` on factKey == dimKey pairs.
    * Inner join drops unresolved rows, mirroring the reference's
    * "failed to retrieve the id" skip path (ght2dm.go:757-765). */
  def joinDim(fact: DataFrame, dim: DataFrame,
              on: Seq[(String, String)], how: String = "inner"): DataFrame = {
    val cond = on.map { case (f, d) => fact(f) === dim(d) }.reduce(_ && _)
    fact.join(broadcast(dim), cond, how)
  }
}
