package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Whole-operator packaging of the backward as-of join (custom-operator
  * preference (c): LogicalPlan + Rule, registered via
  * SparkSessionExtensions) — the operator SEMANTICS live in one logical
  * node, and an analysis rule lowers it to the composed
  * union + sort + window plan of
  * [[graft.operators.Temporal.asOfJoinBackward]], so Catalyst/AQE still
  * own everything physical. This is how Spark itself treats high-level
  * constructs (e.g. lateral joins): a logical marker, then a lowering.
  *
  * `keyPairs` carries each ON-clause key equality AS WRITTEN — the two
  * names may differ (`p.uid = s.user_id`, as DuckDB allows) and which
  * belongs to which side is only knowable once the children resolve,
  * so [[ResolveAsOfJoin]] orients the pairs against the children's
  * outputs and renames the right side to the left names before
  * lowering. Output key columns therefore carry the LEFT side's names.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        keyPairs: Seq[(String, String)],
                        leftTime: String, rightTime: String)
  extends BinaryNode {
  // unresolved marker: the analyzer keeps running rules (ours fires and
  // replaces the node) and nothing upstream binds to its output early
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Analysis rule: orient the key pairs, rename differing right-side
  * key names to their left partners, and lower [[AsOfJoinPlan]] to the
  * composed plan. */
case class ResolveAsOfJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case AsOfJoinPlan(l, r, keyPairs, lt, rt) if l.resolved && r.resolved =>
      val lCols = l.output.map(_.name).toSet
      val rCols = r.output.map(_.name).toSet
      val oriented = keyPairs.map {
        case (a, b) if a == b => (a, b)
        case (a, b) if lCols.contains(a) && rCols.contains(b) => (a, b)
        case (a, b) if lCols.contains(b) && rCols.contains(a) => (b, a)
        case (a, b) => throw new IllegalArgumentException(
          s"ASOF JOIN key $a = $b: neither orientation matches the join " +
            s"sides (left has ${lCols.mkString(",")}; right has ${rCols.mkString(",")})")
      }
      val rightDf = oriented.foldLeft(GraftSqlShim.ofRows(spark, r)) {
        case (df, (ln, rn)) =>
          if (ln == rn) df else df.withColumnRenamed(rn, ln)
      }
      GraftSqlShim.analyzed(graft.operators.Temporal.asOfJoinBackward(
        GraftSqlShim.ofRows(spark, l), rightDf,
        oriented.map(_._1), lt, rt))
  }
}

object AsOfJoinPlan {
  /** Build a DataFrame over the logical node; requires
    * [[GraftExtensions]] (or `register`) so the lowering rule is
    * installed in the session. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String): DataFrame = {
    val spark = SparkSession.active
    GraftSqlShim.ofRows(spark, AsOfJoinPlan(
      GraftSqlShim.logicalPlan(left), GraftSqlShim.logicalPlan(right),
      keys.map(k => (k, k)), leftTime, rightTime))
  }
}
