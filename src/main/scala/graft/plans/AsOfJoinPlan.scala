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
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        keys: Seq[String], leftTime: String, rightTime: String)
  extends BinaryNode {
  // unresolved marker: the analyzer keeps running rules (ours fires and
  // replaces the node) and nothing upstream binds to its output early
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Analysis rule: lower [[AsOfJoinPlan]] to the composed plan. */
case class ResolveAsOfJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case AsOfJoinPlan(l, r, keys, lt, rt) if l.resolved && r.resolved =>
      GraftSqlShim.analyzed(graft.operators.Temporal.asOfJoinBackward(
        GraftSqlShim.ofRows(spark, l), GraftSqlShim.ofRows(spark, r),
        keys, lt, rt))
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
      keys, leftTime, rightTime))
  }
}
