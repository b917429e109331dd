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
  * `keyPairs` carries each ON-clause key equality AS WRITTEN —
  * immediate qualifier included (`p.uid = s.user_id`: DuckDB allows
  * differing names, and which belongs to which side is only knowable
  * once the children resolve) — so [[ResolveAsOfJoin]] orients the
  * pairs against the children's outputs (names AND qualifiers matched
  * through the session resolver, so case sensitivity follows
  * `spark.sql.caseSensitive`), and renames the right side to the left
  * names before lowering. Output key columns therefore carry the LEFT
  * side's names. A pair both of whose orientations resolve and whose
  * qualifiers don't pin a side is rejected as ambiguous rather than
  * silently bound in as-written order.
  */
case class AsOfKey(qualifier: Option[String], name: String) {
  def show: String = qualifier.map(q => s"$q.").getOrElse("") + name
}

object AsOfKey {
  def bare(name: String): AsOfKey = AsOfKey(None, name)
}

case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        keyPairs: Seq[(AsOfKey, AsOfKey)],
                        leftTime: AsOfKey, rightTime: AsOfKey)
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
  * composed plan. Matching uses the session resolver (case-insensitive
  * unless `spark.sql.caseSensitive`); written qualifiers are validated
  * against the resolved sides' attribute qualifiers, and an
  * unqualified pair both of whose orientations resolve is an error. */
case class ResolveAsOfJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case AsOfJoinPlan(l, r, keyPairs, lt, rt) if l.resolved && r.resolved =>
      val resolver = spark.sessionState.conf.resolver
      def findIn(out: Seq[Attribute], k: AsOfKey): Option[Attribute] =
        out.find(a => resolver(a.name, k.name) &&
          k.qualifier.forall(q => a.qualifier.exists(resolver(_, q))))
      def describe(out: Seq[Attribute]): String = out.map(_.name).mkString(",")
      val oriented: Seq[(Attribute, Attribute)] = keyPairs.map { case (k1, k2) =>
        val asWritten = (findIn(l.output, k1), findIn(r.output, k2))
        val flipped = (findIn(l.output, k2), findIn(r.output, k1))
        (asWritten, flipped) match {
          // same column name: the orientations are the same binding
          case ((Some(la), Some(ra)), _) if resolver(k1.name, k2.name) =>
            (la, ra)
          case ((Some(_), Some(_)), (Some(_), Some(_))) =>
            throw new IllegalArgumentException(
              s"ASOF JOIN key ${k1.show} = ${k2.show} is ambiguous: both " +
                "orientations resolve (each side exposes both names) — " +
                "qualify the keys with the side aliases")
          case ((Some(la), Some(ra)), _) => (la, ra)
          case (_, (Some(la), Some(ra))) => (la, ra)
          case _ => throw new IllegalArgumentException(
            s"ASOF JOIN key ${k1.show} = ${k2.show}: neither orientation " +
              s"matches the join sides (left has ${describe(l.output)}; " +
              s"right has ${describe(r.output)})")
        }
      }
      // times validate qualifiers too: `ON s.snap_ms >= p.ts_ms` puts
      // the right side's time on the probe (greater) side — an
      // orientation THIS operator cannot honor — and must error, not
      // silently bind whichever column shares the name
      val ltAttr = findIn(l.output, lt).getOrElse(
        throw new IllegalArgumentException(
          s"ASOF JOIN probe time ${lt.show} not found on the left side " +
            s"(${describe(l.output)}); the GREATER side of the time " +
            "inequality is the left/probe time, so its qualifier must " +
            "name the left side"))
      val rtAttr = findIn(r.output, rt).getOrElse(
        throw new IllegalArgumentException(
          s"ASOF JOIN snapshot time ${rt.show} not found on the right " +
            s"side (${describe(r.output)})"))
      val rightDf = oriented.foldLeft(GraftSqlShim.ofRows(spark, r)) {
        case (df, (la, ra)) =>
          if (la.name == ra.name) df
          else {
            // a column already under the left key's name would collide
            // with the rename and bind ambiguously below. Checked
            // against the PROGRESSIVELY-RENAMED frame, not r.output:
            // an earlier pair may have renamed that very name away
            // (p.uid = s.user_id AND p.user_id = s.parent_uid is fine)
            if (df.columns.exists(c => resolver(c, la.name)))
              throw new IllegalArgumentException(
                s"ASOF JOIN: right side already exposes a column named " +
                  s"${la.name}; cannot rename key ${ra.name} onto it")
            df.withColumnRenamed(ra.name, la.name)
          }
      }
      GraftSqlShim.analyzed(graft.operators.Temporal.asOfJoinBackward(
        GraftSqlShim.ofRows(spark, l), rightDf,
        oriented.map(_._1.name), ltAttr.name, rtAttr.name))
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
      keys.map(k => (AsOfKey.bare(k), AsOfKey.bare(k))),
      AsOfKey.bare(leftTime), AsOfKey.bare(rightTime)))
  }
}
