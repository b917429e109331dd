package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThanOrEqual, IsNotNull, LessThanOrEqual}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.types.{DataType, StructType}

/** `ASOF JOIN` SQL surface (DuckDB-style syntax), completing the
  * [[AsOfJoinPlan]] operator's API: the DataFrame builder, the logical
  * node, and now
  *
  * {{{
  *   SELECT ... FROM pts ASOF [LEFT] JOIN snaps
  *   ON pts.user_id = snaps.user_id AND pts.ts_ms >= snaps.snap_ms
  * }}}
  *
  * Implementation: Spark's ANTLR grammar isn't extensible in place, so
  * the injected parser (the standard `injectParser` delegate-wrapper
  * pattern) rewrites the `ASOF [LEFT] JOIN` phrase to the plain join
  * the delegate can parse, then converts the resulting `Join` node
  * whose ON clause has the as-of shape — key equalities plus exactly
  * one `>=`/`<=` time inequality — into [[AsOfJoinPlan]], which the
  * [[ResolveAsOfJoin]] analysis rule lowers to the single-shuffle
  * union+sort composition. Queries without the phrase pass through
  * untouched.
  *
  * Semantics and surface contract (all checked, clear errors):
  *  - the GREATER side of the inequality is the probe (left) time:
  *    backward as-of, matching DuckDB's `l.t >= r.t`;
  *  - key equalities must join same-named columns (the lowered
  *    operator keys on shared names);
  *  - the matched snapshot time surfaces as `matched_<rightTime>`, and
  *    result columns are referenced UNQUALIFIED (the as-of output is a
  *    flat relation, as in DuckDB);
  *  - `ASOF JOIN` (inner, unmatched rows drop — filtered on
  *    `matched_<rightTime> IS NOT NULL`) vs `ASOF LEFT JOIN`
  *    (unmatched left rows keep NULL payloads).
  */
class AsOfSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val asofLeft = "(?i)\\bASOF\\s+LEFT\\s+(?:OUTER\\s+)?JOIN\\b".r
  private val asofInner = "(?i)\\bASOF\\s+(?:INNER\\s+)?JOIN\\b".r

  private def hasAsOf(sql: String): Boolean =
    asofLeft.findFirstIn(sql).isDefined || asofInner.findFirstIn(sql).isDefined

  private def rewrite(sql: String): String =
    asofInner.replaceAllIn(asofLeft.replaceAllIn(sql, "LEFT JOIN"), "JOIN")

  override def parsePlan(sqlText: String): LogicalPlan =
    if (!hasAsOf(sqlText)) delegate.parsePlan(sqlText)
    else convertAsOfJoins(delegate.parsePlan(rewrite(sqlText)))

  override def parseQuery(sqlText: String): LogicalPlan =
    if (!hasAsOf(sqlText)) delegate.parseQuery(sqlText)
    else convertAsOfJoins(delegate.parseQuery(rewrite(sqlText)))

  /** Flatten an AND-conjunction. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def lastName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case _ => None
  }

  /** ON-clause shape test: all-equalities-plus-one-time-inequality →
    * (keys, leftTime, rightTime). */
  private def asOfShape(cond: Expression): Option[(Seq[String], String, String)] = {
    val cs = conjuncts(cond)
    val keys = cs.collect { case EqualTo(l, r)
        if lastName(l).isDefined && lastName(l) == lastName(r) =>
      lastName(l).get
    }
    val ineqs = cs.collect {
      // the GREATER side is the probe time (backward as-of)
      case GreaterThanOrEqual(l, r) if lastName(l).isDefined && lastName(r).isDefined =>
        (lastName(l).get, lastName(r).get)
      case LessThanOrEqual(l, r) if lastName(l).isDefined && lastName(r).isDefined =>
        (lastName(r).get, lastName(l).get)
    }
    if (ineqs.size == 1 && keys.size + 1 == cs.size) {
      val (lt, rt) = ineqs.head
      Some((keys, lt, rt))
    } else None
  }

  /** Convert every join the rewrite produced (this only runs on
    * statements that contained the ASOF phrase). A same-statement
    * plain join keeps its node: it won't carry the single-inequality
    * as-of shape. */
  private def convertAsOfJoins(plan: LogicalPlan): LogicalPlan = {
    var converted = 0
    val out = plan transformUp {
      case j @ Join(l, r, jt, Some(cond), _) if jt == Inner || jt == LeftOuter =>
        asOfShape(cond) match {
          case Some((keys, lt, rt)) =>
            converted += 1
            val asof = AsOfJoinPlan(l, r, keys, lt, rt)
            if (jt == Inner)
              Filter(IsNotNull(UnresolvedAttribute(s"matched_$rt")), asof)
            else asof
          case None => j
        }
    }
    if (converted == 0)
      throw new IllegalArgumentException(
        "ASOF JOIN requires an ON clause of same-named key equalities " +
          "plus exactly one time inequality (l.t >= r.t or r.t <= l.t)")
    out
  }

  // ---- pure delegation ---------------------------------------------------
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
