package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThanOrEqual, IsNotNull, LessThanOrEqual, SubqueryExpression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.types.{DataType, StructType}

/** `ASOF JOIN` SQL surface (DuckDB-style syntax), completing the
  * [[AsOfJoinPlan]] operator's API: the DataFrame builder, the logical
  * node, and
  *
  * {{{
  *   SELECT ... FROM pts ASOF [LEFT] JOIN snaps
  *   ON pts.user_id = snaps.user_id AND pts.ts_ms >= snaps.snap_ms
  * }}}
  *
  * Implementation: Spark's ANTLR grammar isn't extensible in place, so
  * the injected parser (the standard `injectParser` delegate-wrapper
  * pattern) rewrites each `ASOF [LEFT] JOIN` phrase to the plain join
  * the delegate can parse, then converts exactly the `Join` nodes the
  * rewrite produced into [[AsOfJoinPlan]], which the
  * [[ResolveAsOfJoin]] analysis rule lowers to the single-shuffle
  * union+sort composition. Queries without the phrase pass through
  * untouched.
  *
  * The phrase scan is quote- and comment-aware (single/double-quoted
  * strings with backslash or doubled-quote escapes, backquoted
  * identifiers, `--` line comments, nested bracketed comments), so an
  * `ASOF JOIN` inside a string literal or comment is never rewritten.
  * Each real replacement records its absolute character offset in the
  * rewritten text; the delegate's AST builder stamps every `Join` node
  * with the `Origin.startIndex` of its join-type token, so only joins
  * AT a recorded offset convert — a plain join elsewhere in the same
  * statement keeps inner/left semantics even if its ON clause happens
  * to look as-of-shaped.
  *
  * Semantics and surface contract (all checked, clear errors):
  *  - the GREATER side of the inequality is the probe (left) time:
  *    backward as-of, matching DuckDB's `l.t >= r.t`;
  *  - key equalities may join same- or different-named columns
  *    (`p.uid = s.user_id`); differing right names are renamed to
  *    their left partner during lowering, so output keys carry the
  *    LEFT side's names;
  *  - the matched snapshot time surfaces as `matched_<rightTime>`;
  *    result columns may be referenced unqualified (the as-of output
  *    is a flat relation) OR through the original side aliases —
  *    `s.snap_ms` resolves to `matched_snap_ms`, `p.event_id` to
  *    `event_id` — so DuckDB ASOF queries port verbatim;
  *  - `ASOF JOIN` (inner, unmatched rows drop — filtered on
  *    `matched_<rightTime> IS NOT NULL`) vs `ASOF LEFT JOIN`
  *    (unmatched left rows keep NULL payloads).
  */
class AsOfSqlParser(delegate: ParserInterface) extends ParserInterface {

  import AsOfSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(sqlText) match {
      case None => delegate.parsePlan(sqlText)
      case Some((rewritten, offs)) =>
        convertAsOfJoins(delegate.parsePlan(rewritten), offs)
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(sqlText) match {
      case None => delegate.parseQuery(sqlText)
      case Some((rewritten, offs)) =>
        convertAsOfJoins(delegate.parseQuery(rewritten), offs)
    }

  /** Flatten an AND-conjunction. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def lastName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case _ => None
  }

  /** Column reference with its immediate qualifier kept (`p.uid` →
    * qualifier p; `db.t.uid` → qualifier t), for orientation
    * validation against the side aliases in [[ResolveAsOfJoin]]. */
  private def keyOf(e: Expression): Option[AsOfKey] = e match {
    case a: UnresolvedAttribute =>
      Some(AsOfKey(a.nameParts.dropRight(1).lastOption, a.nameParts.last))
    case _ => None
  }

  /** ON-clause shape test: all-equalities-plus-one-time-inequality →
    * (key pairs as written, leftTime, rightTime). Key equalities may
    * join DIFFERENT column names (`p.uid = s.user_id`, as DuckDB
    * allows); which name belongs to which side is not knowable at
    * parse time, so the pairs are carried as written — qualifiers
    * included — and oriented against the resolved children in
    * [[ResolveAsOfJoin]]. */
  private def asOfShape(cond: Expression): Option[(Seq[(AsOfKey, AsOfKey)], AsOfKey, AsOfKey)] = {
    val cs = conjuncts(cond)
    val keyPairs = cs.collect { case EqualTo(l, r)
        if keyOf(l).isDefined && keyOf(r).isDefined =>
      (keyOf(l).get, keyOf(r).get)
    }
    val ineqs = cs.collect {
      // the GREATER side is the probe time (backward as-of); its
      // written qualifier rides along so resolution can reject an
      // inequality whose probe side names the RIGHT alias
      case GreaterThanOrEqual(l, r) if keyOf(l).isDefined && keyOf(r).isDefined =>
        (keyOf(l).get, keyOf(r).get)
      case LessThanOrEqual(l, r) if keyOf(l).isDefined && keyOf(r).isDefined =>
        (keyOf(r).get, keyOf(l).get)
    }
    if (ineqs.size == 1 && keyPairs.size + 1 == cs.size) {
      val (lt, rt) = ineqs.head
      Some((keyPairs, lt, rt))
    } else None
  }

  /** The visible alias of a join input: an explicit `... AS a` /
    * `rel a` alias, or the relation's last name part (`FROM db.snaps`
    * → `snaps`), matching how the delegate would have qualified the
    * side's output. */
  private def sideAlias(p: LogicalPlan): Option[String] = p match {
    case a: SubqueryAlias => Some(a.alias)
    case u: UnresolvedRelation => Some(u.multipartIdentifier.last)
    case _ => None
  }

  /** Convert exactly the joins whose join-type token sits at a
    * recorded rewrite offset (subqueries included). Anything else —
    * including a same-statement plain join whose ON clause happens to
    * carry the as-of shape — is left alone.
    *
    * The as-of output is a FLAT relation (left columns + the matched
    * right time as `matched_<rightTime>` + right payload), so the
    * original side qualifiers no longer exist after conversion. For
    * DuckDB-porting ergonomics, qualified references THROUGH those
    * aliases (`s.snap_ms`, `p.event_id`) are rewritten against the
    * flat output — `rightAlias.rightTime` becomes
    * `matched_<rightTime>`, any other `alias.col` drops its qualifier.
    * The rewrite is scoped exactly like SQL visibility: substitutions
    * propagate up from the converted join through its enclosing
    * operators and STOP at any `SubqueryAlias` boundary (an outer
    * query can't see through a subquery's alias) — so an unrelated
    * alias of the same name in another scope is untouched. */
  private def convertAsOfJoins(plan: LogicalPlan, offsets: Seq[Int]): LogicalPlan = {
    var remaining = offsets.toSet
    // merge alias-substitution maps from several sources in one scope;
    // an alias exposed by TWO different converted joins is genuinely
    // ambiguous — poison it so a reference errors instead of silently
    // taking whichever source merged last (the same-instance check
    // lets one map flow up through several levels unharmed)
    def mergeSubs(ms: Seq[Map[String, String => String]]): Map[String, String => String] = {
      val merged = scala.collection.mutable.LinkedHashMap[String, String => String]()
      ms.foreach(_.foreach { case (a, f) =>
        if (merged.contains(a) && !(merged(a) eq f))
          merged(a) = (_: String) => throw new IllegalArgumentException(
            s"reference through alias '$a' is ambiguous: multiple " +
              "ASOF joins in the same scope expose that alias")
        else merged(a) = f
      })
      merged.toMap
    }
    // returns (converted subtree, alias→column-rename substitutions
    // still visible to the enclosing operators)
    def go(p: LogicalPlan): (LogicalPlan, Map[String, String => String]) = p match {
      case j @ Join(l, r, jt, cond, _)
          if j.origin.startIndex.exists(remaining.contains) =>
        val off = j.origin.startIndex.get
        val (nl, ml) = go(l)
        val (nr, mr) = go(r)
        if (jt != Inner && jt != LeftOuter)
          throw new IllegalArgumentException(
            s"ASOF JOIN at offset $off: only ASOF JOIN / ASOF LEFT JOIN are supported")
        cond.flatMap(asOfShape) match {
          case Some((keyPairs, lt, rt)) =>
            remaining -= off
            val asof = AsOfJoinPlan(nl, nr, keyPairs, lt, rt)
            val converted: LogicalPlan =
              if (jt == Inner)
                Filter(IsNotNull(UnresolvedAttribute(s"matched_${rt.name}")), asof)
              else asof
            // differing key names surface under the LEFT side's name
            // (the lowering renames the right key), so a right-alias
            // reference maps to the pair partner — symmetric, which
            // also covers the orientation flip resolved only later.
            // Comparisons go through the session resolver: `ON
            // p.TS_MS >= s.SNAP_MS` and `SELECT s.snap_ms` must agree
            // the same way the analyzer later will.
            val resolver = org.apache.spark.sql.GraftSqlShim.activeResolver
            val partner = keyPairs.flatMap { case (a, b) =>
              if (a.name == b.name) Nil
              else Seq(a.name -> b.name, b.name -> a.name)
            }
            // the same poisoning merge as the generic case: a chained
            // or nested ASOF join reusing a descendant's alias must
            // error as ambiguous, not silently shadow it
            val subs = mergeSubs(Seq(ml, mr,
              sideAlias(l).map(a => a -> identity[String] _).toMap,
              sideAlias(r).map(a => a -> ((c: String) =>
                if (resolver(c, rt.name)) s"matched_${rt.name}"
                else partner.collectFirst {
                  case (k, v) if resolver(c, k) => v
                }.getOrElse(c))).toMap))
            (converted, subs)
          case None =>
            throw new IllegalArgumentException(
              "ASOF JOIN requires an ON clause of key equalities " +
                "plus exactly one time inequality (l.t >= r.t or r.t <= l.t)")
        }
      case _ =>
        val results = p.children.map(go)
        val maps = mergeSubs(results.map(_._2))
        var np = if (p.children.isEmpty) p
                 else p.withNewChildren(results.map(_._1))
        np = np.transformExpressions {
          // expression subqueries may carry their own ASOF joins;
          // their substitutions are absorbed (inner scope)
          case s: SubqueryExpression => s.withNewPlan(go(s.plan)._1)
          case ua: UnresolvedAttribute
              if ua.nameParts.length == 2 && maps.contains(ua.nameParts.head) =>
            UnresolvedAttribute(Seq(maps(ua.nameParts.head)(ua.nameParts.last)))
          // `p.*` through a converted side cannot be expanded (the
          // as-of output is flat and side membership is unknown until
          // resolution) — fail with guidance instead of a bare
          // cannot-resolve. Single-part targets only: `db.s.*` names a
          // real table even when its last part matches a side alias
          case st: UnresolvedStar
              if st.target.exists(t => t.length == 1 && maps.contains(t.head)) =>
            throw new IllegalArgumentException(
              s"'${st.target.get.mkString(".")}.*' refers through an ASOF " +
                "JOIN side alias; the as-of output is a flat relation — " +
                "use '*' or list the columns explicitly")
        }
        // a subquery alias seals its scope: nothing propagates out
        (np, if (p.isInstanceOf[SubqueryAlias]) Map.empty else maps)
    }
    val out = go(plan)._1
    if (remaining.nonEmpty)
      throw new IllegalArgumentException(
        s"ASOF JOIN phrase(s) at rewritten offset(s) ${remaining.toSeq.sorted.mkString(", ")} " +
          "did not parse to a JOIN node — unsupported join position")
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

object AsOfSqlParser {

  // Matched against the raw tail of the statement at a code (non-string,
  // non-comment) position; whitespace may span lines but not comments.
  private val Phrase =
    "(?is)^ASOF\\s+(?:(LEFT)(?:\\s+OUTER)?\\s+|(?:INNER)\\s+)?JOIN(?![A-Za-z0-9_])".r

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Quote/comment-aware single pass: replace each code-position
    * `ASOF [LEFT [OUTER]|INNER] JOIN` with `[LEFT ]JOIN` and record the
    * absolute offset of the replacement in the OUTPUT text (= the
    * `Origin.startIndex` the delegate parser will stamp on that join's
    * node). Returns None when the statement contains no such phrase.
    */
  private[graft] def rewrite(sql: String): Option[(String, Seq[Int])] = {
    val out = new StringBuilder(sql.length)
    val offs = Seq.newBuilder[Int]
    var found = false
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      c match {
        // ---- strings / quoted identifiers: copy verbatim ----
        case '\'' | '"' =>
          val q = c
          out += c; i += 1
          var closed = false
          while (i < n && !closed) {
            val d = sql.charAt(i)
            out += d
            if (d == '\\' && i + 1 < n) { out += sql.charAt(i + 1); i += 2 }
            else { if (d == q) closed = true; i += 1 }
          }
        case '`' =>
          out += c; i += 1
          var closed = false
          while (i < n && !closed) {
            val d = sql.charAt(i)
            out += d
            if (d == '`') closed = true
            i += 1
          }
        // ---- comments: copy verbatim ----
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') { out += sql.charAt(i); i += 1 }
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          var depth = 0
          var done = false
          while (i < n && !done) {
            if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
              depth += 1; out += '/'; out += '*'; i += 2
            } else if (i + 1 < n && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') {
              depth -= 1; out += '*'; out += '/'; i += 2
              if (depth == 0) done = true
            } else { out += sql.charAt(i); i += 1 }
          }
        // ---- code ----
        case _ =>
          val atWordStart = (c == 'A' || c == 'a') &&
            (i == 0 || !isWordChar(sql.charAt(i - 1)))
          val m = if (atWordStart) Phrase.findPrefixMatchOf(sql.substring(i)) else None
          m match {
            case Some(mm) =>
              found = true
              offs += out.length
              out ++= (if (mm.group(1) != null) "LEFT JOIN" else "JOIN")
              i += mm.end
            case None =>
              out += c; i += 1
          }
      }
    }
    if (found) Some((out.toString, offs.result())) else None
  }
}
