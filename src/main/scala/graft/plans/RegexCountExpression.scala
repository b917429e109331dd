package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `regexp_count` without materializing the matches (optimization
  * guide §1.2, per-task work): Spark's built-in is an alias for
  * `size(regexp_extract_all(subject, regex, 0))`, allocating a
  * MatchResult + UTF8String per match and an array per row only to
  * take its length — for per-character classes that is an allocation
  * per character. This kernel runs the identical non-overlapping
  * `find()` walk and just counts. The pattern is compiled once on the
  * driver (the regex is a construction-time constant everywhere the
  * engine counts) and rides as a reference object. Result values are
  * bit-identical to the built-in: same engine, same match walk, same
  * int. Null text → null, as the built-in. */
case class RegexCount(child: Expression, regex: String)
    extends UnaryExpression {

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(regex)

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regex_count requires string input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    graft.functions.RegexOps.countMatches(v.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pattern", pattern,
      "java.util.regex.Pattern")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RegexOps.countMatches($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexCount =
    copy(child = newChild)

  override def prettyName: String = "regex_count"
}

object RegexCountExpression {
  /** Count of non-overlapping matches of the CONSTANT `regex` in
    * `text` — a drop-in for `regexp_count(text, lit(regex))`. */
  def regexCount(text: Column, regex: String): Column =
    GraftSqlShim.column(RegexCount(GraftSqlShim.expression(text), regex))
}
