package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Psl

/** Public-suffix label count of a host column under a [[Psl]] rule
  * set: the kernel half of the PSL-backed
  * [[graft.operators.WebClean.parseUrlsPsl]]. Returns an INT (never
  * null for non-null input — the default rule), so the registrable
  * site / public suffix strings derive from it with BUILT-IN slice /
  * array_join expressions and the null case ("host IS the public
  * suffix") is an ordinary `when` — no nullable custom codegen.
  *
  * The rule set rides as an expression reference object (the
  * [[HashGramLogit]] weights pattern): serialized once per executor
  * with the task binary, ≤ label-count hash probes per row, fully
  * inside whole-stage codegen. */
case class PslSuffixLabels(child: Expression, psl: Psl)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"psl_suffix_labels requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    psl.suffixLabels(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("psl", psl, "graft.functions.Psl")
    defineCodeGen(ctx, ev, c => s"$ref.suffixLabels($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): PslSuffixLabels =
    copy(child = newChild)
  override def prettyName: String = "psl_suffix_labels"
}

object PslExpressions {
  /** Label count of `host`'s public suffix under `psl`. */
  def pslSuffixLabels(host: Column, psl: Psl): Column =
    GraftSqlShim.column(PslSuffixLabels(GraftSqlShim.expression(host), psl))
}
