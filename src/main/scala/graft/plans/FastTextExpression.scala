package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Subword-fastText argmax ([[graft.functions.FastText.argmax]]) as a
  * codegen expression: the whole bilinear inference — tokenize,
  * char-n-gram bucket ids via fastText's own hash, hidden-vector
  * accumulation, L output dot products, argmax — in ONE kernel call
  * per row inside the scan projection. The model rides as a
  * referenced object (broadcast once per executor with the task
  * binary — the HashGramLogit / HyperplaneSig pattern), so even a
  * lid.176-sized input matrix costs its serialized size once, never
  * per row. Returns struct(idx INT, logit DOUBLE); null when the text
  * has no feature ids. */
case class FastTextArgmax(child: Expression,
                          model: graft.functions.FastText.FastTextModel)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("logit", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fasttext_argmax requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    graft.functions.FastText.argmax(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("model", model,
      classOf[graft.functions.FastText.FastTextModel].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |InternalRow ${ev.value}Tmp = graft.functions.FastText.argmax($c, $ref);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): FastTextArgmax =
    copy(child = newChild)
  override def prettyName: String = "fasttext_argmax"
}

object FastTextExpressions {
  /** Subword-fastText argmax over a string column. */
  def fastTextArgmax(c: Column,
                     model: graft.functions.FastText.FastTextModel): Column =
    GraftSqlShim.column(FastTextArgmax(GraftSqlShim.expression(c), model))
}
