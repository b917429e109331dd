package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{UnigramOps, UnigramVocab}

/** Unigram-LM Viterbi segmentation of a word column
  * (`unigram_encode`): the whole DP runs in ONE codegen kernel call
  * per row, with the vocabulary riding as an expression reference
  * object — per-executor cost is the serialized vocab once, like the
  * classifier weight vectors. Applied to the DISTINCT-WORD cache, not
  * the corpus, by [[graft.operators.Unigram.encodeDocs]]. */
case class UnigramEncode(child: Expression, vocab: UnigramVocab)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_encode requires string input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    UnigramOps.viterbi(v.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uvocab", vocab,
      "graft.functions.UnigramVocab")
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramOps.viterbi($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)

  override def prettyName: String = "unigram_encode"
}

object UnigramExpression {
  def unigramEncode(word: Column, vocab: UnigramVocab): Column =
    GraftSqlShim.column(UnigramEncode(GraftSqlShim.expression(word), vocab))
}
