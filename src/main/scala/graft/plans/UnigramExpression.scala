package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{UnigramOps, UnigramVocab}

/** Unigram-LM Viterbi segmentation of a word column
  * (`unigram_encode`): the whole DP runs in ONE codegen kernel call
  * per row, with the vocabulary traveling via [[ModelRef]] —
  * sample-sized vocabularies ride the task binary; a realistic
  * multi-million-piece SentencePiece vocab is broadcast and
  * materialized once per executor JVM instead of once per task.
  * Applied to the DISTINCT-WORD cache, not the corpus, by
  * [[graft.operators.Unigram.encodeDocs]]. */
case class UnigramEncode(child: Expression,
                         vocab: Either[UnigramVocab, Broadcast[UnigramVocab]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_encode requires string input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    UnigramOps.viterbi(v.asInstanceOf[UTF8String], ModelRef.get(vocab))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabCls = classOf[UnigramVocab].getName
    val vocabVar = vocab match {
      case Left(v) => ctx.addReferenceObj("uvocab", v, vocabCls)
      case Right(bc) =>
        val ref = ctx.addReferenceObj("uvocabBc", bc,
          classOf[Broadcast[_]].getName)
        ctx.addMutableState(vocabCls, "uvocab",
          v => s"$v = ($vocabCls) $ref.value();")
    }
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramOps.viterbi($c, $vocabVar)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)

  override def prettyName: String = "unigram_encode"
}

object UnigramExpression {
  def unigramEncode(word: Column, vocab: UnigramVocab): Column = {
    // pieces (2 bytes a char in the serialized String) + micro scores
    val est = vocab.pieces.iterator.map(_.length.toLong * 2 + 40).sum +
      vocab.lpMicro.length.toLong * 8
    GraftSqlShim.column(UnigramEncode(GraftSqlShim.expression(word),
      ModelRef.of(vocab, est)))
  }
}
