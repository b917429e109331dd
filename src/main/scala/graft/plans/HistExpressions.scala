package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

import graft.functions.Hist

/** Log-bucketed histogram sketches as first-class binary columns — the
  * QUANTILE member of the sketch family ([[HllExpressions]] distinct,
  * [[CmsExpressions]] frequency). Same contract: built per corpus
  * release / group with map-side combine (one 15 KiB buffer per group
  * per task ships to the reduce, never the raw values), merged across
  * releases with `hist_union` without re-reading either corpus, and
  * every quantile replayable EXACTLY in the DuckDB oracle (integer
  * bucket map + integer rank — no doubles anywhere). SQL:
  * `hist_sketch(v)`, `hist_union(sk)`, `hist_quantile(sk, bp)`,
  * `hist_count(sk)`. */
case class HistSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hist_sketch aggregates a nonnegative BIGINT column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = Hist.emptyCounters()

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Hist.update(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    Hist.merge(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Long]): Any = Hist.toBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    Hist.toBytes(buffer)
  override def deserialize(storageFormat: Array[Byte]): Array[Long] =
    Hist.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "hist_sketch"
}

/** Union (elementwise counter sum) of already-built histogram
  * sketches; geometry rides in each header and must agree. */
case class HistUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[Array[Long]]]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hist_union expects a sketch (binary) column, got ${child.dataType}")

  override def createAggregationBuffer(): Option[Array[Long]] = None

  private def mergeInto(buf: Option[Array[Long]], counters: Array[Long])
      : Option[Array[Long]] = buf match {
    case None => Some(counters.clone())
    case Some(c0) => Hist.merge(c0, counters); buf
  }

  override def update(buffer: Option[Array[Long]],
                      input: InternalRow): Option[Array[Long]] = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, Hist.fromBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: Option[Array[Long]],
                     other: Option[Array[Long]]): Option[Array[Long]] =
    other match {
      case None => buffer
      case Some(c) => mergeInto(buffer, c)
    }

  override def eval(buffer: Option[Array[Long]]): Any =
    buffer.map(Hist.toBytes).orNull

  override def serialize(buffer: Option[Array[Long]]): Array[Byte] =
    buffer.map(Hist.toBytes).getOrElse(Array.emptyByteArray)
  override def deserialize(storageFormat: Array[Byte]): Option[Array[Long]] =
    if (storageFormat.isEmpty) None else Some(Hist.fromBytes(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): HistUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "hist_union"
}

/** Quantile at integer basis points against a sketch column (scalar,
  * codegen): rank = ((N−1)·bp)/10000 integer-exact, answer = bucket
  * lower bound. NULL for an empty sketch. */
case class HistQuantile(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hist_quantile requires (sketch binary, int basis points), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(sk: Any, bp: Any): Any = {
    val q = Hist.quantile(sk.asInstanceOf[Array[Byte]], bp.asInstanceOf[Int])
    if (q < 0L) null else q
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, bp) => {
      // freshName: with non-nullable children the block inlines unbraced
      // into the shared method scope, so a fixed name collides when a
      // projection evaluates hist_quantile more than once
      val q = ctx.freshName("q")
      s"""long $q = graft.functions.Hist.quantile($sk, $bp);
         |if ($q < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $q; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hist_quantile"
}

/** Total recorded count of a sketch column (scalar, codegen). */
case class HistCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hist_count expects a sketch (binary) column, got ${child.dataType}")

  override def nullSafeEval(sk: Any): Any =
    Hist.count(sk.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Hist.count($s)")

  override protected def withNewChildInternal(newChild: Expression): HistCount =
    copy(child = newChild)
  override def prettyName: String = "hist_count"
}

object HistExpressions {

  def histSketch(c: Column): Column =
    GraftSqlShim.column(
      HistSketchAgg(GraftSqlShim.expression(c)).toAggregateExpression())

  def histUnion(c: Column): Column =
    GraftSqlShim.column(
      HistUnionAgg(GraftSqlShim.expression(c)).toAggregateExpression())

  def histQuantile(sketch: Column, bp: Column): Column =
    GraftSqlShim.column(HistQuantile(GraftSqlShim.expression(sketch),
      GraftSqlShim.expression(bp)))

  def histCount(sketch: Column): Column =
    GraftSqlShim.column(HistCount(GraftSqlShim.expression(sketch)))
}
