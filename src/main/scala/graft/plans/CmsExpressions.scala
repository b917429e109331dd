package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

import graft.functions.Cms

/** Count-min frequency sketches as first-class binary columns — the
  * approximate-COUNT companion to [[HllExpressions]]' distinct
  * sketch, same contract: built once per corpus release / group,
  * merged across releases with `cms_union` without re-reading either
  * corpus, and every estimate replayable in the DuckDB oracle
  * (splitmix row-hash chain + exact integer bucket sums). SQL:
  * `cms_sketch64(hash [, d, w])`, `cms_union(sk)`,
  * `cms_estimate(sk, hash)`. */
case class CmsSketchAgg(
    child: Expression,
    d: Int,
    w: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  Cms.requireGeometry(d, w)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch64 aggregates a pre-hashed BIGINT column " +
        s"(e.g. cms_sketch64(fnv64(token))), got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = Cms.emptyCounters(d, w)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Cms.update(buffer, v.asInstanceOf[Long], d, w)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    Cms.merge(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Long]): Any = Cms.toBytes(buffer, d, w)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    Cms.toBytes(buffer, d, w)
  override def deserialize(storageFormat: Array[Byte]): Array[Long] =
    Cms.fromBytes(storageFormat)._3

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "cms_sketch64"
}

/** Union (elementwise counter sum) of already-built sketches; the
  * geometry rides in each sketch's header and must agree. */
case class CmsUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[(Int, Int, Array[Long])]]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_union expects a sketch (binary) column, got ${child.dataType}")

  override def createAggregationBuffer(): Option[(Int, Int, Array[Long])] = None

  private def mergeInto(buf: Option[(Int, Int, Array[Long])],
                        d: Int, w: Int, counters: Array[Long])
      : Option[(Int, Int, Array[Long])] = buf match {
    case None => Some((d, w, counters.clone()))
    case Some((d0, w0, c0)) =>
      require(d0 == d && w0 == w,
        s"cms_union: geometry mismatch (${d0}x$w0 vs ${d}x$w)")
      Cms.merge(c0, counters)
      buf
  }

  override def update(buffer: Option[(Int, Int, Array[Long])],
                      input: InternalRow): Option[(Int, Int, Array[Long])] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val (d, w, c) = Cms.fromBytes(v.asInstanceOf[Array[Byte]])
      mergeInto(buffer, d, w, c)
    }
  }

  override def merge(buffer: Option[(Int, Int, Array[Long])],
                     other: Option[(Int, Int, Array[Long])])
      : Option[(Int, Int, Array[Long])] = other match {
    case None => buffer
    case Some((d, w, c)) => mergeInto(buffer, d, w, c)
  }

  override def eval(buffer: Option[(Int, Int, Array[Long])]): Any =
    buffer.map { case (d, w, c) => Cms.toBytes(c, d, w) }.orNull

  override def serialize(buffer: Option[(Int, Int, Array[Long])]): Array[Byte] =
    buffer.map { case (d, w, c) => Cms.toBytes(c, d, w) }
      .getOrElse(Array.emptyByteArray)
  override def deserialize(storageFormat: Array[Byte])
      : Option[(Int, Int, Array[Long])] =
    if (storageFormat.isEmpty) None
    else Some(Cms.fromBytes(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "cms_union"
}

/** Point frequency estimate of a pre-hashed key against a sketch
  * column (scalar, codegen): min over the d row counters. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires (sketch binary, bigint hash), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(sk: Any, h: Any): Any =
    graft.functions.Cms.estimate(sk.asInstanceOf[Array[Byte]],
      h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, h) => s"graft.functions.Cms.estimate($s, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_estimate"
}

object CmsExpressions {

  def cmsSketch64(c: Column, d: Int = 4, w: Int = 2048): Column =
    GraftSqlShim.column(
      CmsSketchAgg(GraftSqlShim.expression(c), d, w).toAggregateExpression())

  def cmsUnion(c: Column): Column =
    GraftSqlShim.column(
      CmsUnionAgg(GraftSqlShim.expression(c)).toAggregateExpression())

  def cmsEstimate(sketch: Column, hash: Column): Column =
    GraftSqlShim.column(CmsEstimate(GraftSqlShim.expression(sketch),
      GraftSqlShim.expression(hash)))
}
