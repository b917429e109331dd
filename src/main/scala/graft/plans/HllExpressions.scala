package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

import graft.functions.Hll

/** Mergeable distinct-count sketches as FIRST-CLASS COLUMNS — the
  * custom-AGGREGATE capability (`TypedImperativeAggregate`) that the
  * scalar kernels in [[HashExpressions]] don't exercise.
  *
  * Why not Spark's built-in `hll_sketch_agg` (DataSketches HLL): that
  * sketch's hashing and register encoding are a black box to the
  * DuckDB oracle, so its estimates can only be rows-only checked. This
  * sketch ([[graft.functions.Hll]]) is built from oracle-replayable
  * parts — fnv64 pre-hash, top-p bucket bits, `bin()`-computable rank
  * window, exact power-of-two register sums — so the ESTIMATE ITSELF
  * is hash-checked against DuckDB (q_hll_card), and the binary sketch
  * column is a stable cross-release artifact: per-partition sketches
  * persisted with a corpus release merge with next release's via
  * `hll_union` without re-reading either corpus (the overlapCard
  * pattern at sketch cost instead of full-distinct cost).
  *
  * Aggregation runs in ObjectHashAggregateExec (the standard physical
  * home of imperative-buffer aggregates); per-group state is one
  * `2^p`-byte array, update is branch-free register max, and partial
  * aggregation (map-side combine) works as for any Spark aggregate —
  * the shuffle carries one sketch per group per map task, never rows.
  */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  Hll.requireP(p)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch64 aggregates a pre-hashed BIGINT column " +
        s"(e.g. hll_sketch64(fnv64(text), p)), got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](Hll.numRegisters(p))

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.update(buffer, v.asInstanceOf[Long], p)
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.merge(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "hll_sketch64"
}

/** Union (bytewise register max) of already-built sketches — the
  * cross-release merge: estimate the distinct count of several corpus
  * releases from their persisted sketch columns without touching the
  * corpora. Null sketches (empty groups) are skipped.
  *
  * The GEOMETRY is read from the sketches themselves (register-array
  * length = 2^p), so `hll_union(sk)` works on sketches of any stored
  * precision without the caller tracking p out-of-band — the CMS
  * self-description contract. `p` is only the fallback geometry when
  * the input is EMPTY (eval then returns the all-zero sketch of 2^p
  * registers, whose estimate is 0); mismatched sketch widths fail
  * with the register-width message rather than merging misaligned
  * registers. */
case class HllUnionAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[Array[Byte]]]
  with UnaryLike[Expression] {

  Hll.requireP(p)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_union expects a sketch (binary) column, got ${child.dataType}")

  override def createAggregationBuffer(): Option[Array[Byte]] = None

  private def mergeInto(buf: Option[Array[Byte]],
                        sk: Array[Byte]): Option[Array[Byte]] = buf match {
    case None => Some(sk.clone())
    case Some(regs) => Hll.merge(regs, sk); buf
  }

  override def update(buffer: Option[Array[Byte]],
                      input: InternalRow): Option[Array[Byte]] = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Option[Array[Byte]],
                     other: Option[Array[Byte]]): Option[Array[Byte]] =
    other match {
      case None => buffer
      case Some(sk) => mergeInto(buffer, sk)
    }

  override def eval(buffer: Option[Array[Byte]]): Any =
    buffer.getOrElse(new Array[Byte](Hll.numRegisters(p)))
  override def serialize(buffer: Option[Array[Byte]]): Array[Byte] =
    buffer.getOrElse(Array.emptyByteArray)
  override def deserialize(storageFormat: Array[Byte]): Option[Array[Byte]] =
    if (storageFormat.isEmpty) None else Some(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "hll_union"
}

/** Distinct-count estimate of a sketch column (scalar, codegen). */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_estimate expects a sketch (binary) column, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    Hll.estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hll.estimate($c)")

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
  override def prettyName: String = "hll_estimate"
}

object HllExpressions {

  /** Sketch aggregate over a pre-hashed bigint column. */
  def hllSketch64(c: Column, p: Int): Column =
    GraftSqlShim.column(
      HllSketchAgg(GraftSqlShim.expression(c), p).toAggregateExpression())

  /** Union aggregate over a sketch column. */
  def hllUnion(c: Column, p: Int): Column =
    GraftSqlShim.column(
      HllUnionAgg(GraftSqlShim.expression(c), p).toAggregateExpression())

  /** Estimate from a sketch column. */
  def hllEstimate(c: Column): Column =
    GraftSqlShim.column(HllEstimate(GraftSqlShim.expression(c)))

  /** Convenience: estimated distinct of a pre-hashed bigint column. */
  def hllCountDistinct(c: Column, p: Int = 9): Column =
    hllEstimate(hllSketch64(c, p))
}
