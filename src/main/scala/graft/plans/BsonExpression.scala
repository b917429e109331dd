package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

import graft.functions.BsonDecoder

/** `from_bson(doc, schema)` — decode a BSON document (full, or the
  * prefix-stripped body [[graft.sources.DumpSource]] emits) into a
  * struct, the binary twin of `from_json`. The schema-compiled
  * [[BsonDecoder]] is shipped as a codegen reference object and the
  * generated code is a single kernel call, so the decode stays inside
  * the enclosing WholeStageCodegen span (reference semantics:
  * mgo/bson unmarshal, ght2dm.go:277-315). Undecodable bytes yield a
  * NULL struct; unknown document fields are skipped (mgo's
  * unmarshal-into-struct behavior). */
case class FromBson(child: Expression, schema: StructType) extends UnaryExpression {
  override def dataType: DataType = schema
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"from_bson requires binary input, got ${child.dataType}")
  }

  // one decoder per expression instance, serialized to executors for
  // interpreted eval and referenced from generated code
  private lazy val decoder = new BsonDecoder(schema)

  override def nullSafeEval(v: Any): Any =
    decoder.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dec = ctx.addReferenceObj("bsonDecoder", decoder,
      classOf[BsonDecoder].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $dec.decode($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): FromBson =
    copy(child = newChild)
  override def prettyName: String = "from_bson"
}

object BsonFunctions {
  /** BSON document (binary) → struct column, like `from_json`. */
  def fromBson(c: Column, schema: StructType): Column =
    GraftSqlShim.column(FromBson(GraftSqlShim.expression(c), schema))
}
