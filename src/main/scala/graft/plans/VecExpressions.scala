package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Vector kernels for the ANN path. */
object VecOps {
  /** Sign-of-dot-product signature: bit i = 1 iff dot(v, planes(i)) > 0.
    * One pass over the vector per plane, no per-plane Column lambdas —
    * the Column-expression formulation inlined planes.length × dim
    * literals into generated code and took seconds to janino-compile. */
  def hyperplaneSig(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var dot = 0.0
      var j = 0
      while (j < p.length) { dot += v.getDouble(j) * p(j); j += 1 }
      if (dot > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** Hyperplane-LSH signature as a custom codegen expression; the plane
  * matrix rides along as a referenced object, not as inlined literals. */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VecOps.hyperplaneSig(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.VecOps.hyperplaneSig($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sig"
}

object VecExpressions {
  def hyperplaneSig(c: Column, planes: Array[Array[Double]]): Column =
    GraftSqlShim.column(HyperplaneSig(GraftSqlShim.expression(c), planes))
}
