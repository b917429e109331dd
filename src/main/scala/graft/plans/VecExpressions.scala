package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Vector kernels for the ANN path. */
object VecOps {

  /** One-pass cosine similarity over two array<double> columns: dot and
    * both norms accumulate in a single loop, no intermediate arrays.
    * (The zip_with/aggregate formulation is a CodegenFallback
    * higher-order function — ~1 ms/row interpreted; this kernel is
    * ~100 ns/row and stays inside whole-stage codegen.) */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Plain dot product kernel (arrays assumed same length). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Indices of the `nprobe` centroids most cosine-similar to `v`,
    * best first. Centroids are pre-normalized by the caller so argmax
    * cosine = argmax dot. One pass over the centroid matrix; selection
    * by repeated max (nprobe is small). */
  def nearestCentroids(v: ArrayData, cents: Array[Array[Double]], nprobe: Int): Array[Int] = {
    val m = cents.length
    // copy the vector to a primitive array ONCE: the inner loop below
    // re-reads every component m times, and ArrayData.getDouble is a
    // virtual call into the unsafe row buffer — for the auto-sized IVF
    // paths m = nlist grows with the corpus, making this the hottest
    // loop of the whole ANN family (same arithmetic, same order, same
    // result; one dim-sized allocation amortized over m rows)
    val vv = v.toDoubleArray()
    val sims = new Array[Double](m)
    var c = 0
    while (c < m) {
      val p = cents(c)
      var s = 0.0; var j = 0
      while (j < p.length) { s += vv(j) * p(j); j += 1 }
      sims(c) = s
      c += 1
    }
    val k = math.min(nprobe, m)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](m)
    var r = 0
    while (r < k) {
      var best = -1; var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < m) {
        if (!taken(i) && sims(i) > bestSim) { best = i; bestSim = sims(i) }
        i += 1
      }
      taken(best) = true; out(r) = best
      r += 1
    }
    out
  }

  /** Single nearest centroid index (the IVF cell assignment). */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Double]]): Int = {
    val m = cents.length
    val vv = v.toDoubleArray() // see nearestCentroids
    var best = 0; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < m) {
      val p = cents(c)
      var s = 0.0; var j = 0
      while (j < p.length) { s += vv(j) * p(j); j += 1 }
      if (s > bestSim) { best = c; bestSim = s }
      c += 1
    }
    best
  }
  /** Johnson-Lindenstrauss random projection: out(b) = dot(v, planes(b))
    * / sqrt(k) — one pass per plane, division (not reciprocal multiply)
    * so the DuckDB replay `list_inner_product(v, pl) / sqrt(k)` is the
    * byte-identical IEEE operation sequence. */
  def randomProject(v: ArrayData, planes: Array[Array[Double]]): Array[Double] = {
    val k = planes.length
    val rt = math.sqrt(k.toDouble)
    val vv = v.toDoubleArray() // see nearestCentroids
    val out = new Array[Double](k)
    var b = 0
    while (b < k) {
      val p = planes(b)
      var dot = 0.0; var j = 0
      while (j < p.length) { dot += vv(j) * p(j); j += 1 }
      out(b) = dot / rt
      b += 1
    }
    out
  }

  /** Largest |component| (the symmetric int8 quantization range). */
  def maxAbs(v: ArrayData): Double = {
    var m = 0.0; var j = 0
    val n = v.numElements()
    while (j < n) {
      val a = math.abs(v.getDouble(j))
      if (a > m) m = a
      j += 1
    }
    m
  }

  /** Symmetric int8 quantization at a given scale: q_j =
    * floor(v_j / scale + 0.5) — round-half-up in BOTH directions, the
    * one rounding rule that replays as SQL `floor(x + 0.5)` (Math.rint
    * is half-even, SQL round() is half-away; neither matches the other
    * engine). scale = maxAbs/127 bounds |q| at 127 without clamping
    * (fl(x / fl(x/127)) < 127.5 for all finite x). A zero vector
    * (scale = 0) quantizes to zeros. */
  def quantizeI8(v: ArrayData, scale: Double): Array[Int] = {
    val n = v.numElements()
    val out = new Array[Int](n)
    if (scale != 0.0) {
      var j = 0
      while (j < n) {
        out(j) = math.floor(v.getDouble(j) / scale + 0.5).toInt
        j += 1
      }
    }
    out
  }

  /** Product-quantization encode: for each of the m subspaces, the
    * index of the L2-nearest sub-codebook centroid (strict <, so the
    * first minimum wins — replayable as a (dist, j) rank). books is
    * m × ksub × dsub. */
  def pqEncode(v: ArrayData, books: Array[Array[Array[Double]]]): Array[Int] = {
    val m = books.length
    val vv = v.toDoubleArray() // see nearestCentroids
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = books(s)
      val dsub = cb(0).length
      val off = s * dsub
      var best = 0; var bestD = Double.PositiveInfinity
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var dist = 0.0; var d = 0
        while (d < dsub) {
          val diff = vv(off + d) - c(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestD) { best = j; bestD = dist }
        j += 1
      }
      out(s) = best
      s += 1
    }
    out
  }

  /** Asymmetric-distance (ADC) score from PQ codes: Σ_s lut(q)(s)(code_s)
    * — m table lookups + adds per pair instead of `dim` multiplies.
    * luts is queries × m × ksub (per-query inner products of the query
    * sub-vector with every sub-centroid, precomputed driver-side). */
  def pqLutScore(codes: ArrayData, qIdx: Int, luts: Array[Array[Array[Double]]]): Double = {
    val lut = luts(qIdx)
    var s = 0; var acc = 0.0
    while (s < lut.length) { acc += lut(s)(codes.getInt(s)); s += 1 }
    acc
  }

  /** Sign-of-dot-product signature: bit i = 1 iff dot(v, planes(i)) > 0.
    * One pass over the vector per plane, no per-plane Column lambdas —
    * the Column-expression formulation inlined planes.length × dim
    * literals into generated code and took seconds to janino-compile. */
  def hyperplaneSig(v: ArrayData, planes: Array[Array[Double]]): Long = {
    val vv = v.toDoubleArray() // see nearestCentroids
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var dot = 0.0
      var j = 0
      while (j < p.length) { dot += vv(j) * p(j); j += 1 }
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

/** Cosine similarity of two array<double> columns as a codegen binary
  * expression — a single kernel call inside whole-stage codegen. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** Dot product of two array<double> columns as a codegen expression. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** IVF cell assignment: index of the nearest (pre-normalized) centroid,
  * as a codegen expression — the centroid matrix rides along as a
  * referenced object exactly like [[HyperplaneSig]]'s planes. */
case class NearestCell(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(v: Any): Any =
    VecOps.nearestCentroid(v.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.VecOps.nearestCentroid($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
  override def prettyName: String = "nearest_cell"
}

/** The `nprobe` nearest centroid indices (best first), for the IVF
  * query-side multi-probe. */
case class NearestCells(child: Expression, cents: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VecOps.nearestCentroids(v.asInstanceOf[ArrayData], cents, nprobe))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.VecOps.nearestCentroids($c, $ref, $nprobe))")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
  override def prettyName: String = "nearest_cells"
}

/** JL random projection to `planes.length` dimensions as a codegen
  * expression — the (k × dim) Gaussian matrix rides along as a
  * referenced object exactly like [[HyperplaneSig]]'s planes. */
case class RandomProject(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VecOps.randomProject(v.asInstanceOf[ArrayData], planes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.VecOps.randomProject($c, $ref))")
  }
  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
  override def prettyName: String = "random_project"
}

/** Largest |component| of an array<double> column (the symmetric
  * quantization range), as a codegen kernel. */
case class VecMaxAbs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    VecOps.maxAbs(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VecOps.maxAbs($c)")
  override protected def withNewChildInternal(newChild: Expression): VecMaxAbs =
    copy(child = newChild)
  override def prettyName: String = "vec_max_abs"
}

/** Symmetric int8 quantization q_j = floor(v_j / scale + 0.5) as a
  * codegen kernel over (array<double>, double). */
case class QuantizeI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullSafeEval(v: Any, s: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VecOps.quantizeI8(v.asInstanceOf[ArrayData], s.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, s) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.VecOps.quantizeI8($v, $s))")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeI8 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "quantize_i8"
}

/** PQ encode as a codegen expression — the m×ksub×dsub codebook rides
  * as a referenced object like [[NearestCell]]'s centroids. */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VecOps.pqEncode(v.asInstanceOf[ArrayData], books))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.VecOps.pqEncode($c, $ref))")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** ADC lookup score over (codes array<int>, query index int); the
  * per-query LUT stack rides as a referenced object. */
case class PqLutScore(left: Expression, right: Expression,
                      luts: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, qi: Any): Any =
    VecOps.pqLutScore(codes.asInstanceOf[ArrayData],
      qi.asInstanceOf[Int], luts)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("luts", luts, "double[][][]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.plans.VecOps.pqLutScore($c, $q, $ref)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLutScore =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_lut_score"
}

object VecExpressions {
  def hyperplaneSig(c: Column, planes: Array[Array[Double]]): Column =
    GraftSqlShim.column(HyperplaneSig(GraftSqlShim.expression(c), planes))

  def nearestCell(c: Column, cents: Array[Array[Double]]): Column =
    GraftSqlShim.column(NearestCell(GraftSqlShim.expression(c), cents))

  def nearestCells(c: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    GraftSqlShim.column(NearestCells(GraftSqlShim.expression(c), cents, nprobe))

  def cosineSim(a: Column, b: Column): Column =
    GraftSqlShim.column(CosineSim(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    GraftSqlShim.column(DotProduct(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  def randomProject(c: Column, planes: Array[Array[Double]]): Column =
    GraftSqlShim.column(RandomProject(GraftSqlShim.expression(c), planes))

  def vecMaxAbs(c: Column): Column =
    GraftSqlShim.column(VecMaxAbs(GraftSqlShim.expression(c)))

  def quantizeI8(v: Column, scale: Column): Column =
    GraftSqlShim.column(QuantizeI8(GraftSqlShim.expression(v), GraftSqlShim.expression(scale)))

  def pqEncode(v: Column, books: Array[Array[Array[Double]]]): Column =
    GraftSqlShim.column(PqEncode(GraftSqlShim.expression(v), books))

  def pqLutScore(codes: Column, qIdx: Column,
                 luts: Array[Array[Array[Double]]]): Column =
    GraftSqlShim.column(PqLutScore(GraftSqlShim.expression(codes),
      GraftSqlShim.expression(qIdx), luts))
}
