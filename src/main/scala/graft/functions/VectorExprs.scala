package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators: the
  * `zip_with`/`aggregate` higher-order formulation is CodegenFallback
  * (every element pays an interpreted lambda dispatch), while ANN
  * brute-force/LSH bucketing evaluate |corpus| x |queries| (or
  * x nPlanes) dot products — the one place in the engine where scalar
  * fold cost multiplies. This expression generates a tight primitive
  * loop instead.
  *
  * Semantics are BIT-IDENTICAL to
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)`: left-to-right double accumulation, NULL when either
  * array is NULL, when lengths differ (zip_with pads the shorter side
  * with NULL), or when any element is NULL — so swapping the
  * implementation cannot move a single float in the oracle-checked
  * outputs.
  */
object VectorKernels {

  /** Boxed so a NULL result can flow back through codegen. */
  def dot(a: ArrayData, b: ArrayData,
          aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** double dot product of two numeric-array columns (float32 or float64
  * element types, independently per side). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot product needs array<float|double>, got $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val af = isFloat(left); val bf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
        java.lang.Double $boxed =
          graft.functions.VectorKernels.dot($a, $b, $af, $bf);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      """
    })
  }
}

object DotProductExpr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

object PqKernels {

  /** PQ-encode one vector against flattened codebooks
    * (`cb[((m*ksub)+j)*dsub + t]`): per subspace the argmin of squared
    * L2 over ksub centroids, accumulated left-to-right in double —
    * the exact arithmetic of the higher-order
    * `aggregate(zip_with(...))` form and of the DuckDB oracle's
    * `list_sum(list_transform(...))`, with strict `<` keeping the
    * lowest j on ties (the argmax-over-(negdist,-j) tiebreak).
    * NULL when the vector is shorter than nSub*dsub or any element is
    * NULL (no real embedding is). */
  def encode(vec: ArrayData, isFloat: Boolean, cb: Array[Double],
             nSub: Int, ksub: Int): ArrayData = {
    val dsub = cb.length / (nSub * ksub)
    val dim = nSub * dsub
    if (vec.numElements() < dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ksub) {
        var acc = 0.0
        val base = (m * ksub + j) * dsub
        val voff = m * dsub
        var t = 0
        while (t < dsub) {
          val d = v(voff + t) - cb(base + t)
          acc += d * d
          t += 1
        }
        if (acc < bestD) { bestD = acc; best = j }
        j += 1
      }
      out(m) = best
      m += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Native PQ encode: array<float|double> -> array<int> of nSub codes.
  * The higher-order formulation is CodegenFallback and pays
  * nSub * ksub * dsub interpreted lambda dispatches per row — measured
  * dominating the whole PQ query at bench scale (the encode side is
  * |corpus|-proportional). One tight loop instead; semantics pinned to
  * the interpreted form by SimilaritySpec's local replay. */
case class PqEncodeExpr(child: Expression, cb: Array[Double],
                        nSub: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"pq_encode needs array<float|double>, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    PqKernels.encode(a.asInstanceOf[ArrayData], isFloat, cb, nSub, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("pqcodes")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $codes =
          graft.functions.PqKernels.encode($a, $f, $cbRef, $nSub, $ksub);
        if ($codes == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $codes; }
      """
    })
  }
}

object PqEncodeExpr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val nSub = codebooks.length
    val ksub = codebooks(0).length
    GraftColumnBridge.column(PqEncodeExpr(
      GraftColumnBridge.expression(vec), codebooks.flatten.flatten,
      nSub, ksub))
  }
}

object Int8Kernels {

  /** array<tinyint> -> raw bytes; NULL on any NULL element (a byte
    * cannot encode one). */
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      out(i) = a.getByte(i)
      i += 1
    }
    out
  }

  /** raw bytes -> array<double>, each SIGNED byte times `scale` — the
    * fused unpack+dequantize for stored int8 embeddings. */
  def unpack(bin: Array[Byte], scale: Double): ArrayData = {
    val out = new Array[Double](bin.length)
    var i = 0
    while (i < bin.length) {
      out(i) = bin(i).toDouble * scale
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Pack an int8-quantized vector into a parquet-friendly BINARY value.
  * Parquet has no 1-byte physical integer — `array<tinyint>` lands as
  * physical INT32 per element plus per-element repetition levels, which
  * measured LARGER on disk than the float32 array it was meant to
  * shrink. A BYTE_ARRAY is one byte per component, the FAISS layout.
  */
case class PackInt8Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pack_int8"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ByteType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_int8 needs array<tinyint>, got $t")
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    Int8Kernels.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("packed")
      s"""
        byte[] $bytes = graft.functions.Int8Kernels.pack($a);
        if ($bytes == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $bytes; }
      """
    })
}

object PackInt8Expr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(a: Column): Column =
    GraftColumnBridge.column(PackInt8Expr(GraftColumnBridge.expression(a)))
}

/** Fused unpack+dequantize: BINARY int8 payload times a per-vector
  * double scale -> array<double>, one tight loop, no intermediate
  * tinyint array. */
case class UnpackInt8Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unpack_int8"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unpack_int8 needs (binary, double), got ($l, $r)")
    }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)

  override def nullSafeEval(bin: Any, scale: Any): Any =
    Int8Kernels.unpack(bin.asInstanceOf[Array[Byte]],
      scale.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bin, scale) => {
      s"""
        ${ev.value} = graft.functions.Int8Kernels.unpack($bin, $scale);
      """
    })
}

object UnpackInt8Expr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(bin: Column, scale: Column): Column =
    GraftColumnBridge.column(UnpackInt8Expr(
      GraftColumnBridge.expression(bin), GraftColumnBridge.expression(scale)))
}
