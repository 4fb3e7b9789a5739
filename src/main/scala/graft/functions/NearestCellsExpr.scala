package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

object NearestCellsKernels {

  /** Indexes of the `nProbe` nearest centroids of `vec` against
    * flattened `centers` (`centers(c * dim + t)`), ordered best-first —
    * L2 ascending (`cosineMode = false`) or cosine descending
    * (`cosineMode = true`), ties to the LOWEST index in both modes.
    *
    * Arithmetic replicates the higher-order-Column formulations it
    * replaces bit-for-bit, so swapping implementations cannot move a
    * single double in the oracle-checked outputs:
    *   - L2: `aggregate(zip_with(v, ctr, (x,y) => (x-y)*(x-y)), 0.0, _+_)`
    *     — a left-to-right double fold of squared differences;
    *   - cosine: `dot(v,c) / (sqrt(dot(v,v)) * sqrt(dot(c,c)))` with
    *     every dot a left-to-right fold (the [[VectorKernels.dot]]
    *     semantics), norms multiplied BEFORE the divide.
    * Tie-breaks match `array_sort` over (dist, cell) structs /
    * `array_min`/`array_max` struct comparison: strict improvement
    * keeps the earliest (lowest) cell.
    *
    * NULL when the vector is NULL, any element is NULL, or its length
    * differs from the centroid dimension (the zip_with form yields NULL
    * dists there; no real embedding does).
    */
  /** sqrt of each centroid's self-dot (left-to-right fold — the exact
    * `sqrt(dot(c, c))` the cosine formula needs), computed ONCE per
    * expression instance instead of per row: the per-row recompute
    * would double the cosine inner-loop cost for a value that never
    * changes. Same arithmetic, so results are bit-identical. */
  def centroidNorms(centers: Array[Double], nCentroids: Int): Array[Double] = {
    val dim = centers.length / nCentroids
    val out = new Array[Double](nCentroids)
    var c = 0
    while (c < nCentroids) {
      val base = c * dim
      var cc = 0.0
      var u = 0
      while (u < dim) {
        cc += centers(base + u) * centers(base + u)
        u += 1
      }
      out(c) = math.sqrt(cc)
      c += 1
    }
    out
  }

  def nearest(vec: ArrayData, isFloat: Boolean, centers: Array[Double],
              ctrNorms: Array[Double],
              nCentroids: Int, nProbe: Int, cosineMode: Boolean): ArrayData = {
    val dim = centers.length / nCentroids
    if (vec.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val score = new Array[Double](nCentroids)
    if (cosineMode) {
      var vv = 0.0
      var t = 0
      while (t < dim) { vv += v(t) * v(t); t += 1 }
      val vn = math.sqrt(vv)
      var c = 0
      while (c < nCentroids) {
        val base = c * dim
        var num = 0.0
        var u = 0
        while (u < dim) {
          num += v(u) * centers(base + u)
          u += 1
        }
        score(c) = num / (vn * ctrNorms(c))
        c += 1
      }
    } else {
      var c = 0
      while (c < nCentroids) {
        val base = c * dim
        var acc = 0.0
        var u = 0
        while (u < dim) {
          val d = v(u) - centers(base + u)
          acc += d * d
          u += 1
        }
        score(c) = acc
        c += 1
      }
    }
    // selection by java.lang.Double.compare — total order with NaN
    // greatest, matching what array_sort / array_min / array_max over
    // (score, cell) structs pick for every value reachable here (scores
    // are sums of squares/products and cannot be -0.0, the one value
    // where Double.compare's -0.0 < 0.0 differs from Spark's
    // -0.0 == 0.0 ordering); strict improvement keeps the earliest
    // (lowest) cell on ties
    val nOut = math.min(nProbe, nCentroids)
    val out = new Array[Int](nOut)
    val taken = new Array[Boolean](nCentroids)
    var r = 0
    while (r < nOut) {
      var best = -1
      var bestS = 0.0
      var c = 0
      while (c < nCentroids) {
        if (!taken(c)) {
          val cmp = java.lang.Double.compare(score(c), bestS)
          if (best < 0 || (if (cosineMode) cmp > 0 else cmp < 0)) {
            best = c; bestS = score(c)
          }
        }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Native nearest-centroid probe: array<float|double> -> array<int> of
  * the `nProbe` nearest cell INDEXES, best-first. The per-centroid
  * literal-struct formulation this replaces
  * (`array_sort(array(struct(dist_0, 0), struct(dist_1, 1), ...))`)
  * embeds O(nCentroids x dim) literal doubles in the plan and evaluates
  * an interpreted `zip_with`/`aggregate` lambda per centroid — fine at
  * fixture nCentroids = 16, a codegen-breaker at the production
  * nCentroids ~ sqrt(corpus) (the expression tree blows past constant
  * folding and the 64 KB generated-method limit). Here the centroids
  * ride ONE broadcast reference object (the FAISS in-RAM coarse
  * quantizer, as data rather than as a plan) consumed by a compiled
  * loop — the [[DotProductExpr]]/[[PqEncodeExpr]] pattern.
  *
  * `cosineMode = false`: squared-L2, ascending (the IVF probe/assign
  * metric). `cosineMode = true`: cosine, descending (the SemDeDup
  * argmax-cell metric). Ties to the lowest index in both.
  */
case class NearestCellsExpr(child: Expression, centers: Array[Double],
                            nCentroids: Int, nProbe: Int,
                            cosineMode: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"nearest_cells needs array<float|double>, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  // content (not reference) equality over the centroid array: the
  // case-class default compares Array[Double] by reference, so two
  // semantically identical probes would never dedup under Catalyst
  // canonicalization / common-subexpression elimination / exchange reuse
  override def equals(other: Any): Boolean = other match {
    case o: NearestCellsExpr =>
      child == o.child && nCentroids == o.nCentroids &&
        nProbe == o.nProbe && cosineMode == o.cosineMode &&
        java.util.Arrays.equals(centers, o.centers)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(centers)),
      Integer.valueOf(nCentroids), Integer.valueOf(nProbe),
      java.lang.Boolean.valueOf(cosineMode))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  @transient private lazy val ctrNorms: Array[Double] =
    if (cosineMode) NearestCellsKernels.centroidNorms(centers, nCentroids)
    else Array.emptyDoubleArray

  override def nullSafeEval(a: Any): Any =
    NearestCellsKernels.nearest(a.asInstanceOf[ArrayData], isFloat,
      centers, ctrNorms, nCentroids, nProbe, cosineMode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat
    val ctrRef = ctx.addReferenceObj("cellCenters", centers, "double[]")
    val normRef = ctx.addReferenceObj("cellNorms", ctrNorms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val cells = ctx.freshName("cells")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $cells =
          graft.functions.NearestCellsKernels.nearest(
            $a, $f, $ctrRef, $normRef, $nCentroids, $nProbe, $cosineMode);
        if ($cells == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $cells; }
      """
    })
  }
}

object NearestCellsExpr {
  import org.apache.spark.sql.GraftColumnBridge

  def apply(vec: Column, centers: Array[Array[Double]], nProbe: Int,
            cosineMode: Boolean = false): Column = {
    require(centers.nonEmpty, "nearest_cells needs at least one centroid")
    GraftColumnBridge.column(NearestCellsExpr(
      GraftColumnBridge.expression(vec), centers.flatten,
      centers.length, nProbe, cosineMode))
  }
}
