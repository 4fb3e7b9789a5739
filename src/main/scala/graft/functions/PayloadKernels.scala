package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

import graft.grid.PayloadCodec

/** Fused chunk-payload kernels: decode + map + reduce in ONE generated
  * loop per chunk row, never materializing the pixel rows.
  *
  * The exploded pixel view (`FractionStore.pixels`) is the right shape
  * for ad-hoc relational queries, but a whole-store scan kernel pays
  * ~10^8 row transitions for what is arithmetic over packed int16/uint16
  * buffers. The reference hit the same wall in Python and moved the QA
  * decode to a Cython+OpenMP kernel (modis_qa.pyx:105-120, "takes a long
  * time" otherwise); the Spark-native equivalent is a custom Catalyst
  * expression whose generated code folds the payload bytes directly —
  * one virtual call per CHUNK (~640k px), not per pixel. Parallelism
  * comes from Spark's task scheduling over chunk rows, the moral
  * equivalent of the reference's OpenMP loop, except it also distributes
  * across executors.
  *
  * The speedup is RECORDED, not claimed: Bench times the exploded and
  * fused paths back-to-back in the same process (the
  * `grid_qa_decode_{exploded,fused}` / `grid_window_load_{exploded,
  * fused}` entry pairs, wall + executor-CPU seconds) so each round's
  * BENCH json carries the measured A/B on the 92 Mpx tile.
  */
object PayloadKernels {

  /** Sum of MODIS QA confidences + element count over one uint16
    * payload. Returns struct(sum_conf double, n long). */
  def qaConfStats(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length / 2
    var sum = 0.0
    var i = 0
    while (i < n) {
      val q = ((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)
      sum += QaDecode.modisQaConfScalar(q)
      i += 1
    }
    new GenericInternalRow(Array[Any](sum, n.toLong))
  }

  /** Numeric element of a packed payload as double (layout per
    * [[PayloadCodec]]; little-endian). */
  private def elem(bytes: Array[Byte], code: Int, i: Int): Double =
    (code: @annotation.switch) match {
      case PayloadCodec.U8  => (bytes(i) & 0xff).toDouble
      case PayloadCodec.I16 =>
        (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toDouble
      case PayloadCodec.U16 =>
        (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toDouble
      case PayloadCodec.I32 =>
        ((bytes(4 * i + 3) & 0xff) << 24 | (bytes(4 * i + 2) & 0xff) << 16 |
          (bytes(4 * i + 1) & 0xff) << 8 | (bytes(4 * i) & 0xff)).toDouble
      case PayloadCodec.F32 =>
        java.lang.Float.intBitsToFloat(
          (bytes(4 * i + 3) & 0xff) << 24 | (bytes(4 * i + 2) & 0xff) << 16 |
            (bytes(4 * i + 1) & 0xff) << 8 | (bytes(4 * i) & 0xff)).toDouble
      case _ =>
        java.lang.Double.longBitsToDouble(
          (bytes(8 * i + 7) & 0xffL) << 56 | (bytes(8 * i + 6) & 0xffL) << 48 |
            (bytes(8 * i + 5) & 0xffL) << 40 | (bytes(8 * i + 4) & 0xffL) << 32 |
            (bytes(8 * i + 3) & 0xffL) << 24 | (bytes(8 * i + 2) & 0xffL) << 16 |
            (bytes(8 * i + 1) & 0xffL) << 8 | (bytes(8 * i) & 0xffL))
    }

  /** Per-date statistics of a single value payload restricted to a
    * global-coordinate box — the fused form of "window load -> agg"
    * (the P3 hot path). No QA gate: nodata is the only mask. Payload
    * layout is the store's [y][x][t] C-order.
    *
    * Returns array of struct(t int, sum_v double, n_valid long,
    * n_total long, min_v double?, max_v double?), one entry per
    * chunk-local date in [tFrom, tTo): sum_v/n_valid/min/max aggregate
    * values != nodata; n_total counts every in-box pixel; min_v/max_v
    * are NULL for dates with no valid pixel (so min()/max() upstream
    * aggregates skip them).
    */
  def boxStats(v: Array[Byte], vCode: Int,
               w: Int, h: Int, nd: Int,
               x0: Int, y0: Int, t0: Int,
               bx0: Int, bx1: Int, by0: Int, by1: Int,
               tFrom: Int, tTo: Int, nodata: Double): ArrayData = {
    val lxFrom = math.max(0, bx0 - x0)
    val lxTo = math.min(w, bx1 - x0)
    val lyFrom = math.max(0, by0 - y0)
    val lyTo = math.min(h, by1 - y0)
    val ltFrom = math.max(0, tFrom - t0)
    val ltTo = math.min(nd, tTo - t0)
    val nt = math.max(0, ltTo - ltFrom)
    val sums = new Array[Double](nt)
    val valid = new Array[Long](nt)
    val mins = Array.fill(nt)(Double.PositiveInfinity)
    val maxs = Array.fill(nt)(Double.NegativeInfinity)
    var total = 0L
    // the box scan is decoded ONCE per chunk into a primitive array,
    // then folded in a branch-light loop — a per-element dtype switch
    // in the hot loop measured ~2x slower than bulk-decode + fold (the
    // same reason the exploded path's unpack-then-codegen is fast)
    val decoded = PayloadCodec.decodeDouble(v, vCode)
    var ly = lyFrom
    while (ly < lyTo) {
      var lx = lxFrom
      while (lx < lxTo) {
        val base = (ly * w + lx) * nd
        var lt = ltFrom
        while (lt < ltTo) {
          val value = decoded(base + lt)
          if (value != nodata) {
            val k = lt - ltFrom
            sums(k) += value
            valid(k) += 1
            if (value < mins(k)) mins(k) = value
            if (value > maxs(k)) maxs(k) = value
          }
          lt += 1
        }
        total += 1
        lx += 1
      }
      ly += 1
    }
    val rows = new Array[Any](nt)
    var k = 0
    while (k < nt) {
      val mn: Any = if (valid(k) > 0) mins(k) else null
      val mx: Any = if (valid(k) > 0) maxs(k) else null
      rows(k) = new GenericInternalRow(
        Array[Any](t0 + ltFrom + k, sums(k), valid(k), total, mn, mx))
      k += 1
    }
    new GenericArrayData(rows)
  }

  /** Per-date masked statistics of a value payload gated by a QA
    * payload, restricted to a global-coordinate box — the fused form of
    * "aligned two-band load -> conf -> groupBy(t)". Payload layout is
    * the store's [y][x][t] C-order (see FractionStore.pixels).
    *
    * Returns array of struct(t int, sum_v double, n_clear long,
    * n_total long), one entry per chunk-local date in [tFrom, tTo):
    * sum_v/n_clear aggregate values whose QA confidence > 0.5 AND value
    * != nodata; n_total counts every in-box pixel.
    */
  def maskedBoxStats(v: Array[Byte], q: Array[Byte], vCode: Int,
                     w: Int, h: Int, nd: Int,
                     x0: Int, y0: Int, t0: Int,
                     bx0: Int, bx1: Int, by0: Int, by1: Int,
                     tFrom: Int, tTo: Int, nodata: Double): ArrayData = {
    val lxFrom = math.max(0, bx0 - x0)
    val lxTo = math.min(w, bx1 - x0)
    val lyFrom = math.max(0, by0 - y0)
    val lyTo = math.min(h, by1 - y0)
    val ltFrom = math.max(0, tFrom - t0)
    val ltTo = math.min(nd, tTo - t0)
    val nt = math.max(0, ltTo - ltFrom)
    val sums = new Array[Double](nt)
    val clear = new Array[Long](nt)
    var total = 0L
    var ly = lyFrom
    while (ly < lyTo) {
      var lx = lxFrom
      while (lx < lxTo) {
        val base = (ly * w + lx) * nd
        var lt = ltFrom
        while (lt < ltTo) {
          val i = base + lt
          val qa = ((q(2 * i + 1) & 0xff) << 8) | (q(2 * i) & 0xff)
          val conf = QaDecode.modisQaConfScalar(qa)
          if (conf > 0.5f) {
            val value = elem(v, vCode, i)
            if (value != nodata) {
              sums(lt - ltFrom) += value
              clear(lt - ltFrom) += 1
            }
          }
          lt += 1
        }
        total += 1
        lx += 1
      }
      ly += 1
    }
    val rows = new Array[Any](nt)
    var k = 0
    while (k < nt) {
      rows(k) = new GenericInternalRow(
        Array[Any](t0 + ltFrom + k, sums(k), clear(k), total))
      k += 1
    }
    new GenericArrayData(rows)
  }

  /** Per-pixel one-sided CUSUM over one chunk payload restricted to a
    * global-coordinate box — the fused form of
    * `GridTimeSeries.cusumDetect(loadSliceXY(...))` when the whole
    * requested date range (training AND monitoring) lives in one time
    * slab. Same arithmetic as the relational closed form: baseline =
    * valid dates in [tFrom, trainT); per valid monitoring date the
    * micro-grid deviation d = (sm − n·x)·1e6 − n·slackMicro accumulates
    * into the running sum r with running min mn (both exact integers on
    * integer-valued grids), cusum = HALF_UP((r − mn)/(n·1e6), roundTo),
    * alarm = (r − mn) > n·hMicro. Pixels with no valid training date
    * are omitted, as are invalid monitoring dates.
    *
    * Returns array of struct(x int, y int, t int, cusum double,
    * alarm int).
    */
  def cusumPixels(v: Array[Byte], vCode: Int,
                  w: Int, h: Int, nd: Int,
                  x0: Int, y0: Int, t0: Int,
                  bx0: Int, bx1: Int, by0: Int, by1: Int,
                  tFrom: Int, tTo: Int, nodata: Double,
                  trainT: Int, slackMicro: Double, hMicro: Double,
                  roundTo: Int): ArrayData = {
    val lxFrom = math.max(0, bx0 - x0)
    val lxTo = math.min(w, bx1 - x0)
    val lyFrom = math.max(0, by0 - y0)
    val lyTo = math.min(h, by1 - y0)
    val ltFrom = math.max(0, tFrom - t0)
    val ltTo = math.min(nd, tTo - t0)
    val ltTrain = math.min(math.max(0, trainT - t0), ltTo)
    val decoded = PayloadCodec.decodeDouble(v, vCode)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    out.sizeHint(math.max(0,
      (lxTo - lxFrom) * (lyTo - lyFrom) * (ltTo - ltTrain)))
    var ly = lyFrom
    while (ly < lyTo) {
      var lx = lxFrom
      while (lx < lxTo) {
        val base = (ly * w + lx) * nd
        var nTrain = 0L
        var sm = 0.0
        var lt = ltFrom
        while (lt < ltTrain) {
          val value = decoded(base + lt)
          if (value != nodata) { nTrain += 1; sm += value }
          lt += 1
        }
        if (nTrain > 0) {
          var r = 0.0
          var mn = 0.0
          lt = ltTrain
          while (lt < ltTo) {
            val value = decoded(base + lt)
            if (value != nodata) {
              r += (sm - nTrain * value) * 1e6 - nTrain * slackMicro
              if (r < mn) mn = r
              val cusum = java.math.BigDecimal
                .valueOf((r - mn) / (nTrain * 1e6))
                .setScale(roundTo, java.math.RoundingMode.HALF_UP)
                .doubleValue()
              val alarm = if (r - mn > nTrain * hMicro) 1 else 0
              out += new GenericInternalRow(
                Array[Any](x0 + lx, y0 + ly, t0 + lt, cusum, alarm))
            }
            lt += 1
          }
        }
        lx += 1
      }
      ly += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-pixel OLS trend slope over one chunk payload restricted to a
    * global-coordinate box — the fused form of
    * `GridTimeSeries.trendSlope(loadSliceXY(...))` when the requested
    * date range lives in ONE time slab (fracNDates covers it), so every
    * pixel's whole series sits inside this payload and the trend map
    * needs no shuffle at all. Same arithmetic as the relational form:
    * integer-valued double sums (exact in any order), slope rounded
    * HALF_UP to `roundTo` decimals, 0 when the t-variance determinant
    * is not positive; pixels with zero valid observations are omitted
    * (the exploded groupBy never sees them).
    *
    * Returns array of struct(x int, y int, n long, slope double).
    */
  def trendSlopes(v: Array[Byte], vCode: Int,
                  w: Int, h: Int, nd: Int,
                  x0: Int, y0: Int, t0: Int,
                  bx0: Int, bx1: Int, by0: Int, by1: Int,
                  tFrom: Int, tTo: Int, nodata: Double,
                  roundTo: Int): ArrayData = {
    val lxFrom = math.max(0, bx0 - x0)
    val lxTo = math.min(w, bx1 - x0)
    val lyFrom = math.max(0, by0 - y0)
    val lyTo = math.min(h, by1 - y0)
    val ltFrom = math.max(0, tFrom - t0)
    val ltTo = math.min(nd, tTo - t0)
    val decoded = PayloadCodec.decodeDouble(v, vCode)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    out.sizeHint(math.max(0, (lxTo - lxFrom) * (lyTo - lyFrom)))
    var ly = lyFrom
    while (ly < lyTo) {
      var lx = lxFrom
      while (lx < lxTo) {
        val base = (ly * w + lx) * nd
        var n = 0L
        var st = 0.0; var sv = 0.0; var stv = 0.0; var stt = 0.0
        var lt = ltFrom
        while (lt < ltTo) {
          val value = decoded(base + lt)
          if (value != nodata) {
            val t = (t0 + lt).toDouble
            n += 1; st += t; sv += value; stv += t * value; stt += t * t
          }
          lt += 1
        }
        if (n > 0) {
          val det = n * stt - st * st
          val slope =
            if (det > 0)
              java.math.BigDecimal.valueOf((n * stv - st * sv) / det)
                .setScale(roundTo, java.math.RoundingMode.HALF_UP)
                .doubleValue()
            else 0.0
          out += new GenericInternalRow(
            Array[Any](x0 + lx, y0 + ly, n, slope))
        }
        lx += 1
      }
      ly += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** struct(sum_conf double, n long) over one uint16 QA payload. */
case class QaConfStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = QaConfStatsExpr.schema
  override def prettyName: String = "qa_conf_stats"

  override protected def withNewChildInternal(newChild: Expression): QaConfStatsExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PayloadKernels.qaConfStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PayloadKernels.qaConfStats($c)")
}

object QaConfStatsExpr {
  import org.apache.spark.sql.GraftColumnBridge
  val schema: StructType = StructType(Seq(
    StructField("sum_conf", DoubleType, nullable = false),
    StructField("n", LongType, nullable = false)))

  def apply(data: Column): Column =
    GraftColumnBridge.column(QaConfStatsExpr(GraftColumnBridge.expression(data)))
}

/** array<struct(t, sum_v, n_clear, n_total)> — fused masked box stats
  * over an aligned (value, qa) chunk pair. Box/time window and nodata
  * are plan-time constants; chunk geometry columns ride per row.
  */
case class MaskedBoxStatsExpr(
    vData: Expression, qData: Expression,
    w: Expression, h: Expression, nd: Expression,
    x0: Expression, y0: Expression, t0: Expression,
    vCode: Int, bx0: Int, bx1: Int, by0: Int, by1: Int,
    tFrom: Int, tTo: Int, nodata: Double) extends Expression {

  override def children: Seq[Expression] =
    Seq(vData, qData, w, h, nd, x0, y0, t0)
  override def dataType: DataType =
    ArrayType(MaskedBoxStatsExpr.entrySchema, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "masked_box_stats"

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vData = c(0), qData = c(1), w = c(2), h = c(3), nd = c(4),
      x0 = c(5), y0 = c(6), t0 = c(7))

  override def eval(input: InternalRow): Any = {
    val ins = children.map(_.eval(input))
    if (ins.contains(null)) null
    else PayloadKernels.maskedBoxStats(
      ins(0).asInstanceOf[Array[Byte]], ins(1).asInstanceOf[Array[Byte]],
      vCode,
      ins(2).asInstanceOf[Int], ins(3).asInstanceOf[Int],
      ins(4).asInstanceOf[Int], ins(5).asInstanceOf[Int],
      ins(6).asInstanceOf[Int], ins(7).asInstanceOf[Int],
      bx0, bx1, by0, by1, tFrom, tTo, nodata)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull).mkString(" || ")
    val resultType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val code =
      code"""
        ${evs.map(_.code).reduce(_ + _)}
        boolean ${ev.isNull} = $anyNull;
        $resultType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PayloadKernels.maskedBoxStats(
            ${evs(0).value}, ${evs(1).value}, $vCode,
            ${evs(2).value}, ${evs(3).value}, ${evs(4).value},
            ${evs(5).value}, ${evs(6).value}, ${evs(7).value},
            $bx0, $bx1, $by0, $by1, $tFrom, $tTo, $nodata);
        }
      """
    ev.copy(code = code)
  }
}

/** array<struct(t, sum_v, n_valid, n_total, min_v, max_v)> — fused
  * per-date box statistics over ONE chunk payload (no QA gate; nodata
  * is the only mask). The fused twin of the exploded window-load
  * aggregate: decode + box filter + per-date fold in one generated
  * loop per chunk row.
  */
case class BoxStatsExpr(
    vData: Expression,
    w: Expression, h: Expression, nd: Expression,
    x0: Expression, y0: Expression, t0: Expression,
    vCode: Int, bx0: Int, bx1: Int, by0: Int, by1: Int,
    tFrom: Int, tTo: Int, nodata: Double) extends Expression {

  override def children: Seq[Expression] =
    Seq(vData, w, h, nd, x0, y0, t0)
  override def dataType: DataType =
    ArrayType(BoxStatsExpr.entrySchema, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "box_stats"

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vData = c(0), w = c(1), h = c(2), nd = c(3),
      x0 = c(4), y0 = c(5), t0 = c(6))

  override def eval(input: InternalRow): Any = {
    val ins = children.map(_.eval(input))
    if (ins.contains(null)) null
    else PayloadKernels.boxStats(
      ins(0).asInstanceOf[Array[Byte]], vCode,
      ins(1).asInstanceOf[Int], ins(2).asInstanceOf[Int],
      ins(3).asInstanceOf[Int], ins(4).asInstanceOf[Int],
      ins(5).asInstanceOf[Int], ins(6).asInstanceOf[Int],
      bx0, bx1, by0, by1, tFrom, tTo, nodata)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull).mkString(" || ")
    val resultType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val code =
      code"""
        ${evs.map(_.code).reduce(_ + _)}
        boolean ${ev.isNull} = $anyNull;
        $resultType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PayloadKernels.boxStats(
            ${evs(0).value}, $vCode,
            ${evs(1).value}, ${evs(2).value}, ${evs(3).value},
            ${evs(4).value}, ${evs(5).value}, ${evs(6).value},
            $bx0, $bx1, $by0, $by1, $tFrom, $tTo, $nodata);
        }
      """
    ev.copy(code = code)
  }
}

/** array<struct(x, y, t, cusum, alarm)> — fused per-pixel CUSUM over
  * ONE chunk payload (see [[PayloadKernels.cusumPixels]]). Valid only
  * when training + monitoring dates sit in one time slab; the
  * GridKernels entry point enforces that.
  */
case class CusumExpr(
    vData: Expression,
    w: Expression, h: Expression, nd: Expression,
    x0: Expression, y0: Expression, t0: Expression,
    vCode: Int, bx0: Int, bx1: Int, by0: Int, by1: Int,
    tFrom: Int, tTo: Int, nodata: Double,
    trainT: Int, slackMicro: Double, hMicro: Double, roundTo: Int)
  extends Expression {

  override def children: Seq[Expression] =
    Seq(vData, w, h, nd, x0, y0, t0)
  override def dataType: DataType =
    ArrayType(CusumExpr.entrySchema, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "cusum_pixels"

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vData = c(0), w = c(1), h = c(2), nd = c(3),
      x0 = c(4), y0 = c(5), t0 = c(6))

  override def eval(input: InternalRow): Any = {
    val ins = children.map(_.eval(input))
    if (ins.contains(null)) null
    else PayloadKernels.cusumPixels(
      ins(0).asInstanceOf[Array[Byte]], vCode,
      ins(1).asInstanceOf[Int], ins(2).asInstanceOf[Int],
      ins(3).asInstanceOf[Int], ins(4).asInstanceOf[Int],
      ins(5).asInstanceOf[Int], ins(6).asInstanceOf[Int],
      bx0, bx1, by0, by1, tFrom, tTo, nodata,
      trainT, slackMicro, hMicro, roundTo)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull).mkString(" || ")
    val resultType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val code =
      code"""
        ${evs.map(_.code).reduce(_ + _)}
        boolean ${ev.isNull} = $anyNull;
        $resultType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PayloadKernels.cusumPixels(
            ${evs(0).value}, $vCode,
            ${evs(1).value}, ${evs(2).value}, ${evs(3).value},
            ${evs(4).value}, ${evs(5).value}, ${evs(6).value},
            $bx0, $bx1, $by0, $by1, $tFrom, $tTo, $nodata,
            $trainT, $slackMicro, $hMicro, $roundTo);
        }
      """
    ev.copy(code = code)
  }
}

object CusumExpr {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.functions.col

  val entrySchema: StructType = StructType(Seq(
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("t", IntegerType, nullable = false),
    StructField("cusum", DoubleType, nullable = false),
    StructField("alarm", IntegerType, nullable = false)))

  /** Column factory over chunk rows carrying vDataCol + the standard
    * chunk geometry columns (w, h, nd, x0, y0, t0). */
  def apply(vDataCol: Column, vDtype: String,
            xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
            tFrom: Int, tTo: Int, nodata: Double,
            trainT: Int, slackMicro: Double, hMicro: Double,
            roundTo: Int): Column = {
    def e(c: Column) = GraftColumnBridge.expression(c)
    GraftColumnBridge.column(CusumExpr(
      e(vDataCol),
      e(col("w")), e(col("h")), e(col("nd")),
      e(col("x0")), e(col("y0")), e(col("t0")),
      PayloadCodec.code(vDtype), xFrom, xTo, yFrom, yTo,
      tFrom, tTo, nodata, trainT, slackMicro, hMicro, roundTo))
  }
}

/** array<struct(x, y, n, slope)> — fused per-pixel OLS trend over ONE
  * chunk payload (see [[PayloadKernels.trendSlopes]]). Valid only when
  * the requested [tFrom, tTo) sits in one time slab; the GridKernels
  * entry point enforces that.
  */
case class TrendSlopeExpr(
    vData: Expression,
    w: Expression, h: Expression, nd: Expression,
    x0: Expression, y0: Expression, t0: Expression,
    vCode: Int, bx0: Int, bx1: Int, by0: Int, by1: Int,
    tFrom: Int, tTo: Int, nodata: Double, roundTo: Int)
  extends Expression {

  override def children: Seq[Expression] =
    Seq(vData, w, h, nd, x0, y0, t0)
  override def dataType: DataType =
    ArrayType(TrendSlopeExpr.entrySchema, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "trend_slopes"

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vData = c(0), w = c(1), h = c(2), nd = c(3),
      x0 = c(4), y0 = c(5), t0 = c(6))

  override def eval(input: InternalRow): Any = {
    val ins = children.map(_.eval(input))
    if (ins.contains(null)) null
    else PayloadKernels.trendSlopes(
      ins(0).asInstanceOf[Array[Byte]], vCode,
      ins(1).asInstanceOf[Int], ins(2).asInstanceOf[Int],
      ins(3).asInstanceOf[Int], ins(4).asInstanceOf[Int],
      ins(5).asInstanceOf[Int], ins(6).asInstanceOf[Int],
      bx0, bx1, by0, by1, tFrom, tTo, nodata, roundTo)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull).mkString(" || ")
    val resultType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val code =
      code"""
        ${evs.map(_.code).reduce(_ + _)}
        boolean ${ev.isNull} = $anyNull;
        $resultType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PayloadKernels.trendSlopes(
            ${evs(0).value}, $vCode,
            ${evs(1).value}, ${evs(2).value}, ${evs(3).value},
            ${evs(4).value}, ${evs(5).value}, ${evs(6).value},
            $bx0, $bx1, $by0, $by1, $tFrom, $tTo, $nodata, $roundTo);
        }
      """
    ev.copy(code = code)
  }
}

object TrendSlopeExpr {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.functions.col

  val entrySchema: StructType = StructType(Seq(
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("slope", DoubleType, nullable = false)))

  /** Column factory over chunk rows carrying vDataCol + the standard
    * chunk geometry columns (w, h, nd, x0, y0, t0). */
  def apply(vDataCol: Column, vDtype: String,
            xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
            tFrom: Int, tTo: Int, nodata: Double, roundTo: Int): Column = {
    def e(c: Column) = GraftColumnBridge.expression(c)
    GraftColumnBridge.column(TrendSlopeExpr(
      e(vDataCol),
      e(col("w")), e(col("h")), e(col("nd")),
      e(col("x0")), e(col("y0")), e(col("t0")),
      graft.grid.PayloadCodec.code(vDtype), xFrom, xTo, yFrom, yTo,
      tFrom, tTo, nodata, roundTo))
  }
}

object BoxStatsExpr {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.functions.col

  val entrySchema: StructType = StructType(Seq(
    StructField("t", IntegerType, nullable = false),
    StructField("sum_v", DoubleType, nullable = false),
    StructField("n_valid", LongType, nullable = false),
    StructField("n_total", LongType, nullable = false),
    StructField("min_v", DoubleType, nullable = true),
    StructField("max_v", DoubleType, nullable = true)))

  /** Column factory over chunk rows carrying vDataCol + the standard
    * chunk geometry columns (w, h, nd, x0, y0, t0). */
  def apply(vDataCol: Column, vDtype: String,
            xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
            tFrom: Int, tTo: Int, nodata: Double): Column = {
    def e(c: Column) = GraftColumnBridge.expression(c)
    GraftColumnBridge.column(BoxStatsExpr(
      e(vDataCol),
      e(col("w")), e(col("h")), e(col("nd")),
      e(col("x0")), e(col("y0")), e(col("t0")),
      PayloadCodec.code(vDtype), xFrom, xTo, yFrom, yTo,
      tFrom, tTo, nodata))
  }
}

object MaskedBoxStatsExpr {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.functions.col

  val entrySchema: StructType = StructType(Seq(
    StructField("t", IntegerType, nullable = false),
    StructField("sum_v", DoubleType, nullable = false),
    StructField("n_clear", LongType, nullable = false),
    StructField("n_total", LongType, nullable = false)))

  /** Column factory over aligned chunk rows carrying vDataCol/qDataCol +
    * the standard chunk geometry columns (w, h, nd, x0, y0, t0). */
  def apply(vDataCol: Column, qDataCol: Column, vDtype: String,
            xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
            tFrom: Int, tTo: Int, nodata: Double): Column = {
    def e(c: Column) = GraftColumnBridge.expression(c)
    GraftColumnBridge.column(MaskedBoxStatsExpr(
      e(vDataCol), e(qDataCol),
      e(col("w")), e(col("h")), e(col("nd")),
      e(col("x0")), e(col("y0")), e(col("t0")),
      PayloadCodec.code(vDtype), xFrom, xTo, yFrom, yTo,
      tFrom, tTo, nodata))
  }
}
