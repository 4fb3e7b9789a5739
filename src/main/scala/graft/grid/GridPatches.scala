package graft.grid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Patch extraction — the grid -> ML-training bridge: cut fixed-size
  * (pw x ph x [tFrom, tTo)) pixel patches around a TABLE of sample
  * points in ONE distributed job (reference analog: the per-window
  * `load_slice_xy` loop a notebook would run per training example —
  * K patches as K jobs; this is one).
  *
  * Scale shape: each patch fans out ARITHMETICALLY to the chunks it
  * intersects (pure column math, bounded by
  * ceil(pw/fracW+1) x ceil(ph/fracH+1) per time chunk, no data scan);
  * the fan-out equi-joins the chunk table on the chunk key (broadcast
  * when the patch list is small — the usual case — shuffled otherwise);
  * each chunk payload is decoded ONCE per intersecting patch in a
  * projection below the generators; and only the intersecting pixels
  * are generated — never a full explode of touched chunks. Chunk
  * pruning still applies: the join keys reach the parquet scan as
  * dynamic filters / broadcast-join pruning.
  */
object GridPatches {

  /** (patch_id, x, y, t, value) rows for every patch in `patches`
    * (columns (patch_id, px0, py0) — top-left corners). Pixels outside
    * the grid simply don't appear, so edge patches clip; callers
    * wanting complete tensors keep patch origins in bounds. */
  def extractPatches(spark: SparkSession, header: GridHeader, root: String,
                     patches: DataFrame, pw: Int, ph: Int,
                     tFrom: Int, tTo: Int,
                     maskNodata: Boolean = true): DataFrame = {
    require(pw > 0 && ph > 0 && tTo > tFrom,
      s"patch ${pw}x$ph t[$tFrom,$tTo)")
    val g = header.chunkGrid
    val (fw, fh, nd) = (g.fracWidth, g.fracHeight, g.fracNDates)
    val fanned = patches
      .select(col("patch_id"), col("px0").cast("int").as("px0"),
        col("py0").cast("int").as("py0"))
      .withColumn("frac_x", explode(sequence(
        greatest(expr(s"px0 div $fw"), lit(0)).cast("int"),
        least(expr(s"(px0 + ${pw - 1}) div $fw"),
          lit(g.numFracsX - 1)).cast("int"))))
      .withColumn("frac_y", explode(sequence(
        greatest(expr(s"py0 div $fh"), lit(0)).cast("int"),
        least(expr(s"(py0 + ${ph - 1}) div $fh"),
          lit(g.numFracsY - 1)).cast("int"))))
      .withColumn("time_chunk", explode(lit(
        (math.max(0, tFrom / nd) to
          math.min(g.numTimeChunks - 1, (tTo - 1) / nd)).toArray)))
    // Ragged bottom-edge chunks are shorter than fracHeight, so the
    // chunk height comes from the payload itself — but from its BYTE
    // length, never from size(decoded array): the y-intersection filter
    // below collapses into the chunk-join condition, and an `arr`-based
    // height would inline a full 640k-element payload decode into every
    // join-condition evaluation (observed as a 40x cpu swing whenever
    // the decode loop ran interpreted). octet_length is O(1) metadata.
    val bpe = PayloadCodec.bytesPerElem(PayloadCodec.code(header.dtype))
    val joined = fanned
      .join(FractionStore.fractions(spark, root),
        Seq("frac_x", "frac_y", "time_chunk"))
      // decode once per (patch, chunk) BELOW the pixel generators
      .withColumn("arr", FractionStore.unpack(header, col("data")))
      .withColumn("ch", (length(col("data")) / bpe / (col("w") * col("nd")))
        .cast("int"))
      // ragged chunks: the intersection can be empty even after the
      // chunk-key join (sequence() would run DESCENDING — guard first)
      .filter(least(col("px0") + pw, col("x0") + col("w"))
        > greatest(col("px0"), col("x0")))
      .filter(least(col("py0") + ph, col("y0") + col("ch"))
        > greatest(col("py0"), col("y0")))
      .filter(least(lit(tTo), col("t0") + col("nd"))
        > greatest(lit(tFrom), col("t0")))
    val px = joined
      .withColumn("x", explode(sequence(
        greatest(col("px0"), col("x0")),
        least(col("px0") + pw, col("x0") + col("w")) - 1)))
      .withColumn("y", explode(sequence(
        greatest(col("py0"), col("y0")),
        least(col("py0") + ph, col("y0") + col("ch")) - 1)))
      .withColumn("t", explode(sequence(
        greatest(lit(tFrom), col("t0")),
        least(lit(tTo), col("t0") + col("nd")) - 1)))
      .withColumn("value", element_at(col("arr"),
        (((col("y") - col("y0")) * col("w") + (col("x") - col("x0")))
          * col("nd") + (col("t") - col("t0")) + 1).cast("int")))
      .select(col("patch_id"), col("x").cast("int").as("x"),
        col("y").cast("int").as("y"), col("t").cast("int").as("t"),
        col("value"))
    if (maskNodata && !header.nodata.isNaN)
      px.withColumn("value", nullif(col("value"),
        lit(header.nodata).cast(FractionStore.elementType(header.dtype))))
    else px
  }

  /** Assemble extracted pixels into one flat tensor row per patch:
    * `values` ordered t-major then y then x (the (T, H, W) layout a
    * training loader expects, flattened), plus `n_px` so consumers can
    * reject clipped edge patches (`n_px < pw*ph*nT`). The sort key is
    * absolute (t, y, x) — within one patch that equals relative order. */
  def patchTensors(px: DataFrame): DataFrame =
    px.groupBy("patch_id")
      .agg(count(lit(1)).as("n_px"),
        transform(
          array_sort(collect_list(struct(col("t"), col("y"), col("x"),
            col("value")))),
          s => s.getField("value")).as("values"))
}
