package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** QA-bitfield → confidence decoders (reference: F5/F6 —
  * rastercube/datasources/modis.py:117-202 (slow twin, the semantic spec),
  * modis_qa.pyx:22-120 (OpenMP kernel), landsat8_qa.pyx:23-84).
  *
  * Pure bitwise/when Column chains: whole-stage codegen compiles these to
  * a tight JVM loop, the engine's analog of the reference's Cython+OpenMP
  * kernel — no UDF, no JNI.
  */
object QaDecode {

  /** MODIS MOD13Q1 VI-Quality 16-bit word → confidence in (-0.25..1].
    *
    * Gates to 0: MODLAND_QA == 3 (bits 0-1), aerosol == 3 (6-7),
    * adjacent cloud (8), mixed cloud (10), land/water != land(1) (11-13),
    * snow/ice (14), shadow (15). Otherwise 1 - usefulness/12 (bits 2-5;
    * like the reference this may go negative for usefulness > 12 and is
    * deliberately not clamped). Result is float32, matching the
    * reference's dtype.
    */
  def modisQaConf(qa: Column): Column = {
    val q = qa.cast("int").bitwiseAND(lit(0xffff)) // uint16 semantics
    val viQuality = q.bitwiseAND(lit(0x3))
    val usefulness = shiftright(q, 2).bitwiseAND(lit(0xf))
    val aerosol = shiftright(q, 6).bitwiseAND(lit(0x3))
    val adjCloud = shiftright(q, 8).bitwiseAND(lit(0x1))
    val cloud = shiftright(q, 10).bitwiseAND(lit(0x1))
    val land = shiftright(q, 11).bitwiseAND(lit(0x7))
    val snow = shiftright(q, 14).bitwiseAND(lit(0x1))
    val shadow = shiftright(q, 15).bitwiseAND(lit(0x1))
    val gated = viQuality === 3 || aerosol === 3 || adjCloud === 1 ||
      cloud === 1 || land =!= 1 || snow === 1 || shadow === 1
    when(gated, lit(0.0f))
      .otherwise((lit(1.0) - usefulness.cast("double") / lit(12.0)).cast("float"))
  }

  /** Scalar twin of [[modisQaConf]] — identical gates and arithmetic
    * (double divide, cast to float), used by the fused payload kernels
    * ([[PayloadKernels]]) where the per-element call JIT-inlines. */
  def modisQaConfScalar(qa: Int): Float = {
    val q = qa & 0xffff
    val gated = (q & 0x3) == 3 || ((q >> 6) & 0x3) == 3 ||
      ((q >> 8) & 0x1) == 1 || ((q >> 10) & 0x1) == 1 ||
      ((q >> 11) & 0x7) != 1 || ((q >> 14) & 0x1) == 1 ||
      ((q >> 15) & 0x1) == 1
    if (gated) 0.0f
    else (1.0 - ((q >> 2) & 0xf).toDouble / 12.0).toFloat
  }

  /** Landsat 8 BQA 16-bit word → binary confidence {0, 1} (float32).
    *
    * Gates to 0: designated fill (bit 0), dropped frame (1), terrain
    * occlusion (2), water conf == 3 (4-5), snow conf == 3 (10-11),
    * cirrus conf == 3 (12-13), cloud conf == 3 (14-15). Vegetation
    * confidence (8-9) ignored, as in the reference.
    */
  def landsat8QaConf(qa: Column): Column = {
    val q = qa.cast("int").bitwiseAND(lit(0xffff))
    val gated =
      q.bitwiseAND(lit(0x1)) === 1 ||
        shiftright(q, 1).bitwiseAND(lit(0x1)) === 1 ||
        shiftright(q, 2).bitwiseAND(lit(0x1)) === 1 ||
        shiftright(q, 4).bitwiseAND(lit(0x3)) === 3 ||
        shiftright(q, 10).bitwiseAND(lit(0x3)) === 3 ||
        shiftright(q, 12).bitwiseAND(lit(0x3)) === 3 ||
        shiftright(q, 14).bitwiseAND(lit(0x3)) === 3
    when(gated, lit(0.0f)).otherwise(lit(1.0f))
  }

  /** The same MODIS decode as a DuckDB SQL expression over a column named
    * `qa` — used to oracle-check the Spark chain on arbitrary int input.
    */
  val modisQaConfDuckSql: String =
    """CASE WHEN (qa & 3) = 3 OR ((qa >> 6) & 3) = 3 OR ((qa >> 8) & 1) = 1
      |  OR ((qa >> 10) & 1) = 1 OR ((qa >> 11) & 7) <> 1
      |  OR ((qa >> 14) & 1) = 1 OR ((qa >> 15) & 1) = 1
      |THEN CAST(0.0 AS FLOAT)
      |ELSE CAST(1.0 - ((qa >> 2) & 15) / 12.0 AS FLOAT) END""".stripMargin
      .replace("\n", " ")
}

/** GLCF land-cover class decoding (reference: F7 —
  * rastercube/datasources/glcf.py:9-58): class id → name / RGB as literal
  * map lookups (broadcast-free: the map is a plan literal).
  */
object GlcfClasses {
  val names: Map[Int, String] = Map(
    0 -> "Water", 1 -> "Evergreen needleleaf forest",
    2 -> "Evergreen broadleaf forest", 3 -> "Deciduous needleleaf forest",
    4 -> "Deciduous broadleaf forest", 5 -> "Mixed forest",
    6 -> "Closed shrublands", 7 -> "Open shrublands", 8 -> "Woody savannas",
    9 -> "Savannas", 10 -> "Grasslands", 11 -> "Permanent wetlands",
    12 -> "Croplands", 13 -> "Urban and built-up",
    14 -> "Cropland/Natural vegetation mosaic", 15 -> "Snow and ice",
    16 -> "Barren or sparsely vegetated", 254 -> "Unclassified",
    255 -> "Fill value")

  /** Class id → display RGB (reference CMAP, glcf.py:31-51). 254 and 255
    * share the magenta "not a class" color, as in the reference. */
  val colors: Map[Int, (Int, Int, Int)] = Map(
    0 -> (31, 120, 180), 1 -> (51, 160, 44), 2 -> (51, 121, 44),
    3 -> (178, 223, 138), 4 -> (178, 188, 138), 5 -> (90, 160, 44),
    6 -> (119, 160, 44), 7 -> (104, 160, 44), 8 -> (205, 191, 111),
    9 -> (202, 160, 44), 10 -> (51, 219, 44), 11 -> (166, 206, 227),
    12 -> (255, 127, 0), 13 -> (106, 106, 106), 14 -> (255, 77, 0),
    15 -> (36, 243, 253), 16 -> (220, 240, 0), 254 -> (255, 0, 255),
    255 -> (255, 0, 255))

  private def literalMap[V](m: Map[Int, V]): Column =
    map(m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  private val nameMapCol: Column = literalMap(names)
  private val rMapCol: Column = literalMap(colors.map { case (k, v) => k -> v._1 })
  private val gMapCol: Column = literalMap(colors.map { case (k, v) => k -> v._2 })
  private val bMapCol: Column = literalMap(colors.map { case (k, v) => k -> v._3 })

  def className(classId: Column): Column =
    element_at(nameMapCol, classId.cast("int"))

  def classR(classId: Column): Column = element_at(rMapCol, classId.cast("int"))
  def classG(classId: Column): Column = element_at(gMapCol, classId.cast("int"))
  def classB(classId: Column): Column = element_at(bMapCol, classId.cast("int"))

  /** Packed 0xRRGGBB int — the vectorized recolor (glcf_to_rgb,
    * glcf.py:54-58) as one codegen'd literal-map lookup per pixel;
    * unknown ids → NULL, like the name lookup. */
  def classRgb(classId: Column): Column =
    (classR(classId) * lit(65536) + classG(classId) * lit(256) +
      classB(classId)).cast("int")
}
