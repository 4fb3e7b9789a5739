package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Truth-table tests for the QA decoders against hand-derived expected
  * values from the bitfield spec (datasources/modis.py:117-202,
  * landsat8_qa.pyx:23-84).
  */
class QaDecodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val LAND = 1 << 11 // land/water bits 11-13 == 1 (land)

  // (qa word, expected confidence)
  val modisCases: Seq[(Int, Float)] = Seq(
    0 -> 0.0f,                        // land=0 (shallow ocean) gates
    LAND -> 1.0f,                     // clean land pixel, usefulness 0
    (LAND | 1) -> 1.0f,               // MODLAND 01 = check QA, still ok
    (LAND | 3) -> 0.0f,               // MODLAND 11 = not produced
    (LAND | (1 << 2)) -> (1.0 - 1 / 12.0).toFloat,  // usefulness 1
    (LAND | (4 << 2)) -> (1.0 - 4 / 12.0).toFloat,  // usefulness 4
    (LAND | (12 << 2)) -> 0.0f,                     // usefulness 12 -> 1-1=0
    (LAND | (15 << 2)) -> -0.25f,     // usefulness 15: negative, unclamped
    (LAND | (3 << 6)) -> 0.0f,        // aerosol high
    (LAND | (2 << 6)) -> 1.0f,        // aerosol average ok
    (LAND | (1 << 8)) -> 0.0f,        // adjacent cloud
    (LAND | (1 << 9)) -> 1.0f,        // atm BRDF corr ignored
    (LAND | (1 << 10)) -> 0.0f,       // mixed cloud
    (2 << 11) -> 0.0f,                // coastline
    (7 << 11) -> 0.0f,                // deep ocean
    (LAND | (1 << 14)) -> 0.0f,       // snow/ice
    (LAND | (1 << 15)) -> 0.0f,       // shadow
    0xffff -> 0.0f                    // nodata word: everything gates
  )

  val landsatCases: Seq[(Int, Float)] = Seq(
    0 -> 1.0f,
    1 -> 0.0f,                        // designated fill
    (1 << 1) -> 0.0f,                 // dropped frame
    (1 << 2) -> 0.0f,                 // terrain occlusion
    (1 << 3) -> 1.0f,                 // reserved bit ignored
    (3 << 4) -> 0.0f,                 // water conf 3
    (2 << 4) -> 1.0f,
    (3 << 8) -> 1.0f,                 // vegetation conf ignored
    (3 << 10) -> 0.0f,                // snow conf 3
    (3 << 12) -> 0.0f,                // cirrus conf 3
    (3 << 14) -> 0.0f,                // cloud conf 3
    (1 << 14) -> 1.0f
  )

  test("MODIS QA truth table") {
    import spark.implicits._
    val df = modisCases.map(_._1).toDF("qa")
      .withColumn("conf", QaDecode.modisQaConf(col("qa")))
    val got = df.collect().map(r => r.getInt(0) -> r.getFloat(1)).toMap
    modisCases.foreach { case (qa, exp) =>
      assert(got(qa) == exp, f"qa=$qa%16s (0x$qa%04x): got ${got(qa)}, want $exp")
    }
  }

  test("Landsat8 QA truth table") {
    import spark.implicits._
    val df = landsatCases.map(_._1).toDF("qa")
      .withColumn("conf", QaDecode.landsat8QaConf(col("qa")))
    val got = df.collect().map(r => r.getInt(0) -> r.getFloat(1)).toMap
    landsatCases.foreach { case (qa, exp) =>
      assert(got(qa) == exp, f"qa=0x$qa%04x: got ${got(qa)}, want $exp")
    }
  }

  test("GLCF class name lookup") {
    import spark.implicits._
    val df = Seq(0, 12, 255, 99).toDF("cls")
      .withColumn("name", GlcfClasses.className(col("cls")))
    val got = df.collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(got(0).contains("Water"))
    assert(got(12).contains("Croplands"))
    assert(got(255).contains("Fill value"))
    assert(got(99).isEmpty) // unknown class -> NULL
  }
}
