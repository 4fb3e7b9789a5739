package graft

import org.scalatest.funsuite.AnyFunSuite

/** Analysis smoke over the ENTIRE declared query surface against the real
  * driver fixtures — every `SparkEntry.queries` entry must at least pass
  * Catalyst analysis on `/root/testdata/sf0.001`.
  *
  * Exists because unit specs run on synthetic DataFrames with clean
  * schemas: when the driver's events.parquet fixture changed its `ts`
  * encoding to TIMESTAMP_NTZ, five declared queries started throwing
  * `AnalysisException` at the entry point while all 169 unit tests stayed
  * green, and Verify's catch-and-continue hid the breakage for two full
  * rounds. Forcing `queryExecution.analyzed` per entry catches any
  * fixture-schema drift the day it happens.
  *
  * One test per query (registered dynamically) so a failure names the
  * broken entry directly in the test report.
  */
class QuerySurfaceSmokeSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private val fixturesPresent = new java.io.File(sfDir).isDirectory

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query '$name' analyzes against $sfDir") {
      assume(fixturesPresent, s"driver fixtures missing at $sfDir")
      val spark = TestSpark.spark
      // analysis resolves every column reference and type-checks every
      // expression; it does NOT execute the plan, so the full 90+ entry
      // surface stays cheap enough for the default suite
      val df = fn(spark, sfDir)
      assert(df.queryExecution.analyzed != null)
      assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
      graft.ops.CacheRegistry.releaseAll()
    }
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }
}
