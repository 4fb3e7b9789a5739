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

  /** Entries whose condition-less join is a DELIBERATE bounded cross
    * join (a broadcast brute-force pass over a few query vectors, or a
    * tiny-literal expansion) — every other entry must keep all joins
    * keyed, or it is a cartesian product at corpus scale. */
  private val crossJoinAllowed = Set(
    "ann_brute_topk",   // broadcast brute-force baseline: 8 query vecs x corpus
    "ann_int8_topk",    // same shape over the dequantized corpus
    "lm_quality",       // broadcast of a ONE-ROW vocab-size aggregate
    "lm_backoff_score", // broadcast of the ONE-ROW (N, V) model meta table
    "lm_score_filter",  // same one-row meta broadcast inside the gate
    "pmi_collocations", // broadcast of the ONE-ROW token-total aggregate
    "st2_gap_fill"      // expected days x event-types grid (ST2 synthesis):
                        // both sides are small distinct dimension sets
  )

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
      // scale audit on the same frame: no condition-less join may appear
      // in the optimized plan unless declared above — a join Catalyst
      // cannot key is all-pairs row multiplication at 100 TB
      if (!crossJoinAllowed(name)) {
        val crosses = df.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join
              if j.condition.isEmpty => j
        }
        assert(crosses.isEmpty,
          s"$name has a condition-less join (cartesian at scale): " +
            crosses.map(_.joinType).mkString(", "))
      }
      graft.ops.CacheRegistry.releaseAll()
    }
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }
}
