package graft

import org.scalatest.funsuite.AnyFunSuite

/** The vsbest defense reads the COMMITTED bench_report.json at run
  * start — if the parse silently returned empty on a format drift, the
  * flag would vanish and hot readings could pass as steady-state
  * again. Pin both record layouts (the single-line writer output and
  * the pretty-printed min-merged record) and the edge cases. */
class BenchBestKnownSpec extends AnyFunSuite {

  test("single-line record: flat queries map parses; -1 sentinels drop") {
    val txt = """{"metric":"total","value":9.9,"unit":"sec","queries":{"a":1.5,"b":0.25,"bad":-1},"cpu_sec":{"a":0.5},"noise_flags":{}}"""
    assert(Bench.parseBestKnown(txt) == Map("a" -> 1.5, "b" -> 0.25))
  }

  test("pretty-printed record (the committed min-merged layout) parses " +
    "and stops at the queries object") {
    val txt =
      """{
        | "metric": "total",
        | "value": 117.6,
        | "queries": {
        |  "ann_brute_topk": 0.196381262,
        |  "w2_running_sum": 2.5e-1
        | },
        | "cpu_sec": {
        |  "ann_brute_topk": 99.0
        | }
        |}""".stripMargin
    val m = Bench.parseBestKnown(txt)
    assert(m == Map("ann_brute_topk" -> 0.196381262,
      "w2_running_sum" -> 0.25))
    // cpu_sec values must NOT leak into the wall baseline
    assert(m("ann_brute_topk") < 1.0)
  }

  test("missing or malformed input yields empty, never throws") {
    assert(Bench.parseBestKnown("").isEmpty)
    assert(Bench.parseBestKnown("{\"value\": 1}").isEmpty)
    assert(Bench.parseBestKnown("not json at all").isEmpty)
  }

  test("the ACTUAL committed record parses to the full entry set") {
    val p = java.nio.file.Paths.get("bench_report.json")
    assume(java.nio.file.Files.exists(p))
    val m = Bench.parseBestKnown(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    assert(m.size > 100, s"committed record parsed to only ${m.size}")
    assert(m.values.forall(_ > 0))
  }
}
