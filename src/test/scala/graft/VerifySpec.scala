package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The Verify failure path: a deliberately-broken query must surface as
  * a red artifact in _errors.json, not as a silent omission from the
  * output set — the regression class that hid five broken queries for
  * two rounds.
  */
class VerifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a throwing query lands in _errors.json; healthy queries still write") {
    val out = TestSpark.tmpDir("verify_errors")
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "ok_query" -> ((s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("n") }),
      "boom_query" -> ((s, _) =>
        s.read.parquet("/nonexistent/graft_verify_spec.parquet")))
    val errors = Verify.runAll(spark, "/unused", out, queries,
      Map("ok_query" -> "SELECT 1 AS n"))

    assert(errors.keySet == Set("boom_query"))
    // the healthy query's parquet exists and round-trips
    assert(spark.read.parquet(s"$out/ok_query").count() == 3)
    // the artifacts the driver reads exist; _errors.json names the failure
    val errJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("boom_query"))
    val oracleJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    assert(oracleJson.contains("ok_query"))
    // no output dir for the broken query (absence + error row, never a
    // half-written parquet)
    assert(!new java.io.File(s"$out/boom_query").exists() ||
      new java.io.File(s"$out/boom_query").listFiles().forall(
        f => !f.getName.endsWith(".parquet")))
  }

  test("an empty error map writes an empty _errors.json object") {
    val out = TestSpark.tmpDir("verify_clean")
    val errors = Verify.runAll(spark, "/unused", out,
      Map("ok" -> ((s, _) => { import s.implicits._; Seq(1).toDF("n") })),
      Map.empty)
    assert(errors.isEmpty)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/_errors.json")).trim == "{}")
  }
}
