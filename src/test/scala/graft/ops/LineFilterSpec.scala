package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Each line rule isolated on a planted line, plus reassembly order
  * and the all-dropped NULL contract. */
class LineFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def clean(text: String): (Long, Long, Option[String]) = {
    import spark.implicits._
    val r = LineFilter.cleanLines(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getString(3)))
  }

  test("each rule drops its planted line; prose survives in order") {
    val (n, kept, out) = clean(Seq(
      "HOME | ABOUT | CONTACT US",            // uppercase-dominated
      "first good prose line with words",     // keep
      "short",                                // < 10 chars
      "12345 67890 24680 99",                 // digit fraction >= 0.4
      "wordone wordtwo",                      // < 3 words
      "second good prose line with words"     // keep
    ).mkString("\n"))
    assert(n === 6L && kept === 2L)
    assert(out.contains(
      "first good prose line with words\nsecond good prose line with words"))
  }

  test("document with no surviving lines reports NULL text") {
    val (n, kept, out) = clean("NAV | NAV | NAV\n123 456 789")
    assert(n === 2L && kept === 0L && out.isEmpty)
  }

  test("exactly-threshold lines are kept") {
    // 10 trimmed chars, 3 words, lower == upper, digits just under 0.4
    val line = "Ab cd efgh"  // len 10, 3 words, lower 7 >= upper 1
    val (_, kept, out) = clean(line)
    assert(kept === 1L && out.contains(line))
  }

  test("NULL-text documents stay in the output as empty results") {
    import spark.implicits._
    val df = Seq((1L, Some("good prose line with words here")),
      (2L, Option.empty[String])).toDF("doc_id", "text")
    val got = LineFilter.cleanLines(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(got.length === 2)
    val nullDoc = got(1)
    assert(nullDoc.getLong(1) === 0L && nullDoc.getLong(2) === 0L &&
      nullDoc.isNullAt(3))
  }

  test("separator is literal, not a regex") {
    import spark.implicits._
    val df = Seq((1L,
      "first decent prose chunk here|second decent prose chunk here"))
      .toDF("doc_id", "text")
    val r = LineFilter.cleanLines(df, "doc_id", "text", sep = "|")
      .collect().head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getString(3) ===
      "first decent prose chunk here|second decent prose chunk here")
  }
}
