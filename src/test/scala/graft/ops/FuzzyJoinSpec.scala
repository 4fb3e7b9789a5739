package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Deletion-neighborhood fuzzy join: differential against the brute-
  * force theta join (the semantics), recall completeness for every edit
  * type, and depth-2 coverage.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(a: Seq[(Long, String)], b: Seq[(Long, String)],
                    d: Int): Set[(Long, Long, Int)] = {
    def lev(s: String, t: String): Int = {
      val dp = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to s.length; j <- 1 to t.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      dp(s.length)(t.length)
    }
    (for {
      (ai, as) <- a; (bi, bs) <- b
      dist = lev(as, bs) if dist <= d
    } yield (ai, bi, dist)).toSet
  }

  private def run(a: Seq[(Long, String)], b: Seq[(Long, String)],
                  d: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.joinWithinEditDistance(
      a.toDF("id", "s"), "id", "s", b.toDF("id", "s"), "id", "s", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("every edit type within distance 1 is found (blocking loses nothing)") {
    val a = Seq((1L, "kitten"), (2L, "table"), (3L, "x"), (4L, ""))
    val b = Seq(
      (10L, "kitten"),   // exact
      (11L, "kitte"),    // deletion
      (12L, "kittens"),  // insertion
      (13L, "mitten"),   // substitution
      (14L, "tble"),     // deletion in the middle
      (15L, "y"),        // substitution of a 1-char string
      (16L, ""),         // empty vs empty
      (17L, "zzz"))      // no match
    assert(run(a, b, 1) == brute(a, b, 1))
  }

  test("distance 2 neighborhoods cover double edits") {
    val a = Seq((1L, "saturday"), (2L, "alpha"))
    val b = Seq((10L, "sunday"),   // classic: distance 3 -> NOT matched
      (11L, "saturn"),             // <- check by brute force
      (12L, "satudy"),             // two deletions
      (13L, "alpra"), (14L, "alp"))
    assert(run(a, b, 2) == brute(a, b, 2))
  }

  test("random-ish corpus differential, both depths") {
    val words = Seq("spark", "spork", "sprk", "stark", "shark", "sharks",
      "park", "parka", "quark", "quirk", "spar", "scar", "scarf", "star")
    val a = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val b = words.zipWithIndex.map { case (w, i) => (100L + i, w.reverse) } ++ a
    assert(run(a, b, 1) == brute(a, b, 1))
    assert(run(a, b, 2) == brute(a, b, 2))
  }

  test("self-join keeps identity pairs; caller can filter") {
    val a = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz"))
    val got = run(a, a, 1)
    assert(got.contains((1L, 1L, 0)) && got.contains((1L, 2L, 1)))
    assert(!got.exists { case (x, y, _) => (x, y) == ((1L, 3L)) })
  }
}
