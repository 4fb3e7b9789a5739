package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-bounded string join via DELETION-NEIGHBORHOOD blocking
  * (the FastSS / SymSpell family) — the data-cleaning join for
  * misspelled keys, OCR'd identifiers, and near-duplicate names that an
  * exact equi-join misses and a naive theta join (`levenshtein(a, b) <=
  * d` as the join predicate) turns into an all-pairs cross product.
  *
  * Property: two strings within Levenshtein distance d share at least
  * one member of their depth-d deletion neighborhoods (every edit —
  * substitution, insertion, deletion — is covered by deleting the
  * affected position(s) from whichever side carries them). So:
  * explode each side into its ≤ depth-d deletion variants, equi-join
  * on the variant, dedup candidate pairs, and CONFIRM with the exact
  * levenshtein (codegen built-in) — blocking loses nothing the verify
  * keeps.
  *
  * Scale shape: neighborhoods are L+1 strings per row at d=1 (O(L²) at
  * d=2), carrying (variant, id, key-string) only — payloads never
  * explode; the variant equi-join is linear in neighborhood volume,
  * never all-pairs across the inputs; block sizes are data-bounded
  * (strings sharing a variant are near-identical by construction).
  */
object FuzzyJoin {

  /** Depth-1 deletion variants of column `name` plus the string itself
    * (deleting from the empty string yields itself; array_union dedups). */
  private def deletions(name: String): Column =
    expr(s"transform(sequence(1, greatest(length($name), 1)), i -> " +
      s"concat(substring($name, 1, i - 1), " +
      s"substring($name, i + 1, 1000000)))")

  private def neighborhood(name: String, depth: Int): Column = {
    def delsOf(v: String, i: String): String =
      s"transform(sequence(1, greatest(length($v), 1)), $i -> " +
        s"concat(substring($v, 1, $i - 1), substring($v, $i + 1, 1000000)))"
    depth match {
      case 1 => array_union(array(col(name)), deletions(name))
      // nested SQL lambdas (a Scala-side HOF can't bind an expr() body
      // to its lambda variable, so depth 2 is one SQL expression)
      case 2 => expr("array_distinct(flatten(transform(" +
        s"array_union(array($name), ${delsOf(name, "i")}), " +
        s"s -> concat(array(s), ${delsOf("s", "j")}))))")
    }
  }

  /** All (a_id, b_id, dist) pairs with
    * levenshtein(a_str, b_str) <= maxDist (1 or 2). Ids must be unique
    * per side; pass the same frame twice for a self-join (pairs with
    * a_id == b_id are kept — callers filter if unwanted). */
  def joinWithinEditDistance(a: DataFrame, aId: String, aStr: String,
                             b: DataFrame, bId: String, bStr: String,
                             maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion-neighborhood blocking supports distance 1 or 2, got $maxDist")
    val av = a.select(col(aId).as("a_id"), col(aStr).as("a_str"))
      .withColumn("v", explode(neighborhood("a_str", maxDist)))
    val bv = b.select(col(bId).as("b_id"), col(bStr).as("b_str"))
      .withColumn("v", explode(neighborhood("b_str", maxDist)))
    av.join(bv, Seq("v"))
      .select(col("a_id"), col("a_str"), col("b_id"), col("b_str"))
      .distinct()
      .withColumn("dist", levenshtein(col("a_str"), col("b_str")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}
