package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-interval (range) join: pair each left row with every right
  * row sharing `key` whose timestamp falls in
  * `[leftTs - before, leftTs + after]` (both ends inclusive).
  *
  * Spark has no native range-join operator — the naive encoding
  * (`l.key = r.key AND r.ts BETWEEN ...`) planned over a non-equi
  * predicate degrades to a per-key cross product inside the hash join,
  * which at training-corpus scale (hot keys with millions of events)
  * is quadratic. This implementation bucketizes time into fixed bins of
  * width `before + after`: a left row's window overlaps AT MOST TWO
  * bins, so exploding left into its covering bins and equi-joining on
  * `(key, bin)` keeps the shuffle linear in input size and the per-task
  * work linear in true pair density. AQE still handles residual key
  * skew (the join is a plain equi-join after the rewrite).
  *
  * The same shape is what Databricks' range-join optimization and
  * Flink's interval join do under the hood; here it's a library
  * operator over vanilla DataFrames.
  */
object RangeJoin {

  /** @param left        left rows (each keeps all its columns)
    * @param right       right rows; non-key columns surface prefixed
    * @param key         equi-key column name present on both sides
    * @param leftTs      left timestamp column (castable to timestamp)
    * @param rightTs     right timestamp column
    * @param beforeMs    window extent before leftTs, milliseconds, >= 0
    * @param afterMs     window extent after leftTs, milliseconds, >= 0
    * @param rightPrefix prefix for attached right payload columns
    */
  def byTime(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String,
             beforeMs: Long, afterMs: Long,
             rightPrefix: String = "r_"): DataFrame = {
    require(beforeMs >= 0 && afterMs >= 0 && beforeMs + afterMs > 0,
      "window must be non-degenerate")
    val w = beforeMs + afterMs // bin width: left window covers <= 2 bins
    // integer floor-division bins (timestamps are non-negative epoch ms,
    // so `div` truncation == floor); exact, no double rounding at the
    // bin boundary
    val l = left
      .withColumn("__lts", unix_millis(col(leftTs).cast("timestamp")))
      .withColumn("__bin", explode(sequence(
        expr(s"(__lts - ${beforeMs}L) div ${w}L"),
        expr(s"(__lts + ${afterMs}L) div ${w}L"))))
    val r = right.select(
      (col(key).as("__rkey") +:
        unix_millis(col(rightTs).cast("timestamp")).as("__rts") +:
        right.columns.filter(_ != key).toSeq
          .map(c => col(c).as(rightPrefix + c))): _*)
      .withColumn("__rbin", expr(s"__rts div ${w}L"))
    l.join(r, l(key) === r("__rkey") && l("__bin") === r("__rbin"))
      .filter(col("__rts") >= col("__lts") - beforeMs &&
        col("__rts") <= col("__lts") + afterMs)
      .drop("__bin", "__rbin", "__rkey", "__lts", "__rts")
  }
}
