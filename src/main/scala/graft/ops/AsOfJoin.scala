package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join (each left row matched to the latest right row
  * with rightTs <= leftTs, per key) — an operator Spark lacks natively
  * (§2.11 gap; DuckDB/kdb/Pandas have it).
  *
  * Implementation: the union trick — tag both sides, union on (key, ts),
  * and carry the last-seen right payload forward with a window
  * last_value(ignoreNulls) ordered by (ts, side). One shuffle on the key
  * (same as any windowed op), no range explosion, skew-safe under AQE —
  * this beats a theta-join (ts <= ts) by a full complexity class at
  * scale.
  */
object AsOfJoin {

  /** @param left       left rows
    * @param right      right rows
    * @param key        equi-key column name present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightCols  right payload columns to attach (null if no match)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The whole right payload travels as ONE struct so a single
    // last(ignoreNulls) picks the matched row atomically — per-column
    // carry would backfill a NULL payload column from an older right row
    // (diverging from ASOF semantics, which attach the matched row's
    // NULLs as-is). struct(null, ..) is non-null, so an all-NULL payload
    // row still matches and attaches its NULLs.
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    // side 0 = right (sorts before left on ties: as-of is inclusive)
    val r = right.select(
      (col(key).as("__key") +: col(rightTs).cast("timestamp").as("__ts")
        +: lit(0).as("__side")
        +: struct(rightCols.map(col): _*).as("__r")
        +: leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val l = left.select(
      (col(key).as("__key") +: col(leftTs).cast("timestamp").as("__ts")
        +: lit(1).as("__side")
        +: lit(null).cast(payloadType).as("__r")
        +: leftCols.map(col): _*))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(c => col("__r")(c).as(s"asof_$c"))): _*)
  }

  /** Forward as-of join: each left row matched to the EARLIEST right row
    * with rightTs >= leftTs, per key (inclusive). Same union+window
    * shape as [[backward]], scanned in descending time order — the
    * carried payload is the nearest future right row. One shuffle, no
    * range explosion.
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    // side 0 = right; in DESC order it sorts before an equal-ts left
    // row, so ties match (forward as-of is inclusive)
    val r = right.select(
      (col(key).as("__key") +: col(rightTs).cast("timestamp").as("__ts")
        +: lit(0).as("__side")
        +: struct(rightCols.map(col): _*).as("__r")
        +: leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val l = left.select(
      (col(key).as("__key") +: col(leftTs).cast("timestamp").as("__ts")
        +: lit(1).as("__side")
        +: lit(null).cast(payloadType).as("__r")
        +: leftCols.map(col): _*))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(c => col("__r")(c).as(s"asof_$c"))): _*)
  }
}
