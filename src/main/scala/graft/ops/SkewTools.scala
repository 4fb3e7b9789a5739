package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for heavy-hitter key distributions — the
  * 100 TB failure mode where one key's partition dominates a stage.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; these
  * cover the two shapes it does not: broadcast-isolating known heavy
  * hitters (so the tail keeps an unsalted shuffle), and two-phase
  * salted distinct aggregation (a single hot group's distinct-set
  * otherwise lands on one reducer).
  */
object SkewTools {

  /** Inner equi-join with heavy-hitter isolation: keys with at least
    * `hotThreshold` left rows (top `maxHotKeys`) join via BROADCAST of
    * the right side's hot subset; the long tail joins with a standard
    * shuffle that no longer carries the skew. The hot-key list is
    * collected to the driver — bounded by `maxHotKeys`, the same
    * contract as a broadcast threshold.
    */
  def joinSkewed(left: DataFrame, right: DataFrame, key: String,
                 hotThreshold: Long = 1000000L,
                 maxHotKeys: Int = 1000): DataFrame = {
    val hotKeys = left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      .orderBy(col("__n").desc).limit(maxHotKeys)
      .select(col(key)).collect().map(_.get(0))
    if (hotKeys.isEmpty) left.join(right, key)
    else {
      val isHot = col(key).isin(hotKeys.toSeq: _*)
      val hot = left.filter(isHot)
        .join(broadcast(right.filter(isHot)), key)
      val cold = left.filter(!isHot).join(right.filter(!isHot), key)
      hot.unionByName(cold)
    }
  }

  /** Two-phase salted COUNT(DISTINCT distinctCol) per group: phase 1
    * counts distincts within (group, salt) where salt = hash(distinct
    * value) mod `salts` — each value lands in exactly one salt bucket,
    * so per-bucket distinct counts SUM exactly. A hot group's distinct
    * set spreads over `salts` reducers instead of one.
    */
  def saltedCountDistinct(df: DataFrame, groupCol: String,
                          distinctCol: String,
                          salts: Int = 32): DataFrame = {
    df.select(col(groupCol), col(distinctCol))
      .withColumn("__salt", pmod(xxhash64(col(distinctCol)), lit(salts)))
      .groupBy(col(groupCol), col("__salt"))
      .agg(count_distinct(col(distinctCol)).as("__part"))
      .groupBy(col(groupCol))
      .agg(sum(col("__part")).as("n_distinct"))
  }
}
