package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence event analytics: funnel cascades and transition
  * matrices over an event log. Same event-log surface the reference's
  * time-series notebooks work over (doc/notebooks/load_ndvi_qa.ipynb
  * cell 7 walks per-pixel ordered series; here the ordered series is
  * per-user), re-expressed as single-shuffle DataFrame plans.
  *
  * Scale stance (100 TB): both operators shuffle ONCE on the entity key
  * (user) and never sort globally. Funnel state per user is the sorted
  * timestamp array of each step's events — bounded by one entity's
  * activity, the same per-group boundedness every sessionizer assumes.
  * Transitions use a user-partitioned window (lead), so partitions are
  * entity-sized, not corpus-sized.
  */
object EventAnalytics {

  /** Per-entity strict-order funnel: for each user, `t0` = earliest
    * `steps(0)` event; `tk` = earliest `steps(k)` event STRICTLY after
    * `t(k-1)`. Returns one row per entity that reached step 0, with one
    * nullable epoch-millis column `t_<k>` per step — null = never
    * reached. One groupBy on `user`; each step's candidate times are
    * collected per user and the cascade is pure array arithmetic
    * (no re-shuffle, no self-join per step).
    */
  def funnelSteps(ev: DataFrame, user: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: need at least one step")
    val tsMs = unix_millis(col(tsCol))
    // one shuffle: per user, the ts array of each step's events (order
    // irrelevant — the cascade below only takes filtered minima)
    val perStepAggs = steps.zipWithIndex.map { case (st, i) =>
      collect_list(when(col(typeCol) === st, tsMs)).as(s"ts_$i")
    }
    val collected = ev.groupBy(col(user))
      .agg(perStepAggs.head, perStepAggs.tail: _*)
    // cascade: t_0 = min ts_0; t_k = min ts_k after t_(k-1).
    // filter's lambda yields NULL when t_(k-1) is null, which drops the
    // element, so an unreached step nulls every later step for free;
    // array_min of the emptied array is null (no ANSI element_at traps).
    val t0 = array_min(col("ts_0")).as("t_0")
    val cascade = steps.indices.tail.foldLeft(collected.withColumn("t_0", t0)) {
      case (df, k) =>
        df.withColumn(s"t_$k",
          array_min(filter(col(s"ts_$k"), x => x > col(s"t_${k - 1}"))))
    }
    cascade.filter(col("t_0").isNotNull)
      .select(col(user) +: steps.indices.map(k => col(s"t_$k")): _*)
  }

  /** Funnel summary: (step_idx, step, n_users) — how many entities
    * reached each step in strict order. Single row per step via one
    * global count aggregate over [[funnelSteps]] (driver sees nothing;
    * the 1-row aggregate explodes to |steps| rows in-plan). */
  def funnelCounts(ev: DataFrame, user: String, typeCol: String,
                   tsCol: String, steps: Seq[String]): DataFrame = {
    val times = funnelSteps(ev, user, typeCol, tsCol, steps)
    val counts = times.agg(
      count(col("t_0")).as("n_0"),
      steps.indices.tail.map(k => count(col(s"t_$k")).as(s"n_$k")): _*)
    val rows = steps.zipWithIndex.map { case (st, k) =>
      struct(lit(k).as("step_idx"), lit(st).as("step"),
        col(s"n_$k").as("n_users"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** (from_type, to_type, n) transition counts: each event paired with
    * the SAME user's next event in (ts, tieBreak) order — the Markov
    * transition matrix of the event log. User-partitioned window; ties
    * broken deterministically so engines agree. */
  def transitionCounts(ev: DataFrame, user: String, typeCol: String,
                       tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(user))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    // project BEFORE the window: only the four referenced columns ride
    // the shuffle and per-user sort — payload columns (props, values)
    // through a window sort were a measured 2x cpu tax at 10x scale
    ev.select(col(user), col(typeCol), col(tsCol), col(tieBreak))
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** A/B experiment readout: per-variant exposed-user counts,
    * converted-user counts and rates, absolute lift, and the
    * two-proportion z statistic — the standard pooled-variance test
    *
    *   z = (p_a − p_b) / sqrt(p̄(1−p̄)(1/n_a + 1/n_b)),  p̄ pooled
    *
    * over an event stream. `variantCol` must be constant per user
    * (hash/modulo assignment — the [[Sampling.assignSplit]] shape);
    * a user converts when ANY of their events satisfies `goal`.
    * Two-variant readout: rows whose variant value is not 0 or 1 are
    * EXCLUDED (an explicit filter below) — a 3-arm experiment passed in
    * by mistake reads out arms 0 and 1 only; run per-pair if you have
    * more arms.
    *
    * Determinism: counts are exact longs; the z chain is fixed-order
    * IEEE arithmetic (divisions, one multiply chain, one sqrt — sqrt
    * is correctly rounded by IEEE 754, so it is engine-portable, the
    * one libm-style function that is). z is NULL when either side has
    * no exposed users or the pooled rate is degenerate (0 or 1 —
    * zero variance).
    *
    * Scale shape: one (user, variant) partial agg over the events
    * (map-side combined; conversion is a max of a codegen predicate),
    * then a single 1-row global agg — nothing else moves. */
  def experimentLift(ev: DataFrame, variantCol: String, userCol: String,
                     goal: Column): DataFrame = {
    val users = ev
      .select(col(userCol).as("u"), col(variantCol).cast("int").as("v"),
        when(goal, 1L).otherwise(0L).as("g"))
      .filter(col("v").isin(0, 1)) // two-arm contract (see doc above)
      .groupBy(col("u"), col("v")).agg(max(col("g")).as("conv"))
    val agg = users.agg(
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("v") === 0, col("conv")).otherwise(0L)).as("c_a"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("v") === 1, col("conv")).otherwise(0L)).as("c_b"))
    val bothExposed = col("n_a") > 0 && col("n_b") > 0
    val pA = col("c_a").cast("double") / col("n_a")
    val pB = col("c_b").cast("double") / col("n_b")
    val pool = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b"))
    agg.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      when(col("n_a") > 0, pA).as("rate_a"),
      when(col("n_b") > 0, pB).as("rate_b"),
      when(bothExposed, pA - pB).as("lift"),
      when(bothExposed && pool > 0.0 && pool < 1.0,
        (pA - pB) / sqrt(pool * (lit(1.0) - pool) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
        .as("z"))
  }
}
