package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column<->Expression converters (Spark 4
  * removed the public `new Column(expr)` constructor; extension
  * libraries reach the classic converters from within the sql package —
  * the same access pattern Spark's own connectors use).
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Full ColumnNode -> catalyst Expression conversion via the active
    * session's converter (ExpressionUtils.expression alone wraps lazily
    * and cannot be codegen'd when embedded in a function builder). */
  def expression(c: Column): Expression =
    SparkSession.active.asInstanceOf[classic.SparkSession].expression(c)

  /** DataFrame from a LogicalPlan (for rule tests). */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Rebase a DataFrame onto its physical RDD (a LogicalRDD scan) —
    * truncates the logical plan so iterative algorithms (label
    * propagation) keep O(1) plan size per round. Without this the plan
    * triples every iteration (each round references the previous labels
    * three times), and analyzer + cache-lookup time compounds: measured
    * 1.9s -> 8.6s between rounds 1 and 2 of clusterDuplicates on an
    * 81-edge graph. Lazy — nothing computes here; the caller's
    * persist + action materializes the RDD (internal rows, no Row
    * conversion).
    */
  def truncateLineage(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        ds.queryExecution.toRdd, ds, isStreaming = false))
  }
}
