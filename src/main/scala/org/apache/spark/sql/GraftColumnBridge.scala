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
}
