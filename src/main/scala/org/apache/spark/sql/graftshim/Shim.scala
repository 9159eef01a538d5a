package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column<->Expression conversion (Spark 4 moved
  * Column onto ColumnNode; attaching a custom catalyst Expression needs
  * ExpressionUtils, which is sql-private). This is the minimal, standard
  * extension-point shim — no behavior, just visibility. */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a catalyst LogicalPlan back into a DataFrame
    * (`Dataset.ofRows` is `private[sql]`) — needed by custom logical
    * operators (plans/Recurrence) that have no Column-level API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until every event already posted to the shared listener bus
    * has been delivered (`listenerBus.waitUntilEmpty` is
    * `private[spark]`). Deterministic alternative to sleep-loop
    * quiescence heuristics for post-run report reads. */
  def flushListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
