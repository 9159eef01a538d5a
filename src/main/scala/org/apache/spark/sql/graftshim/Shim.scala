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

  /** CAP the plan STATISTICS a checkpoint carries across the lineage
    * cut. Spark's `Dataset.checkpoint`/`localCheckpoint` truncate the
    * logical plan to a `LogicalRDD` but preserve the ORIGINAL plan's
    * estimated statistics on it (`originStats`) so the optimizer keeps
    * size information. Inside an ITERATIVE self-join fixpoint that
    * preservation is catastrophic: `SizeInBytesOnlyStatsPlanVisitor`
    * estimates a join as the PRODUCT of its children's sizeInBytes, so
    * each round's carried-over estimate is a power of the previous
    * round's — the BigInt's digit count doubles (or worse) every
    * self-join and by round ~15-25 the planner sits in
    * million-digit `BigInteger.multiply` (Toom-Cook) for minutes per
    * `.stats` walk, on ANY input size (observed: the 200-node
    * DedupClusterSpec graphs hung the suite; the magnitude grows in
    * ROUNDS, not rows).
    *
    * Capping (rather than dropping) keeps the useful half: estimates
    * that are still REAL — small early-round relations — pass through
    * untouched, so the planner's auto-broadcast decisions inside the
    * fixpoint are preserved; only the astronomically-wrong tail is
    * clamped to `cap`. Boundedness is inductive: every checkpointed
    * leaf is ≤ cap, a round's plan has O(1) leaves, so the next
    * pre-checkpoint product is ≤ cap^O(1) — a few hundred digits,
    * cheap — and is clamped again at the next cut. */
  def capCarriedStats(df: org.apache.spark.sql.DataFrame,
                      cap: BigInt = BigInt(Long.MaxValue)): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    df.queryExecution.logical match {
      case lr: LogicalRDD if lr.stats.sizeInBytes > cap =>
        ofRows(df.sparkSession, new LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          lr.stream)(
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          Some(Statistics(sizeInBytes = cap)), None))
      case _ => df
    }
  }

  /** Unset a previously configured checkpoint dir (`sc.checkpointDir`
    * is `private[spark]` with a set-only public face) — lets a test
    * exercise the reliable-checkpoint branch of Fixpoint.cut and then
    * restore the shared session's local-checkpoint default. */
  def clearCheckpointDir(sc: org.apache.spark.SparkContext): Unit =
    sc.checkpointDir = None

  /** Block until every event already posted to the shared listener bus
    * has been delivered (`listenerBus.waitUntilEmpty` is
    * `private[spark]`). Deterministic alternative to sleep-loop
    * quiescence heuristics for post-run report reads. */
  def flushListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
