package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** C3: run-report hook — the engine-side analog of the reference's
  * success/failure notification callbacks (reference:
  * airflow/dags/pipeline.py:20-43, 240-264 `notify_on_failure` /
  * `notify_on_success` email hooks). Mail/Slack delivery is orchestrator
  * scope; what the ENGINE owes the orchestrator is a faithful per-action
  * run report — which actions ran, how long, how many rows the root
  * operator produced, which failed and why — which this captures via a
  * `QueryExecutionListener` and feeds into the same
  * `Quality.OperationMetadata` shape the metrics layer already uses
  * (reference: airflow/dags/plugins/utilities.py:25-67).
  *
  * Listener callbacks are post-hoc and off the query's critical path, so
  * the hook adds zero overhead to the queries themselves.
  */
final class RunReport private[operators] (owner: SparkSession) {

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[Quality.OperationMetadata]()
  private val failures =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  private[operators] val listener: QueryExecutionListener = new QueryExecutionListener {
    private def rows(qe: QueryExecution): Long =
      qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(0L)

    // The listener manager is per-session, but filter defensively on the
    // attached session anyway: a run that wants isolation from other
    // pipelines sharing the SparkContext attaches to its own
    // spark.newSession() and runs its actions there — this guard is what
    // makes that contract hold even if a listener is shared.
    private def mine(qe: QueryExecution): Boolean = qe.sparkSession eq owner

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      if (mine(qe)) buf.add(Quality.OperationMetadata(funcName,
        processed = rows(qe), succeeded = 1L, failed = 0L, skipped = 0L,
        durationSeconds = durationNs / 1e9))

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      if (mine(qe)) {
        buf.add(Quality.OperationMetadata(funcName,
          processed = 0L, succeeded = 0L, failed = 1L, skipped = 0L,
          durationSeconds = 0.0))
        failures.add(funcName -> s"${exception.getClass.getName}: ${exception.getMessage}")
      }
  }

  /** Per-action metadata, in completion order. */
  def report: Seq[Quality.OperationMetadata] = {
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toSeq
  }

  /** (action, error) for every failed action. */
  def failed: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    failures.iterator().asScala.toSeq
  }

  /** Roll the per-action reports up into one run-level summary. */
  def summary(runName: String): Quality.OperationMetadata = {
    val r = report
    Quality.OperationMetadata(runName,
      processed = r.map(_.processed).sum,
      succeeded = r.map(_.succeeded).sum,
      failed = r.map(_.failed).sum,
      skipped = r.map(_.skipped).sum,
      durationSeconds = r.map(_.durationSeconds).sum)
  }

  /** Listener events post asynchronously; drain the shared listener bus
    * (deterministic — waits until every already-posted event is
    * delivered) before reading the report at a barrier. Returns false if
    * the bus did not drain within the timeout (report may be partial). */
  def awaitQuiescence(timeoutMs: Long = 5000): Boolean =
    org.apache.spark.sql.graftshim.Shim.flushListenerBus(
      owner.sparkContext, timeoutMs)

  def detach(spark: SparkSession): Unit =
    spark.listenerManager.unregister(listener)
}

object RunReport {
  /** Register a run-report hook on the session; detach when done.
    * For per-run isolation on a shared SparkContext, attach to (and run
    * the pipeline's actions on) a dedicated `spark.newSession()` — the
    * report only records actions executed on the attached session. */
  def attach(spark: SparkSession): RunReport = {
    val r = new RunReport(spark)
    spark.listenerManager.register(r.listener)
    r
  }
}
