package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A2/A3/A4: the reference's data-quality layer as first-class operators.
  *
  * The reference's only executable tests are declarative dbt `unique` /
  * `not_null` checks on key columns (reference:
  * dbt/coretelecom/models/facts/schema.yml:9-15,46-54,83-91;
  * dimensions/schema.yml:5-9,26-30), plus run metrics
  * (airflow/dags/plugins/utilities.py:25-67 `OperationMetadata`).
  *
  * Each check returns a *violations DataFrame* (empty = pass) rather than
  * a boolean, so results compose into reports and stay distributed — no
  * driver-side collect of the data itself.
  */
object Quality {

  /** A2: `unique` test — keys appearing more than once, with their counts.
    * NULL keys are excluded (dbt's `unique` test filters `where column
    * is not null` before grouping — two null-keyed rows are not
    * duplicates of each other; `not_null` is the separate test for
    * them). A single hash aggregate: partial (map-side) + final, one
    * shuffle on the key. */
  def uniqueViolations(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)

  /** A3: `not_null` test — rows where the key is null. The IsNull filter
    * is pushed into the Parquet scan. */
  def notNullViolations(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNull)

  def isUnique(df: DataFrame, key: String): Boolean =
    uniqueViolations(df, key).head(1).isEmpty

  def isNotNull(df: DataFrame, key: String): Boolean =
    notNullViolations(df, key).head(1).isEmpty

  /** A4: run-metrics accumulation (reference: utilities.py:25-67 —
    * processed/success/failed/skipped counters + duration). */
  final case class OperationMetadata(
      operation: String,
      processed: Long, succeeded: Long, failed: Long, skipped: Long,
      durationSeconds: Double)

  /** Time a stage and produce its report; counters supplied by the stage
    * body via the returned builder. */
  final class MetricsBuilder(operation: String) {
    private val t0 = System.nanoTime()
    var processed, succeeded, failed, skipped = 0L
    def complete(): OperationMetadata =
      OperationMetadata(operation, processed, succeeded, failed, skipped,
        (System.nanoTime() - t0) / 1e9)
  }

  def timed(operation: String): MetricsBuilder = new MetricsBuilder(operation)

  /** Distributed counters for executor-side accounting (the Spark analog
    * of the reference's in-process counters). */
  def accumulators(spark: SparkSession, names: String*): Map[String, org.apache.spark.util.LongAccumulator] =
    names.map(n => n -> spark.sparkContext.longAccumulator(n)).toMap
}
