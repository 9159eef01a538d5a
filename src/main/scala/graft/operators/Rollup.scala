package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the pattern that replaces "re-run
  * the rollup over all history every night" with "aggregate today's
  * batch, merge into yesterday's state". At 100 TB the difference is a
  * full-corpus scan versus a batch-sized one.
  *
  * A rollup state is (keys, n_rows, sum_v, min_v, max_v): every field is
  * MERGEABLE (sums add, mins min, maxes max, avg = sum/n at read time),
  * so states compose associatively — per-day states can merge into
  * weeks, weeks into months, in any order. Exact COUNT(DISTINCT) is
  * deliberately absent: it does not merge (use Events.approxDistinct's
  * HLL sketches when an approximate distinct is acceptable).
  *
  * reference: the reference re-COPYs the full day set and lets dbt
  * rebuild tables from scratch each run (snowflake_load.py:168-208,
  * dbt full-refresh); this operator is the incremental alternative.
  */
object Rollup {

  /** Aggregate a batch into a rollup state over `valueCol`. */
  def state(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(valueCol).as("sum_v"),
        min(valueCol).as("min_v"),
        max(valueCol).as("max_v"))

  /** Merge any number of states: one hash aggregate over the
    * (tiny, keys-sized) state relations — the batch data itself never
    * re-aggregates. */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    val keys = states.head.columns
      .filterNot(Set("n_rows", "sum_v", "min_v", "max_v"))
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Incremental view maintenance for an INNER equi-join: the delta of
    * A ⋈ B when both sides receive insert batches ΔA, ΔB is
    *   Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    * (old×old is already materialized; each new pair has its new row
    * on the left, the right, or both). The maintained view is
    * `materialized ∪ joinDelta(...)` — the full tables are NEVER
    * re-joined, which is the entire economics of a 100 TB materialized
    * join: per-refresh cost scales with the delta, not the table.
    *
    * The two big-side joins probe A and B with the (typically small,
    * broadcastable) deltas; AQE picks broadcast when the delta fits.
    * Insert-only by contract — deletions need a subtract channel
    * (tombstones), which is applyCdc's territory, not a view delta's. */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame,
                bOld: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta: at least one join key")
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
  }
}
