package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the merge layer the
  * reference's warehouse load implies but never implements: its daily
  * `COPY INTO` is append-only (snowflake_load.py:168-208), so
  * re-extracted rows accumulate as duplicates and history is whatever
  * order the files landed in. These operators give the two standard
  * dimension-maintenance semantics as explicit, scale-safe plans.
  *
  * Neither operator needs a transactional table format: both are pure
  * DataFrame transforms whose output overwrites (or is written alongside)
  * the dimension — the classic hand-rolled MERGE for plain-parquet
  * warehouses.
  */
object Scd {

  /** SCD type 1 upsert: `updates` rows replace current rows with the same
    * key, unmatched current rows pass through, new keys append. Both
    * inputs must share a schema (by name).
    *
    * Plan shape: one left-anti join of current against the update keys
    * (broadcast when the daily batch is small — the common case at
    * 100 TB: AQE sees the tiny key projection, not the full batch) plus a
    * by-name union. The big current side is never shuffled when the anti
    * join broadcasts; nothing is ever collected.
    *
    * `updates` must be unique per key (a batch carrying two versions of
    * one key would keep both — pre-aggregate to last-writer-wins first if
    * the source can emit multiple versions per batch). */
  def upsertByKey(current: DataFrame, updates: DataFrame,
                  keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "upsertByKey: at least one key column")
    val survivors = current.join(
      updates.select(keyCols.map(col): _*), keyCols, "left_anti")
    updates.unionByName(survivors)
  }

  /** SCD type 2 history build from a snapshot/event stream: for each
    * entity (`keyCols`), order observations by (`timeCol`, `tieCols`) and
    * emit one row per RUN of identical tracked attributes (`attrCols`) —
    * `effective_from` = first observation time of the run,
    * `effective_to` = start of the next run (exclusive; null on the open
    * run), `is_current` = the run is the entity's latest.
    *
    * Attribute comparison is null-safe (`<=>`): a null attribute value is
    * a distinct tracked state, not a wildcard. `tieCols` must make the
    * per-entity order total — ties in `timeCol` alone would make run
    * boundaries (and thus the result) engine-dependent.
    *
    * Plan shape: two window passes over the SAME (keyCols) partitioning —
    * Catalyst plans one exchange and sorts once; per-entity state is a
    * single lag/lead row, so a hot entity costs one task-local sort,
    * never a cross-partition structure. */
  def scd2FromSnapshots(df: DataFrame, keyCols: Seq[String], timeCol: String,
                        tieCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2FromSnapshots: key and attribute columns required")
    val order = (timeCol +: tieCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val runs = df
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumn("effective_from", col(timeCol))
    // lead over the run starts only — same partitioning, the run order is
    // inherited from (timeCol, tieCols)
    val wRuns = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    runs
      .withColumn("effective_to", lead(col("effective_from"), 1).over(wRuns))
      .withColumn("is_current", col("effective_to").isNull)
      .select((keyCols ++ attrCols ++
        Seq("effective_from", "effective_to", "is_current")).map(col): _*)
  }
}
