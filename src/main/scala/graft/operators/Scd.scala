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

  /** Apply a CDC change batch (inserts/updates/deletes) to a current
    * table — the full MERGE semantics a warehouse's `MERGE INTO` gives
    * and an append-only COPY (the reference's load) cannot:
    * per key, the batch's LAST operation by `seqCol` wins ("D" removes
    * the key, anything else upserts the row's payload), earlier
    * in-batch operations on the same key are superseded, keys the
    * batch never mentions pass through untouched.
    *
    * Plan shape: one window pass over the BATCH for last-writer-wins
    * (batches are bounded; the table never sorts), then a single
    * left-anti join of the current table against the batch's key
    * projection — one relation covers both deletes and updated keys,
    * so the big side is scanned once — and a by-name union of the
    * surviving rows with the upsert payloads. The key projection is
    * NOT broadcast-hinted: a typical CDC batch is small and AQE
    * broadcasts it from the runtime size, but a backfill-scale batch
    * (at 100 TB a replayed day can be huge) must degrade to a shuffle
    * anti-join instead of OOMing the driver on a forced broadcast. */
  def applyCdc(current: DataFrame, changes: DataFrame, keyCols: Seq[String],
               opCol: String, seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "applyCdc: at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val lastOp = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val survivors = current.join(
      lastOp.select(keyCols.map(col): _*), keyCols, "left_anti")
    val upserts = lastOp.filter(col(opCol) =!= "D")
      .drop(opCol, seqCol)
    survivors.unionByName(upserts)
  }

  /** Point-in-time join (the feature store's correctness primitive):
    * each fact row picks up the dimension attributes that were valid
    * AT ITS OWN timestamp from an SCD2 history —
    * effective_from ≤ t < effective_to (open run: effective_to NULL)
    * — never today's values (training-serving skew) and never a
    * future leak (the cardinal sin of feature backfills; an as-of join
    * against raw snapshots can still straddle a change, the history's
    * half-open intervals cannot).
    *
    * Plan shape: an equi-join on the entity key with the interval
    * predicate as the join residual — the history side holds one row
    * per attribute RUN (orders of magnitude smaller than snapshots),
    * so AQE broadcasts it in the common case; per-key run counts bound
    * the residual scan. Facts with no valid run at t keep NULL
    * attributes (left join) — "entity not yet born" is data, not an
    * error. */
  def pointInTimeJoin(facts: DataFrame, history: DataFrame,
                      keyCols: Seq[String], factTimeCol: String): DataFrame = {
    require(keyCols.nonEmpty, "pointInTimeJoin: at least one key column")
    val cond = keyCols.map(k => facts(k) === history(k)).reduce(_ && _) &&
      facts(factTimeCol) >= history("effective_from") &&
      (history("effective_to").isNull ||
        facts(factTimeCol) < history("effective_to"))
    keyCols.foldLeft(facts.join(history, cond, "left")) {
      (d, k) => d.drop(history(k))
    }
  }

  /** Inverse of applyCdc: DIFF two versions of a table into the CDC
    * batch that transforms the old into the new — the change-data-feed
    * generator for consumers that want deltas, not snapshots (the
    * round trip applyCdc(old, diffToCdc(old, new)) == new is pinned by
    * ScdSpec). Ops: key only in new → I (new payload), key only in
    * old → D (old payload, tombstone-style), key in both with any
    * attribute differing under null-safe compare → U (new payload);
    * identical rows emit NOTHING — the whole point of a diff.
    *
    * Both inputs must be unique per key (the SCD1 "current table"
    * contract). Plan shape: one full outer join on the key — each side
    * scanned once, shuffled once on the key (or broadcast when one
    * version is small); the op classification is a pure projection.
    * The output appends fixed `op` and `seq` columns (seq a constant 1)
    * so the batch slots straight into applyCdc — attribute columns may
    * not already use those names. */
  def diffToCdc(oldDf: DataFrame, newDf: DataFrame,
                keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diffToCdc: at least one key column")
    val attrs = oldDf.columns.filterNot(keyCols.contains)
    require(attrs.sameElements(newDf.columns.filterNot(keyCols.contains)),
      "diffToCdc: old and new must share a schema")
    require(!(attrs ++ keyCols).exists(c => c == "op" || c == "seq"),
      "diffToCdc: input columns 'op'/'seq' collide with the CDC output columns")
    val o = oldDf.select(keyCols.map(col) ++
      attrs.map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select(keyCols.map(col) ++
      attrs.map(c => col(c).as(s"__n_$c")): _*)
    // presence must be judged on a never-null marker, not the payload
    // (an all-null attribute row would read as "absent")
    val joined = o.withColumn("__in_old", lit(true))
      .join(n.withColumn("__in_new", lit(true)), keyCols, "full_outer")
    val changed = attrs
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("op",
        when(col("__in_old").isNull, "I")
          .when(col("__in_new").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select(keyCols.map(col) ++ attrs.map(c =>
        when(col("op") === "D", col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c)) ++
        Seq(col("op"), lit(1L).as("seq")): _*)
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
                        tieCols: Seq[String], attrCols: Seq[String],
                        carryCols: Seq[String] = Nil): DataFrame = {
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
      .select((keyCols ++ attrCols ++ carryCols ++
        Seq("effective_from", "effective_to", "is_current")).map(col): _*)
  }

  /** Incremental SCD2 merge: fold ONE new snapshot into an existing
    * history table — the operation a daily pipeline actually runs,
    * where [[scd2FromSnapshots]] is the one-off backfill. Closed runs
    * pass through untouched (never re-windowed, never shuffled); only
    * the open runs meet the snapshot in a single key join:
    *
    *  - open run, key absent from snapshot     → unchanged (still open)
    *  - open run, identical tracked attrs (`<=>`) → unchanged
    *  - open run, attrs changed → run closed at the snapshot's `timeCol`
    *    value, and a new open run appended from the snapshot row
    *  - key new to the history → new open run appended
    *
    * Invariant (specced + oracled): for per-key-unique snapshots with
    * strictly increasing times, folding them through scd2Apply equals
    * [[scd2FromSnapshots]] over their union — and re-applying the same
    * snapshot is a no-op.
    *
    * `history` must have the [[scd2FromSnapshots]] output schema
    * (keyCols ++ attrCols ++ carryCols ++
    * effective_from/effective_to/is_current — pass the SAME `carryCols`
    * the history was built with, or the select fails loudly);
    * `snapshot` carries keyCols ++ attrCols ++ `timeCol`, at most one
    * row per key, observed no earlier than every open run's
    * `effective_from`.
    *
    * Plan shape: the closed partition of the history is a filter-scan
    * straight into the union — zero exchanges over the bulk of a
    * multi-year history. Every join builds a SNAPSHOT-derived side, so
    * the big open-runs side never shuffles: the close pass and the
    * reopened runs both come from one open-LEFT-JOIN-snapshot
    * (broadcast snapshot), and brand-new keys are found by anti-joining
    * the snapshot against the MATCHED key set (itself at most
    * snapshot-sized, so it broadcasts too) — never by building a hash
    * table over the open side, which is what a naive
    * full-outer/right-outer formulation degrades to (a sort-merge
    * shuffle of the whole dimension, PlanSpec-pinned against). Set
    * `broadcastSnapshot = false` only when one batch is itself beyond
    * broadcast scale — the joins then fall back to AQE's choice. */
  def scd2Apply(history: DataFrame, snapshot: DataFrame,
                keyCols: Seq[String], timeCol: String,
                attrCols: Seq[String],
                broadcastSnapshot: Boolean = true,
                carryCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2Apply: key and attribute columns required")
    // carryCols mirror scd2FromSnapshots: run-start-row columns carried
    // through history; new/reopened runs take theirs from the snapshot
    val outCols = (keyCols ++ attrCols ++ carryCols ++
      Seq("effective_from", "effective_to", "is_current")).map(col)
    val toType = history.schema("effective_to").dataType
    val closed = history.filter(!col("is_current")).select(outCols: _*)
    val open = history.filter(col("is_current"))
    val snap = snapshot.select(
      keyCols.map(col) ++
        (attrCols ++ carryCols).map(a => col(a).as(s"__new_$a")) :+
        col(timeCol).as("__new_time"): _*)
      .withColumn("__in_snap", lit(true))
    def bc(df: DataFrame) = if (broadcastSnapshot) broadcast(df) else df
    val j = open.join(bc(snap), keyCols, "left")
    val sameAttrs = attrCols.map(a => col(a) <=> col(s"__new_$a")).reduce(_ && _)
    val changed = col("__in_snap").isNotNull && !sameAttrs
    // every open run survives exactly once: as-is, or closed at the
    // snapshot time when its tracked attributes moved
    val openOut = j.select(
      (keyCols ++ attrCols ++ carryCols).map(col) ++ Seq(
        col("effective_from"),
        when(changed, col("__new_time"))
          .otherwise(col("effective_to")).as("effective_to"),
        (!changed).as("is_current")): _*)
    // runs reopened in place: matched keys whose tracked state moved
    val reopened = j.filter(changed).select(
      keyCols.map(col) ++
        (attrCols ++ carryCols).map(a => col(s"__new_$a").as(a)) ++ Seq(
        col("__new_time").as("effective_from"),
        lit(null).cast(toType).as("effective_to"),
        lit(true).as("is_current")): _*)
    // brand-new keys: snapshot minus the matched key set (≤ snapshot-
    // sized by construction, so the anti join broadcasts it)
    val matchedKeys = j.filter(col("__in_snap").isNotNull)
      .select(keyCols.map(col): _*)
    val newRuns = snap.join(bc(matchedKeys), keyCols, "left_anti")
      .select(
        keyCols.map(col) ++
          (attrCols ++ carryCols).map(a => col(s"__new_$a").as(a)) ++ Seq(
          col("__new_time").as("effective_from"),
          lit(null).cast(toType).as("effective_to"),
          lit(true).as("is_current")): _*)
    closed.unionByName(openOut).unionByName(reopened).unionByName(newRuns)
  }
}
