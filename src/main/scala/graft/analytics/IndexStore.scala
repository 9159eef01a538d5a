package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared storage discipline of the two persisted index families
  * (MinHash-LSH: `shingles`/`bands`; IVF-PQ: `codes`). Each component
  * lives in three sibling locations under the index path:
  *
  *   `<component>`          — the offline base build (overwrite-once)
  *   `<component>_delta`    — daily batch appends, one `batch=<id>`
  *                            partition per append, gated by the
  *                            index's `_ledger` (exactly-once: a
  *                            replayed batch id is skipped, a retried
  *                            half-write overwrites its own dir)
  *   `<component>_stream`   — streaming-maintenance delta through the
  *                            parquet file sink (the sink manifest
  *                            commits each micro-batch atomically)
  *
  * Readers (probe/serve) and the compactors all assemble the SAME
  * relation: base ∪ ledgered batch delta ∪ manifest-committed stream
  * delta — so a crashed, never-retried batch write is invisible rather
  * than half-visible, and compaction is a bit-equal rewrite by
  * construction. The exactly-once contract mirrors the reference's
  * name-keyed PROCESSED_FILES ledger (snowflake_load.py:108-133)
  * applied to index artifacts.
  */
private[graft] object IndexStore {

  /** Ledger folder key for appended index batches. */
  val IndexBatchFolder = "index_batches"

  /** Is `batchId` already ledgered at this index? (A replayed append
    * must be a no-op.) */
  def batchAlreadyAppended(spark: SparkSession, path: String,
                           batchId: String): Boolean =
    graft.operators.FileLedger
      .unprocessed(spark, s"$path/_ledger", IndexBatchFolder, Seq(batchId))
      .isEmpty

  /** Record a fully-committed batch append — call strictly AFTER every
    * component write committed (ledger-last fails the recoverable way:
    * a crash between data and ledger re-runs the idempotent overwrite). */
  def ledgerBatch(spark: SparkSession, path: String, batchId: String): Unit =
    graft.operators.FileLedger.append(spark, s"$path/_ledger",
      Seq((IndexBatchFolder, batchId)))

  /** Batch ids the index ledger records, driver-side. Bounded by one
    * row per appended batch — days of operation, thousands at most. */
  def ledgeredBatchIds(spark: SparkSession, path: String): Array[String] =
    graft.operators.FileLedger.load(spark, s"$path/_ledger")
      .filter(col("folder_name") === IndexBatchFolder)
      .select("file_name").distinct().collect().map(_.getString(0))

  /** The ledgered batch delta of an index component: every `batch=<id>`
    * partition of `<path>/<component>_delta` whose id the ledger
    * records. The `isin` over the driver-side id list is a
    * PartitionFilter, so unledgered (crashed, never-retried) batch dirs
    * are skipped at file-listing time. */
  def ledgeredDelta(spark: SparkSession, path: String, component: String,
                    selectCols: Seq[String]): Option[DataFrame] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/${component}_delta")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else {
      val ids = ledgeredBatchIds(spark, path)
      if (ids.isEmpty) None
      else Some(spark.read.parquet(dir.toString)
        .filter(col("batch").isin(ids.toSeq: _*))
        .select(selectCols.map(col): _*))
    }
  }

  /** The streaming delta of an index component, written by the
    * exactly-once parquet file sink (manifest-committed rows only).
    * The explicit schema lets a delta dir holding only the sink
    * manifest (zero committed batches) read as empty. */
  def streamDelta(spark: SparkSession, path: String, component: String,
                  schemaFrom: DataFrame,
                  selectCols: Seq[String]): Option[DataFrame] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/${component}_stream")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else Some(spark.read.schema(schemaFrom.schema).parquet(dir.toString)
      .select(selectCols.map(col): _*))
  }

  /** Full stored relation of an index component under the single
    * visibility rule: base ∪ ledgered batch delta ∪ stream delta. */
  def storedComponent(spark: SparkSession, path: String,
                      component: String): DataFrame = {
    val base = spark.read.parquet(s"$path/$component")
    val cols = base.columns.toSeq
    val withBatch = ledgeredDelta(spark, path, component, cols)
      .map(base.select(cols.map(col): _*).unionByName(_))
      .getOrElse(base.select(cols.map(col): _*))
    streamDelta(spark, path, component, base, cols)
      .map(withBatch.unionByName(_)).getOrElse(withBatch)
  }

  /** Rename-based swap shared by the compactors: `<component>_compact`
    * (already fully written) becomes the new base; the old base and
    * both delta dirs are dropped. Every crash window leaves a
    * recoverable superset — the compacted dir is complete before the
    * old base moves aside, and the old base is deleted only after the
    * compacted one is in place.
    *
    * Both renames are CHECKED and the delta dirs are deleted only after
    * the compacted base is verifiably in place: Hadoop `rename` reports
    * failure by RETURNING FALSE (e.g. a stale `_old` left by a crashed
    * previous compaction blocks the first rename) — an unchecked swap
    * would then delete the delta dirs while the OLD base is still
    * serving, silently losing every appended row until someone noticed
    * the orphaned `_compact` dir. A stale `_old` is cleaned up front
    * (the prior swap had already made its compacted base live, so the
    * stale dir is garbage by construction). */
  def swapCompacted(spark: SparkSession, path: String,
                    component: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val old = p(s"$path/${component}_old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(p(s"$path/$component"), old),
      s"compaction swap: failed to move $path/$component aside")
    require(fs.rename(p(s"$path/${component}_compact"), p(s"$path/$component")),
      s"compaction swap: failed to install $path/${component}_compact " +
        "— the old base is at ${component}_old; restore it or re-run")
    Seq(s"$path/${component}_old", s"$path/${component}_delta",
      s"$path/${component}_stream")
      .foreach(d => if (fs.exists(p(d))) fs.delete(p(d), true))
  }
}
