package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K4/J4/I2: exactly-once *file* processing via a name-keyed ledger.
  *
  * The reference keeps a `PROCESSED_FILES(FOLDER_NAME, FILE_NAME,
  * LOADED_AT default CURRENT_TIMESTAMP)` table and skips any file whose
  * (folder, file) pair is present (reference:
  * airflow/dags/plugins/snowflake_load.py:59-76 DDL, 108-121 check,
  * 123-133 insert; same semantics by `head_object`/listing at
  * s3_copy.py:84-99, transform.py:160-169, customerload.py:84-89).
  *
  * Deliberately filename-keyed and content-blind — re-uploading a changed
  * file under the same name is NOT reprocessed. That is the reference's
  * observable behavior and is preserved (SURVEY §7.5.3).
  *
  * Scale note: the ledger is (folder, file) pairs — usually small enough
  * to broadcast, so `newFiles` hints broadcast and candidate discovery
  * never shuffles the candidate side. But a 100 TB daily-ingest lake
  * accumulates 10⁷-10⁸ ledger rows over years — past the driver's
  * broadcast envelope — so the hint is SIZE-CONDITIONAL: above
  * [[BroadcastMaxBytes]] (estimated from the plan's statistics, a
  * driver-side metadata read, no job) the join is left hintless and
  * AQE picks the strategy from the runtime size (a shuffled left_anti
  * at worst — same result, no driver OOM).
  */
object FileLedger {

  val Schema = "folder_name STRING, file_name STRING, loaded_at TIMESTAMP"

  /** Past this estimated ledger size the broadcast hint is dropped and
    * AQE chooses the anti-join strategy. Overridable per session via
    * `graft.ledger.broadcastMaxBytes` (runtime conf). */
  val BroadcastMaxBytes: Long = 64L << 20

  /** Read the ledger, or an empty one if it doesn't exist yet. */
  def load(spark: SparkSession, ledgerPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      spark.read.parquet(ledgerPath)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(Schema))
  }

  /** J4: the reference's only anti-join — candidates minus already-seen,
    * keyed on (folder_name, file_name). The ledger side is broadcast
    * while its ESTIMATED size (logical-plan statistics — parquet footer
    * metadata, no job) stays under the threshold; a lake-lifetime
    * ledger past it degrades to a hintless join AQE plans from runtime
    * size, instead of force-broadcasting 10⁸ rows through the driver. */
  def newFiles(candidates: DataFrame, ledger: DataFrame): DataFrame = {
    val keys = ledger.select("folder_name", "file_name")
    val maxBytes = ledger.sparkSession.conf
      .get("graft.ledger.broadcastMaxBytes", BroadcastMaxBytes.toString).toLong
    val est = keys.queryExecution.optimizedPlan.stats.sizeInBytes
    val side = if (est <= maxBytes) broadcast(keys) else keys
    candidates.join(side, Seq("folder_name", "file_name"), "left_anti")
  }

  /** K4: append processed (folder, file) pairs with a load timestamp
    * (reference: snowflake_load.py:123-133 + `LOADED_AT` default :68). */
  def append(spark: SparkSession, ledgerPath: String,
             entries: Seq[(String, String)]): Unit = {
    import spark.implicits._
    entries.toDF("folder_name", "file_name")
      .withColumn("loaded_at", current_timestamp())
      .write.mode("append").parquet(ledgerPath)
  }

  /** Driver-side convenience used by the orchestrator: which of `files`
    * under `folder` are unprocessed, in deterministic (sorted) order.
    * Expressed AS the [[newFiles]] anti-join it otherwise duplicates —
    * the ledger's seen-set is filtered and joined distributed (the
    * folder filter pushes to the parquet scan), so a lake-lifetime
    * ledger never materializes on the driver; the only collect is the
    * result, bounded by the CALLER's candidate list (already
    * driver-side by signature). */
  def unprocessed(spark: SparkSession, ledgerPath: String, folder: String,
                  files: Seq[String]): Seq[String] = {
    import spark.implicits._
    val cands = files.toDF("file_name").withColumn("folder_name", lit(folder))
    val ledger = load(spark, ledgerPath).filter(col("folder_name") === folder)
    newFiles(cands, ledger)
      .select("file_name").collect().map(_.getString(0)).toSeq.sorted
  }
}
