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
  * Scale note: the ledger is (folder, file) pairs — millions of rows at
  * most, i.e. broadcastable. `newFiles` is a broadcast left_anti join, so
  * candidate discovery never shuffles the candidate side.
  */
object FileLedger {

  val Schema = "folder_name STRING, file_name STRING, loaded_at TIMESTAMP"

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
    * keyed on (folder_name, file_name). Ledger side is broadcast (it is
    * file names, not data). */
  def newFiles(candidates: DataFrame, ledger: DataFrame): DataFrame =
    candidates.join(
      broadcast(ledger.select("folder_name", "file_name")),
      Seq("folder_name", "file_name"), "left_anti")

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
    * under `folder` are unprocessed, in deterministic (sorted) order. */
  def unprocessed(spark: SparkSession, ledgerPath: String, folder: String,
                  files: Seq[String]): Seq[String] = {
    val seen = load(spark, ledgerPath)
      .filter(col("folder_name") === folder)
      .select("file_name")
      .collect().map(_.getString(0)).toSet
    files.filterNot(seen).sorted
  }
}
