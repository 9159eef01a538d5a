package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §7.4): image/audio/video carried as opaque
  * `binary` content plus typed metadata. The Spark-side plumbing —
  * schema, batch shape, partition sizing — is real; the actual media
  * decode is STUBBED (media codecs are not available in this
  * environment) behind `decodeStub`, which produces deterministic fake
  * features from the bytes so the pipeline is end-to-end testable.
  *
  * Scale notes: binary payloads dominate row size, so
  * `spark.sql.files.maxPartitionBytes` governs batch memory; feature
  * extraction is a per-row projection (no shuffle); the repartition knob
  * below right-sizes tasks when payloads are large.
  */
object Multimodal {

  /** A decoded media asset's features. In production `width`/`height`/
    * `duration_ms` come from the codec; here they are deterministic
    * functions of the payload bytes (see `decodeStub`). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: String,
      width: Int, height: Int, duration_ms: Long)

  /** Attach a binary content column (here derived from text — the test
    * corpus has no true media; UTF-8 bytes stand in for a payload). */
  def withBinaryContent(df: DataFrame, idCol: String, payloadCol: String,
                        kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("content"))

  /** STUB decode: in production this calls the image/audio codec on each
    * binary payload (batched per partition). Here it derives
    * deterministic fake dimensions from the payload hash so tests and
    * oracles are stable. The *shape* — per-partition batch processing of
    * binary content into typed features — is the real contract. */
  def decodeStub(df: DataFrame): DataFrame =
    df.select(
      col("media_id"), col("kind"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("checksum"),
      // fake dims: bounded functions of an engine-portable hash
      (pmod(crc32(col("content")), lit(1920)) + 1).cast("int").as("width"),
      (pmod(crc32(col("content")) / 1920, lit(1080)) + 1).cast("int").as("height"),
      (length(col("content")) * 10).cast("long").as("duration_ms"))

  /** Right-size partitions for heavy binary rows before decode: target
    * ~`targetRowsPerTask` rows per task so a wide decode doesn't blow
    * executor memory. At 100 TB this is the difference between steady
    * 256 MB tasks and OOM. */
  def repartitionForDecode(df: DataFrame, totalRows: Long,
                           targetRowsPerTask: Long = 10000): DataFrame = {
    val parts = math.max((totalRows / targetRowsPerTask).toInt, 1)
    df.repartition(parts)
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk of
    * `frameBytes` bytes becomes a frame row (explode = the generate shape
    * a real frame sampler has). */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    df.select(col("media_id"),
      posexplode(transform(
        sequence(lit(0L),
          greatest(floor(length(col("content")) / (frameBytes * stride)).cast("long") - 1L, lit(0L))),
        i => substring_index(base64(col("content")), "=", 1).substr(
          (i * (frameBytes * stride) + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_payload")
}
