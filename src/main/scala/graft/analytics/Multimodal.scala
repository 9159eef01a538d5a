package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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

  /** Value of the hex digit at 1-based position `i` of hex string `h`:
    * ascii arithmetic only (`ascii`/`substring`/CASE), so ANY engine
    * with an md5-to-hex function reproduces it — the property that
    * makes the stub dims below oracle-checkable in DuckDB. */
  private def hexNibble(h: Column, i: Int): Column = {
    val a = ascii(substring(h, i, 1))
    a - when(a >= 97, lit(87)).otherwise(lit(48))
  }

  /** Integer value of hex digits [start, start+n) of `h` (1-based). */
  private def hexVal(h: Column, start: Int, n: Int): Column =
    (0 until n).map(i =>
      hexNibble(h, start + i) * lit(1L << (4 * (n - 1 - i)))).reduce(_ + _)

  /** STUB decode: in production this calls the image/audio codec on each
    * binary payload (batched per partition). Here it derives
    * deterministic fake dimensions from the payload's md5 — hex digits
    * 1-4 drive width, 5-8 height — so tests AND DuckDB oracles can
    * reproduce them (crc32 previously used here is Spark-only). The
    * *shape* — per-partition batch processing of binary content into
    * typed features — is the real contract. */
  /** The stub feature columns over `content` — shared by decodeStub and
    * resizeStub (which appends them IN PLACE next to the payload rather
    * than joining the decode output back to it). */
  private def featureCols: Seq[Column] = {
    val h = md5(col("content"))
    Seq(
      length(col("content")).cast("long").as("n_bytes"),
      h.as("checksum"),
      (hexVal(h, 1, 4) % 1920 + 1).cast("int").as("width"),
      (hexVal(h, 5, 4) % 1080 + 1).cast("int").as("height"),
      (length(col("content")) * 10).cast("long").as("duration_ms"))
  }

  def decodeStub(df: DataFrame): DataFrame =
    df.select(col("media_id") +: col("kind") +: featureCols: _*)

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** The per-partition BATCHED decode shape a real codec binding needs:
    * codec/handles initialized once per partition (amortized over all its
    * rows), payloads processed in fixed-size batches (bounds peak memory
    * for wide frames). The decode body is the same deterministic stub as
    * `decodeStub` — tests assert both paths agree — but the plumbing
    * (mapPartitions + grouped iterator, no collect, no shuffle) is
    * exactly what a libjpeg/ffmpeg binding drops into. */
  def decodeBatched(df: org.apache.spark.sql.DataFrame,
                    batchSize: Int = 64): Dataset[MediaFeatures] = {
    import org.apache.spark.sql.Encoders
    df.select("media_id", "kind", "content").as[MediaRow](Encoders.product[MediaRow])
      .mapPartitions { rows =>
        // [real codec: open handles here, once per partition]
        rows.grouped(batchSize).flatMap { batch =>
          // [real codec: decode `batch` in one vectorized call]
          batch.map { r =>
            val md = java.security.MessageDigest.getInstance("MD5")
            val checksum = md.digest(r.content).map("%02x".format(_)).mkString
            // same md5-hex-prefix dims as decodeStub (differentially tested)
            val w = Integer.parseInt(checksum.substring(0, 4), 16) % 1920 + 1
            val h = Integer.parseInt(checksum.substring(4, 8), 16) % 1080 + 1
            MediaFeatures(r.media_id, r.kind, r.content.length.toLong, checksum,
              w, h, r.content.length.toLong * 10)
          }
        }
      }(Encoders.product[MediaFeatures])
  }

  /** Right-size partitions for heavy binary rows before decode: target
    * ~`targetRowsPerTask` rows per task so a wide decode doesn't blow
    * executor memory. At 100 TB this is the difference between steady
    * 256 MB tasks and OOM. */
  def repartitionForDecode(df: DataFrame, totalRows: Long,
                           targetRowsPerTask: Long = 10000): DataFrame = {
    val parts = math.max((totalRows / targetRowsPerTask).toInt, 1)
    df.repartition(parts)
  }

  /** Resize stub: the aspect-preserving fit-in-box geometry (the REAL
    * resize contract — scale = min(tw/w, th/h), never upscaled, floor
    * to pixels) plus a deterministic fake thumbnail: a content prefix
    * whose byte length scales with the output/input area ratio. A codec
    * binding swaps the prefix for actual pixel resampling; geometry,
    * schema and per-row projection shape are production-real. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    // dims derive in-place from the payload the row already carries —
    // NO self-join: at media scale the binary content IS the dataset,
    // and sending it through a join exchange it already visited would
    // double the job's dominant I/O (gated by PlanSpec).
    val d = media.select(
      col("media_id") +: col("kind") +: col("content") +: featureCols: _*)
    val scale = least(
      lit(targetW).cast("double") / col("width"),
      lit(targetH).cast("double") / col("height"),
      lit(1.0))
    val outW = greatest(floor(col("width") * scale), lit(1)).cast("int")
    val outH = greatest(floor(col("height") * scale), lit(1)).cast("int")
    val thumbLen = greatest(
      floor(col("n_bytes") * (outW.cast("long") * outH.cast("long")).cast("double")
        / (col("width").cast("long") * col("height").cast("long")).cast("double")),
      lit(1L)).cast("int")
    d.select(col("media_id"), col("kind"),
      col("width").as("src_width"), col("height").as("src_height"),
      outW.as("out_width"), outH.as("out_height"),
      col("content").substr(lit(1), thumbLen).as("thumb"))
      .withColumn("thumb_bytes", length(col("thumb")).cast("long"))
      .withColumn("thumb_checksum", md5(col("thumb")))
  }

  /** Fixed-duration audio chunking by metadata arithmetic ALONE — the
    * windowing a speech pipeline runs before any model sees a sample.
    * No decode: chunk boundaries come from the declared byte rate
    * (`bytesPerSecond`, e.g. sample_rate × bytes_per_sample from the
    * container header), so the op is exact and cheap at any scale. One
    * explode per payload (`ceil(n_bytes / bytes_per_chunk)` rows); each
    * chunk's checksum hashes ONLY its own hex slice — per-row cost is
    * O(payload), never O(chunks × payload). A codec binding would swap
    * the hex-slice checksum for real sample frames; offsets, lengths,
    * timestamps and the generate shape are production-real. */
  def chunkAudio(media: DataFrame, bytesPerSecond: Long, chunkMs: Long): DataFrame = {
    require(bytesPerSecond > 0 && chunkMs > 0, "rate and window must be positive")
    require(bytesPerSecond * chunkMs % 1000 == 0,
      "bytesPerSecond*chunkMs must be a whole number of bytes")
    val bpc = bytesPerSecond * chunkMs / 1000
    media
      .select(col("media_id"), hex(col("content")).as("__hex"),
        length(col("content")).cast("long").as("n_bytes"))
      .select(col("media_id"), col("n_bytes"), col("__hex"),
        // empty payloads still yield one empty chunk: sequence(0,-1) in
        // Spark is the DESCENDING [0,-1], not the empty sequence
        posexplode(sequence(lit(0L),
          greatest(expr(s"(n_bytes + ${bpc - 1}) DIV $bpc"), lit(1L)) - 1L)))
      .withColumn("byte_off", col("pos") * bpc)
      .withColumn("byte_len",
        greatest(least(lit(bpc), col("n_bytes") - col("byte_off")), lit(0L)))
      .select(col("media_id"), col("pos").cast("long").as("chunk_idx"),
        col("byte_off"), col("byte_len"),
        (col("pos") * chunkMs).cast("long").as("ms_off"),
        md5(col("__hex").substr(col("byte_off") * 2 + 1, col("byte_len") * 2))
          .as("chunk_checksum"))
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk of
    * `frameBytes` bytes becomes a frame row (explode = the generate shape
    * a real frame sampler has). Each frame slices ONLY its own bytes
    * from the binary payload and encodes that slice — per-row cost is
    * O(frames × frameBytes), independent of payload size (the previous
    * shape base64'd the whole payload inside the per-frame lambda:
    * O(frames × payload)). */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    df.select(col("media_id"),
      posexplode(transform(
        sequence(lit(0L),
          greatest(floor(length(col("content")) / (frameBytes * stride)).cast("long") - 1L, lit(0L))),
        i => base64(col("content").substr(
          (i * (frameBytes * stride) + 1).cast("int"), lit(frameBytes))))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_payload")

  /** Cross-media frame-level dedup: md5 each sampled frame payload and
    * report hashes seen in ≥ minMedia DISTINCT media — the "same scene
    * in many videos" detector (near-universal intro/outro frames are
    * the video-corpus analog of boilerplate paragraphs). The payload
    * leaves the plan at the hash projection: only (hash, media_id)
    * rows shuffle, and count(DISTINCT media_id) expands to the
    * two-phase distinct aggregate with map-side partials — no frame
    * payload ever crosses an exchange. */
  def frameDedup(df: DataFrame, frameBytes: Int, stride: Int,
                 minMedia: Long = 2L): DataFrame =
    sampleFrames(df, frameBytes, stride)
      .select(md5(col("frame_payload")).as("fhash"), col("media_id"))
      .groupBy("fhash")
      .agg(countDistinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_frames"))
      .filter(col("n_media") >= minMedia)
}
