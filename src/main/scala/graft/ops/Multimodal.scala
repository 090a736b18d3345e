package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline
  * (beyond-reference; BASELINE.json north star).
  *
  * Design: media payloads are opaque `binary` columns travelling next to a
  * typed metadata struct (mime, width/height, sample rate, …). All Spark-side
  * plumbing — schema, partitioning, batch shape, per-partition decode loop —
  * is real; only the innermost byte-level codec call is a deterministic fake,
  * clearly marked STUB, because no image/audio libraries ship in this
  * container. Swapping the stub for a real codec (e.g. javax.imageio /
  * ffmpeg-cli per partition) changes no plan shape.
  *
  * Scale notes: decode is per-row map work inside `mapPartitions` — zero
  * shuffle, linear in executors. Real pipelines keep media in separate
  * blob-store files and carry (uri, byte_range) here instead of inline bytes
  * once payloads exceed ~1 MB, so row groups stay scan-friendly; the metadata
  * struct and the decode loop are identical either way.
  */
object Multimodal {

  /** Typed metadata carried beside each media payload. */
  case class MediaMeta(mime: String, width: Int, height: Int, channels: Int)

  case class MediaRow(doc_id: Long, meta: MediaMeta, payload: Array[Byte])

  case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      checksum: Long,
      width: Int,
      height: Int,
      // STUB features — deterministic stand-ins for decoded-pixel statistics.
      mean_intensity: Double,
      feature: Array[Float])

  /** Synthesize a media table from `documents`: payload = utf-8 bytes of the
    * text (a deterministic opaque blob), metadata derived from doc fields.
    * In production this would be `spark.read.format("binaryFile")` or a
    * parquet table with a real binary column. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      struct(
        concat(lit("image/fake-"), col("lang")).as("mime"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
        lit(3).as("channels")).as("meta"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: a real implementation would parse `payload` with an image
    * codec. The fake is deterministic in the bytes so results are stable and
    * oracle-able; the signature, batching, and partition behavior are what a
    * real decoder plugs into. */
  private def stubDecode(payload: Array[Byte], meta: MediaMeta): (Double, Array[Float]) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    // 8-dim "embedding": byte-histogram over 8 equal-width bins, normalized.
    val hist = new Array[Float](8)
    i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 5) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    (mean, hist.map(_ / n))
  }

  /** Per-partition decode/feature-extract over the binary column — the
    * `mapPartitions` shape a real codec uses (amortizes any per-partition
    * codec/native-lib init across rows). */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir).as[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (mean, feat) = stubDecode(r.payload, r.meta)
        var crc = new java.util.zip.CRC32()
        crc.update(r.payload)
        MediaFeatures(r.doc_id, r.meta.mime, r.payload.length.toLong,
          crc.getValue, r.meta.width, r.meta.height, mean, feat)
      }
    }.toDF()
  }

  /** Oracle-able slice of the media pipeline: payload byte length + typed
    * metadata, reproducible in DuckDB from the same documents table
    * (checksum/intensity stay in [[decodeFeatures]], rows-only-checked,
    * because DuckDB lacks crc32/byte-mean builtins). */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir)
      .select(col("doc_id"), col("mime"), col("n_bytes"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"))
      .orderBy("doc_id")

  /** Resize plumbing: deterministic down-sampling of the payload (every
    * k-th byte) with metadata updated to match — the same partition-local
    * map shape a real image resize (e.g. imageio scaled rewrite) plugs
    * into; payload shrinks k-fold, no shuffle. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    val sampleBytes = udf((payload: Array[Byte]) =>
      if (payload == null) null
      else {
        val out = new Array[Byte]((payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = payload(i * factor); i += 1 }
        out
      })
    media.select(
      col("doc_id"),
      struct(
        col("meta.mime").as("mime"),
        (col("meta.width") / factor).cast("int").as("width"),
        (col("meta.height") / factor).cast("int").as("height"),
        col("meta.channels").as("channels")).as("meta"),
      sampleBytes(col("payload")).as("payload"))
  }

  /** Frame-sampling plumbing: treat the payload as a "video" of fixed-size
    * frames and sample every k-th frame — the array-slice pattern used for
    * real frame extraction (explode on a computed frame index). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val frameBytes = 256
    val every = 4
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"),
        (length(col("payload")) / frameBytes).cast("int").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("payload"))
      .filter(pmod(col("frame_idx"), lit(every)) === 0)
      .select(col("doc_id"), col("frame_idx"),
        crc32(substring(col("payload"), col("frame_idx") * frameBytes + 1, lit(frameBytes)))
          .as("frame_checksum"))
      .orderBy("doc_id", "frame_idx")
  }
}
