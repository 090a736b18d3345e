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

  /** Media table from a directory of real files via Spark's `binaryFile`
    * source — the production ingestion path the synthetic [[mediaTable]]
    * stands in for. Each file becomes one row: stable 64-bit id from the
    * path hash, payload = file bytes, claimed dimensions 0 (the decode
    * step corrects them from the pixels). `binaryFile` splits at file
    * granularity, so decode parallelism = file count — at scale media
    * lands in many files and this is exactly the right unit. */
  def fromBinaryFiles(spark: SparkSession, path: String, mime: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(
        xxhash64(col("path")).as("doc_id"),
        struct(lit(mime).as("mime"), lit(0).as("width"), lit(0).as("height"),
          lit(3).as("channels")).as("meta"),
        col("content").as("payload"))

  /** REAL codec path: decode `payload` with `javax.imageio` (JDK
    * built-in — PNG/JPEG/BMP/GIF, no external deps) into mean luminance +
    * an 8-bin luminance histogram, plus the true pixel dimensions.
    * Returns None when the bytes aren't a decodable image (the driver's
    * synthetic payloads are utf-8 text, which keeps those results on the
    * deterministic stub path); MultimodalCsvSpec exercises this on real
    * PNGs generated in-test. */
  private def imageDecode(payload: Array[Byte]): Option[(Double, Array[Float], Int, Int)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      var sum = 0L
      val hist = new Array[Float](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          sum += lum; hist(lum >> 5) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(w.toLong * h, 1L)
      Some((sum.toDouble / n, hist.map(_ / n.toFloat), w, h))
    }
  }

  /** Per-partition decode/feature-extract over the binary column — the
    * `mapPartitions` shape a real codec uses (amortizes any per-partition
    * codec/native-lib init across rows). Real images decode through
    * [[imageDecode]] (metadata dimensions corrected from the pixels);
    * non-image payloads take the deterministic stub. */
  def decodeFeaturesDf(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // Probe images in-memory: the default disk-backed temp-file
      // ImageInputStream costs a file create/delete per row.
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (mean, feat, w, h) = imageDecode(r.payload) match {
          case Some((m, f, iw, ih)) => (m, f, iw, ih)
          case None =>
            val (m, f) = stubDecode(r.payload, r.meta)
            (m, f, r.meta.width, r.meta.height)
        }
        val crc = new java.util.zip.CRC32()
        crc.update(r.payload)
        MediaFeatures(r.doc_id, r.meta.mime, r.payload.length.toLong,
          crc.getValue, w, h, mean, feat)
      }
    }.toDF()
  }

  def decodeFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeFeaturesDf(spark, mediaTable(spark, dir))

  /** Oracle-able slice of the media pipeline: payload byte length + typed
    * metadata, reproducible in DuckDB from the same documents table.
    * Pure Catalyst expressions over [[mediaTable]] — a metadata scan must
    * never touch a codec, so this does NOT route through the decode path
    * (checksum/intensity stay in [[decodeFeatures]], rows-only-checked,
    * because DuckDB lacks crc32/byte-mean builtins). */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("meta.mime").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"))
      .orderBy("doc_id")

  /** Blob-pack target size for [[manifestPlan]]'s default QUERY entry —
    * deliberately small (64 KiB) so the plan exercises multi-file
    * placement even at sf0.001; production object-store packing uses
    * ~64 MB blobs (one HTTP range-read per payload, row groups stay
    * scan-friendly). */
  val BlobTargetBytes: Long = 64L * 1024

  /** Ingest-bucket width (docs per bucket) for [[manifestPlan]]'s running
    * sum — deliberately small (128) so the driver SFs (500-5000 docs)
    * exercise multi-bucket prefix reconstruction per mime. At 100 TB this
    * is the knob to retune: pick it so one bucket's metadata rows
    * (~10⁵-10⁶ docs × ~100 B) fit a single window task, while the
    * per-mime bucket COUNT stays single-task-window-able in the
    * bucket-base pass (which runs over one aggregated row per bucket). */
  val ManifestBucketDocs: Long = 128L

  /** Blob-manifest planning — the at-scale media layout this file's
    * header documents: payloads over ~1 MB do NOT travel inline in rows;
    * they live packed in blob-store files and rows carry (uri,
    * byte_range). This op PLANS that packing: per mime group (payloads of
    * one type pack together so a modality-specific reader never range-
    * reads past foreign bytes), payloads are laid out in doc_id order,
    * each assigned the blob file its running byte offset falls in
    * (floor(bytes_before / target) — same first-fit-by-prefix rule as
    * [[graft.ops.Text.compactionPlan]]) and its byte range within that
    * file. Output is the per-payload manifest a downstream decode stage
    * joins on — pure integer math over metadata, fully oracle-able, no
    * payload bytes touched.
    *
    * Scale shape: the per-mime running byte sum is a DISTRIBUTED prefix
    * sum over (mime, ingest-bucket) — bucket = floor(doc_id /
    * [[ManifestBucketDocs]]), deterministic so the oracle's global-sum
    * replay matches bit-for-bit. Pass 1: a running sum windowed by
    * (mime, bucket), so no single mime's manifest ever serializes
    * through one task. Pass 2: per-(mime, bucket) byte totals (one
    * aggregated row per bucket) take a per-mime cumulative — a window
    * over bucket-count rows, not doc rows — and the resulting
    * bucket_base re-attaches by (mime, bucket) join (AQE broadcasts the
    * tiny base table); bytes_before = bucket_base + local_before, equal
    * to the single-window global sum. The per-file min window stays
    * (mime, file_seq) — a blob file's manifest rows are bounded by
    * targetBytes / min payload size. All exchanges carry ~100-byte
    * metadata rows, never payloads. */
  def manifestPlan(spark: SparkSession, dir: String,
                   targetBytes: Long = BlobTargetBytes,
                   bucketDocs: Long = ManifestBucketDocs): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the window side and the bucket-total side below each evaluate this
    // narrow projection — two scans of the source. Kept deliberately: a
    // measured truncate (localCheckpoint) of the projection cost MORE
    // than the second scan at every tier (sf10: 8.9 s vs 2.6 s — the
    // materialization write dwarfs re-reading one column), and at blob-
    // manifest scale the payload lives OUT of the row (the header's
    // (uri, byte_range) layout), so the re-scanned table is already
    // metadata-narrow. If payloads ever ride inline AND huge, wrap this
    // in Dedup.truncate to trade one materialization for the scan.
    val rows = mediaTable(spark, dir)
      .select(col("doc_id"), col("meta.mime").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("bucket", floor(col("doc_id") / bucketDocs))
    val localBefore = Window.partitionBy(col("mime"), col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe base attach: a NULL mime (absent metadata) groups into a
    // NULL-key base row, and the window plan kept such rows — an
    // equi-join would silently drop them from the manifest
    val bases = rows
      .groupBy(col("mime").as("b_mime"), col("bucket").as("b_bucket"))
      .agg(sum(col("n_bytes")).as("bucket_bytes"))
      .withColumn("bucket_base",
        coalesce(sum(col("bucket_bytes")).over(
          Window.partitionBy(col("b_mime")).orderBy(col("b_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b_mime"), col("b_bucket"), col("bucket_base"))
    val placed = rows
      .withColumn("local_before",
        coalesce(sum(col("n_bytes")).over(localBefore), lit(0L)))
      .join(bases, col("mime") <=> col("b_mime") &&
        col("bucket") <=> col("b_bucket"))
      .drop("b_mime", "b_bucket")
      .withColumn("bytes_before", col("bucket_base") + col("local_before"))
      .withColumn("file_seq", floor(col("bytes_before") / targetBytes))
    // byte_start is relative to the file: subtract the file's first
    // payload's running offset (a second window over (mime, file_seq))
    val fileBase = Window.partitionBy(col("mime"), col("file_seq"))
    placed
      .withColumn("file_base", min(col("bytes_before")).over(fileBase))
      .select(col("doc_id"),
        concat(col("mime"), lit("/blob-"), col("file_seq")).as("uri"),
        (col("bytes_before") - col("file_base")).as("byte_start"),
        col("n_bytes").as("byte_len"))
      .orderBy("doc_id")
  }

  /** Payload-level EXACT dedup — the multimodal sibling of
    * [[graft.ops.Dedup.exactDedup]]: identical media BYTES (re-uploaded
    * images, mirrored assets) collapse to one canonical row regardless of
    * surrounding metadata. Fingerprint = md5 of the payload; the
    * aggregation shuffles only (16-byte fp, id, n_bytes) — payload bytes
    * never cross the exchange, the invariant that makes this viable when
    * payloads are MBs (at blob-manifest scale the fp is computed at
    * ingest and this op never touches bytes at all). Keeper = smallest
    * doc_id, the same deterministic rule as the text-side dedup. */
  def payloadDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), md5(col("payload")).as("fp"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sum(col("n_bytes")).as("total_bytes"))
      .orderBy("keep_id")

  /** Modality-mix report — the multimodal analog of `pipeline_mixture`:
    * per media type, corpus share by row count and by BYTES (the number
    * a multimodal training-mixture spec is written against, since one
    * video outweighs a thousand captions), plus payload-size dispersion
    * for shard planning. One aggregate over metadata; payloads feed only
    * the map-side length(). */
  def modalityMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    mediaTable(spark, dir)
      .select(col("meta.mime").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .withColumn("byte_share",
        round(col("total_bytes").cast("double") /
          sum(col("total_bytes")).over(Window.partitionBy()), 6))
      .orderBy("mime")
  }

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
      // md5 (not crc32): same cost class, and DuckDB has md5 — makes the
      // whole frame pipeline hash-oracle-able cross-engine
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(substring(col("payload"), col("frame_idx") * frameBytes + 1, lit(frameBytes)))
          .as("frame_checksum"))
      .orderBy("doc_id", "frame_idx")
  }
}
