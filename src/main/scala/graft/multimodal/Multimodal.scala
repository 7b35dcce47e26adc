package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with a typed metadata struct, exactly
  * as a 100 TB training-data pipeline would carry them (payload pruned
  * unless projected; metadata usable for partition pruning and filtering).
  *
  * Decoders plug in behind [[MediaDecoder]]. Three implementations ship:
  *
  *  - [[ImageIoDecoder]] — a REAL image decoder (round 9) over the JDK's
  *    built-in `javax.imageio` (PNG/JPEG/BMP/GIF, zero external deps):
  *    actual decode, actual dimensions, mean-luma pixel stats, real
  *    bilinear resize.
  *  - [[WavDecoder]] — a REAL audio decoder (round 10) over the JDK's
  *    built-in `javax.sound.sampled` (WAV/AIFF/AU PCM): header parse,
  *    sample decode, RMS level + duration.
  *  - [[StubDecoder]] — a deterministic byte-level fake, still the
  *    gate/oracle DEFAULT: its features are replicable in SQL by any
  *    engine, which is what the correctness gate needs, and it stands in
  *    for codecs that genuinely aren't in this container (video).
  *
  * Everything around the decoder — schema, batched `mapPartitions`
  * execution, per-partition factory init, partitioning — is shared and
  * real.
  */
object Multimodal {

  /** Media record as carried through the pipeline. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], media_type: String,
                         width: Int, height: Int)

  /** Extracted feature row (what a real decoder would emit). */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, media_type: String,
                           width: Int, height: Int, feature: Double)

  /** Attach a binary media payload + typed metadata to documents.
    * Here the payload is the UTF-8 encoding of the text (deterministic
    * fake); in production it is the real blob column from ingestion. */
  def attachMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      F.col(idCol).cast("long").as("doc_id"),
      F.encode(F.col(textCol), "UTF-8").as("media"),
      F.lit("fake/text").as("media_type"),
      (F.length(F.col(textCol)) % 640).cast("int").as("width"),
      (F.length(F.col(textCol)) % 480).cast("int").as("height"))

  /** The decode/feature-extract stage: batched per-partition processing,
    * the exact execution shape (and batch-size economics) of a Pandas-UDF /
    * `mapInPandas` decoder: the codec initializes ONCE per partition
    * (`decoderFactory()` — model load / JNI handle), and records flow
    * through it in `batchSize` groups (an Arrow batch stand-in — a real
    * codec amortizes per-batch setup the same way). Production swaps the
    * factory for one returning a real codec; the default is the
    * deterministic [[StubDecoder]] (no codec libs in this container). */
  def extractFeatures(media: DataFrame, batchSize: Int = 64,
                      decoderFactory: () => MediaDecoder = () => StubDecoder)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      // Null payload or metadata (a NULL-text doc upstream null-propagates
      // through attachMedia) is undecodable media: DROP it here — the
      // package-wide contract — rather than letting the non-nullable
      // MediaRecord deserialization throw and fail the task (and, after
      // retries, the job) on one bad row.
      .filter(F.col("media").isNotNull && F.col("media_type").isNotNull &&
        F.col("width").isNotNull && F.col("height").isNotNull)
      .as[MediaRecord].mapPartitions { records =>
        val decoder = decoderFactory() // per-partition init
        records.grouped(batchSize).flatMap { batch =>
          decoder.decodeBatch(batch)
        }
      }
  }

  /** Attach REAL PNG payloads: each document renders to a small image
    * whose pixels are a deterministic function of (doc_id, text length),
    * encoded through the JDK's actual PNG writer executor-side. This is
    * the generator behind the real-decode gate query (q_multimodal_decode)
    * — [[ImageIoDecoder]] then performs a genuine decode of a genuine
    * encode, so the full codec path faces the driver harness, not just
    * ScalaTest. Rows-only at the gate: PNG bytes are not replicable in
    * SQL, which is exactly why [[StubDecoder]] remains the oracle default.
    *
    * Scale shape: pure mapPartitions over the scan — no shuffle, no
    * driver involvement; the codec work distributes like any decode. */
  def attachPngMedia(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      // NULL id/text would throw in the non-nullable tuple deserializer
      // and fail the job on one bad row — drop, the package contract
      // (same reason as extractFeatures' undecodable filter above).
      .filter(F.col(idCol).isNotNull && F.col(textCol).isNotNull)
      .select(F.col(idCol).cast("long"), F.length(F.col(textCol)).cast("int"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        ImageIoDecoder.init() // process-global ImageIO cache setting
        it.map { case (id, len0) =>
          val len = math.max(len0, 0)
          val w = 8 + (id % 8).toInt
          val h = 8 + len % 8
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((id * 31 + x * 7 + y * 13 + len) & 0xFF).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, bos.toByteArray, "image/png", w, h)
        }
      }.toDF()
  }

  /** Resize stub: deterministic payload transform + metadata update — the
    * plumbing of an image resize without the codec (truncate/pad bytes to
    * the target pixel budget). */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame = {
    val budget = w * h / 100 + 1
    media
      .withColumn("media",
        F.substring(F.col("media"), 1, budget))
      .withColumn("width", F.lit(w))
      .withColumn("height", F.lit(h))
  }

  /** Frame-sampling stub for "video" payloads: treats each `frameBytes` of
    * the binary as one frame and emits every `everyN`-th frame index with
    * its byte offset — the explode shape of real frame extraction, with
    * the decode left to [[StubDecoder]]. */
  def frameSampleStub(media: DataFrame, frameBytes: Int = 1024, everyN: Int = 2): DataFrame = {
    // Fail at plan time, not per row mid-query: sequence() throws on a
    // zero step, and non-positive frameBytes corrupts every index.
    require(everyN > 0, s"everyN must be positive, got $everyN")
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    val maxIdx = F.floor((F.length(F.col("media")) - 1) / F.lit(frameBytes)).cast("int")
    // A zero-length payload has no frames: maxIdx is -1 there, and
    // sequence(0, -1, +step) THROWS rather than returning empty — guard to
    // an empty array so one empty blob can't fail the whole query (the
    // explode then drops the row, which is the right "no frames" answer).
    val idxs = F.when(maxIdx >= 0, F.sequence(F.lit(0), maxIdx, F.lit(everyN)))
      .otherwise(F.array().cast("array<int>"))
    media.select(
      F.col("doc_id"),
      F.explode(idxs).as("frame_idx"))
      .select(
        F.col("doc_id"),
        F.col("frame_idx").cast("long").as("frame_idx"),
        (F.col("frame_idx") * frameBytes.toLong).as("byte_offset"))
  }
}

/** Deterministic stand-in for a media codec: "features" derived from bytes
  * only (length + first/last byte), so any engine can replicate them. */
/** The per-partition codec contract a production decoder implements: one
  * instance per partition (constructed executor-side by the factory passed
  * to [[Multimodal.extractFeatures]]), batches submitted whole — the
  * boundary where a JPEG/ffmpeg/JNI codec plugs in. */
trait MediaDecoder extends Serializable {
  def decodeBatch(batch: Seq[Multimodal.MediaRecord]): Seq[Multimodal.MediaFeatures]
}

object StubDecoder extends MediaDecoder {
  /** Batch entry point (the Arrow-batch analogue): a real codec would
    * submit the whole batch to the device/library at once. */
  def decodeBatch(batch: Seq[Multimodal.MediaRecord]): Seq[Multimodal.MediaFeatures] =
    batch.map(decode)

  def decode(r: Multimodal.MediaRecord): Multimodal.MediaFeatures = {
    val n = r.media.length.toLong
    val first = if (n > 0) (r.media(0) & 0xff).toDouble else 0.0
    val last = if (n > 0) (r.media(n.toInt - 1) & 0xff).toDouble else 0.0
    Multimodal.MediaFeatures(
      r.doc_id, n, r.media_type, r.width, r.height,
      n.toDouble + first / 256.0 + last / 65536.0)
  }
}
