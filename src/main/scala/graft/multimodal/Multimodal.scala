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
                     textCol: String = "text",
                     idOffset: Long = 0L, jitter: Int = 0,
                     noisy: Boolean = false): DataFrame = {
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
              // `jitter` perturbs ONLY the top-left pixel: the emitted id
              // is offset but the PIXELS are those of the base image plus
              // one localized change — a planted near-duplicate for the
              // perceptual-hash gate (a real pipeline's re-encoded or
              // lightly-edited copy). `noisy` swaps the smooth gradient
              // for a per-pixel integer mix: gradient images all share a
              // near-constant dHash (every x-step adds 7), so the
              // perceptual-hash gate needs images whose hashes SEPARATE —
              // like real photos do — for planted pairs to stand out.
              val j = if (jitter != 0 && x == 0 && y == 0) jitter else 0
              val v =
                if (noisy) {
                  // joint murmur-style finalizer: an XOR-of-per-coordinate
                  // mixes decomposes (v = K ^ X(x) ^ Y(y)), making images
                  // that share one key byte hash-identical — multiply-mix
                  // the combined coordinate instead
                  var m = id * 0x9E3779B97F4A7C15L + x * 0xC2B2AE3D27D4EB4FL +
                    y * 0x165667B19E3779F9L + len * 0x27D4EB2F165667C5L
                  m ^= m >>> 33; m *= 0xFF51AFD7ED558CCDL; m ^= m >>> 33
                  ((m & 0xFF).toInt + j) & 0xFF
                } else ((id * 31 + x * 7 + y * 13 + len + j) & 0xFF).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id + idOffset, bos.toByteArray, "image/png", w, h)
        }
      }.toDF()
  }

  /** 64-bit difference hash (dHash — the standard perceptual image
    * fingerprint: Krawetz's gradient hash, the pHash-family member real
    * image-dedup pipelines run first): decode, sample to a 9×8 grayscale
    * grid with integer nearest-neighbor arithmetic (deterministic across
    * JVMs — no AWT filtering in the hash path), emit one bit per
    * horizontal gradient (left < right). Near-identical images — crops
    * aside — differ in a few bits; Hamming distance ranks the match.
    * Undecodable payloads drop (the package contract).
    *
    * Scale shape: pure mapPartitions over the media scan — the decode
    * distributes like any codec pass, no shuffle, no driver state. */
  def dHash(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(F.col("media").isNotNull)
      .select(F.col("doc_id").cast("long"), F.col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIoDecoder.init()
        it.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null || img.getWidth < 1 || img.getHeight < 1) Iterator.empty
          else {
            val gw = 9; val gh = 8
            val g = new Array[Int](gw * gh)
            var y = 0
            while (y < gh) {
              var x = 0
              while (x < gw) {
                val sx = x * img.getWidth / gw
                val sy = y * img.getHeight / gh
                val rgb = img.getRGB(sx, sy)
                val r = (rgb >> 16) & 0xFF; val gr = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
                g(y * gw + x) = (r * 299 + gr * 587 + b * 114) / 1000
                x += 1
              }
              y += 1
            }
            var hash = 0L
            var bit = 0
            y = 0
            while (y < gh) {
              var x = 0
              while (x < 8) {
                if (g(y * gw + x) < g(y * gw + x + 1)) hash |= (1L << bit)
                bit += 1
                x += 1
              }
              y += 1
            }
            Iterator.single((id, hash))
          }
        }
      }
      .toDF("doc_id", "dhash")
  }

  /** Attach REAL WAV payloads (the [[attachPngMedia]] counterpart for the
    * audio modality): each doc renders to ~0.2 s of 16-bit mono PCM — a
    * sine carrier whose per-window amplitude ENVELOPE is a deterministic
    * per-doc integer mix (a pure tone's flat envelope would carry no
    * fingerprint signal), written through the JDK's actual WAV encoder.
    * `jitterWindow >= 0` perturbs ONE envelope window (a lightly-edited
    * copy — the planted near-duplicate for the fingerprint gate);
    * `idOffset` offsets the emitted ids. */
  def attachWavMedia(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     idOffset: Long = 0L, jitterWindow: Int = -1): DataFrame = {
    import docs.sparkSession.implicits._
    val rate = 8000f
    val nWin = 65
    val perWin = 24 // samples per envelope window (~0.195 s total)
    docs
      .filter(F.col(idCol).isNotNull && F.col(textCol).isNotNull)
      .select(F.col(idCol).cast("long"), F.length(F.col(textCol)).cast("int"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.map { case (id, len0) =>
          val len = math.max(len0, 0)
          val n = nWin * perWin
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val w = i / perWin
            var m = id * 0x9E3779B97F4A7C15L + w * 0xC2B2AE3D27D4EB4FL +
              len * 0x165667B19E3779F9L
            m ^= m >>> 33; m *= 0xFF51AFD7ED558CCDL; m ^= m >>> 33
            // envelope in [0.1, 0.85], one perturbed window for the copy
            var env = 0.1 + (m & 0xFF).toInt / 340.0
            if (w == jitterWindow) env = math.min(0.9, env + 0.08)
            val hz = 200.0 + (id % 40) * 20.0
            val s = (env * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt.toShort
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          MediaRecord(id + idOffset, out.toByteArray, "audio/wav", 0, 0)
        }
      }.toDF()
  }

  /** 64-bit energy-difference audio fingerprint — the Haitsma–Kalker
    * fingerprint shape reduced to the time-energy envelope (the
    * band-split FFT stage needs codec/DSP libs this container lacks; the
    * gradient-bit construction, the part that makes it a robust HASH, is
    * faithful): decode real PCM through the JDK reader, split the
    * normalized sample stream into 65 equal windows, mean |amplitude|
    * per window, one bit per adjacent-window energy gradient. Loudness
    * scaling shifts all windows together so bits survive; localized
    * edits flip only nearby bits — Hamming distance ranks the match.
    * Payloads that fail to decode, carry an unsupported encoding, or are
    * shorter than 65 windows drop (the package contract). */
  def audioFingerprint(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    val nWin = 65
    media
      .filter(F.col("media").isNotNull)
      .select(F.col("doc_id").cast("long"), F.col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          WavDecoder.normalizedSamples(bytes) match {
            case Some(v) if v.length >= nWin =>
              val e = new Array[Double](nWin)
              var w = 0
              while (w < nWin) {
                val s = w * v.length / nWin
                val t = (w + 1) * v.length / nWin
                var acc = 0.0
                var i = s
                while (i < t) { acc += math.abs(v(i)); i += 1 }
                e(w) = if (t > s) acc / (t - s) else 0.0
                w += 1
              }
              var hash = 0L
              var b = 0
              while (b < 64) {
                if (e(b) < e(b + 1)) hash |= (1L << b)
                b += 1
              }
              Iterator.single((id, hash))
            case _ => Iterator.empty
          }
        }
      }
      .toDF("doc_id", "afp")
  }

  /** Audio near-duplicate pairs by energy fingerprint — the image
    * [[imageNearDups]] machinery on the audio modality (the SAME shared
    * banded Hamming bucket join): re-encoded or lightly-edited copies
    * share a fingerprint within a few bits while byte hashes differ. */
  def audioNearDups(media: DataFrame, maxHamming: Int = 6,
                    bands: Int = 8): DataFrame =
    graft.dedup.Dedup.hashBandCandidates(
      audioFingerprint(media), "doc_id", "afp", maxHamming, bands)

  /** Image near-duplicate pairs by perceptual hash: [[dHash]] each image,
    * then the banded Hamming bucket join
    * ([[graft.dedup.Dedup.hashBandCandidates]] — the simhash machinery on
    * a different modality; by pigeonhole, `bands` = 8 catches every pair
    * within Hamming 7, verified exactly with one bit_count(xor)). The
    * image-dedup step multimodal training corpora run after exact byte
    * dedup: re-encoded, resized, or lightly-edited copies share a dhash
    * within a few bits while byte hashes differ. */
  def imageNearDups(media: DataFrame, maxHamming: Int = 6,
                    bands: Int = 8): DataFrame =
    graft.dedup.Dedup.hashBandCandidates(
      dHash(media), "doc_id", "dhash", maxHamming, bands)

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
