package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with a typed metadata struct, exactly
  * as a 100 TB training-data pipeline would carry them (payload pruned
  * unless projected; metadata usable for partition pruning and filtering).
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries — see build brief): [[StubDecoder]] is a deterministic fake
  * that stands in for e.g. a JPEG decode + feature extraction. Everything
  * around it — schema, batched `mapPartitions` execution, partitioning —
  * is real and is what a production decoder would plug into.
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
    * the exact execution shape (and batch size economics) of a Pandas-UDF /
    * JNI decoder. Swap [[StubDecoder.decode]] for a real codec. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      // A real implementation would initialize the codec ONCE per partition
      // here (model load / JNI handle), then stream records through it.
      val decoder = StubDecoder
      batch.map(decoder.decode)
    }
  }
}

/** Deterministic stand-in for a media codec: "features" derived from bytes
  * only (length + first/last byte), so any engine can replicate them. */
object StubDecoder extends Serializable {
  def decode(r: Multimodal.MediaRecord): Multimodal.MediaFeatures = {
    val n = r.media.length.toLong
    val first = if (n > 0) (r.media(0) & 0xff).toDouble else 0.0
    val last = if (n > 0) (r.media(n.toInt - 1) & 0xff).toDouble else 0.0
    Multimodal.MediaFeatures(
      r.doc_id, n, r.media_type, r.width, r.height,
      n.toDouble + first / 256.0 + last / 65536.0)
  }
}
