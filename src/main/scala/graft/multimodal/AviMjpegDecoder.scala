package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** REAL video decoder for MJPEG-in-AVI — zero external dependencies: the
  * AVI container is a plain RIFF chunk tree (a ~40-line parse), and each
  * MJPEG frame payload is an ordinary JPEG the JDK's `javax.imageio`
  * already decodes. Closes the last multimodal caveat (round 9 images,
  * round 10 audio, this round video) without any codec library.
  *
  * Container walk: `RIFF('AVI ' …)` → `LIST('movi' …)` → stream chunks
  * `##dc`/`##db` (compressed/uncompressed video data, possibly nested in
  * `LIST('rec ')` groups for interleaved files). Chunk sizes are
  * little-endian and data is word-aligned (odd sizes carry a pad byte) —
  * both honored, both the classic parser bugs.
  *
  * Feature mapping onto the fixed [[Multimodal.MediaFeatures]] row:
  *  - `width`/`height` = first decoded frame's dimensions,
  *  - `feature` = mean over decoded frames of the per-frame mean BT.601
  *    luma in [0, 1] (the frame-averaged brightness — the "mean frame
  *    RMS" statistic of a video QC pass).
  * [[AviMjpegDecoder.frameCount]] exposes the frame tally for callers
  * needing the second statistic (mirrors [[WavDecoder.durationSeconds]]).
  *
  * Drop contract as everywhere in this package: payloads that are not a
  * RIFF/AVI, contain no video chunks, or whose frames all fail JPEG
  * decode return None — never a task failure. [[StubDecoder]] remains the
  * gate/oracle default (real pixel stats are not SQL-replicable).
  */
class AviMjpegDecoder extends MediaDecoder {
  ImageIoDecoder.init() // same process-global ImageIO cache setting

  override def decodeBatch(batch: Seq[Multimodal.MediaRecord]): Seq[Multimodal.MediaFeatures] =
    batch.flatMap(decode)

  /** None when the payload is not an AVI with at least one decodable
    * MJPEG frame. Frames decode ONE AT A TIME into a running
    * (count, lumaSum, firstDims) fold — a strict Seq[BufferedImage] of
    * every decoded raster would hold minutes of uncompressed video on
    * the heap at once (a 1080p frame is ~8 MB decoded; thousands of
    * frames × batch concurrency = executor OOM, which breaks the
    * never-a-task-failure contract this decoder exists to honor). */
  def decode(r: Multimodal.MediaRecord): Option[Multimodal.MediaFeatures] = {
    var n = 0
    var lumaSum = 0.0
    var w = 0
    var h = 0
    AviMjpegDecoder.framePayloads(r.media).getOrElse(Seq.empty).foreach { bytes =>
      val img =
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }
      img.foreach { f =>
        if (n == 0) { w = f.getWidth; h = f.getHeight }
        lumaSum += ImageIoDecoder.meanLuma(f)
        n += 1
      }
    }
    if (n == 0) None
    else Some(Multimodal.MediaFeatures(
      r.doc_id, r.media.length.toLong, r.media_type, w, h, lumaSum / n))
  }

  /** Video-stream chunk count (frames in container, decodable or not);
    * None when the payload is not an AVI. */
  def frameCount(r: Multimodal.MediaRecord): Option[Int] =
    AviMjpegDecoder.framePayloads(r.media).map(_.length)
}

object AviMjpegDecoder {

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(b: Array[Byte], off: Long): Long = {
    val o = off.toInt
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  private val videoChunk = "\\d\\dd[bc]".r

  /** Raw `##dc`/`##db` payloads of the movi list, in container order.
    * None when the bytes are not a RIFF/AVI. */
  def framePayloads(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
      return None
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4))
    val out = Seq.newBuilder[Array[Byte]]

    // Walk one chunk run [off, end); collect video chunks when inside the
    // movi list (or a rec-group within it), descend into LIST chunks.
    def walk(start: Long, end: Long, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(bytes, off.toInt)
        val size = u32(bytes, off + 4)
        val dataOff = off + 8
        val dataEnd = math.min(dataOff + size, end)
        if (id == "LIST" && dataEnd - dataOff >= 4) {
          val listType = fourcc(bytes, dataOff.toInt)
          // entering movi flips the flag on; rec-groups inside movi (and
          // any other nested list) inherit it
          walk(dataOff + 4, dataEnd, inMovi || listType == "movi")
        } else if (inMovi && videoChunk.matches(id) && dataEnd > dataOff) {
          out += java.util.Arrays.copyOfRange(bytes, dataOff.toInt, dataEnd.toInt)
        }
        off = dataOff + size + (size & 1L) // word alignment: odd sizes pad
      }
    }
    walk(12L, riffEnd, inMovi = false)
    Some(out.result())
  }

  /** Minimal MJPEG-AVI writer (test/spec aid): a structurally-valid RIFF
    * with an avih header and one `00dc` chunk per JPEG payload. */
  def write(jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.write(le32(data.length))
      b.write(data)
      if (data.length % 2 == 1) b.write(0) // pad byte
      b.toByteArray
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi",
      jpegFrames.flatMap(f => chunk("00dc", f).toIndexedSeq).toArray)
    val body = "AVI ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ hdrl ++ movi
    bos.write("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bos.write(le32(body.length))
    bos.write(body)
    bos.toByteArray
  }
}
