package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** REAL image decoder over the JDK's own `javax.imageio` — zero external
  * dependencies (PNG, JPEG, BMP, GIF, WBMP ship with every JDK 17).
  *
  * This is the production implementation of the [[MediaDecoder]] contract
  * that [[StubDecoder]] stands in for on non-image payloads: actual
  * decode → actual dimensions → a pixel statistic (mean ITU-R BT.601 luma
  * in [0, 1]) as the extracted feature, with an optional REAL resize
  * (bilinear `Graphics2D.drawImage` onto a fresh [[BufferedImage]])
  * applied before the stats.
  *
  * Per-partition economics are exactly the [[Multimodal.extractFeatures]]
  * contract: construct one instance per partition via the factory (codec
  * tables, color models and `ImageIO` plugin lookup are amortized), then
  * stream batches through it. Payloads `ImageIO` cannot decode (text
  * blobs, truncated files) are DROPPED — the standard multimodal-pipeline
  * convention of filtering undecodable media at extraction, which is why
  * [[Multimodal.MediaFeatures]] rows out may be fewer than records in.
  * The deterministic [[StubDecoder]] remains the gate/oracle default
  * (its features are byte-replicable in SQL; real pixel stats are not).
  *
  */
class ImageIoDecoder(resizeTo: Option[(Int, Int)] = None) extends MediaDecoder {
  ImageIoDecoder.init() // force the once-only companion initializer

  override def decodeBatch(batch: Seq[Multimodal.MediaRecord]): Seq[Multimodal.MediaFeatures] =
    batch.flatMap(decode)

  /** None when the payload is not a decodable image — BOTH the
    * unrecognized-format case (`ImageIO.read` returns null) and the
    * recognized-but-corrupt case (a truncated PNG/JPEG makes the codec
    * THROW `IIOException` mid-read). Dropping the latter matters on a
    * real corpus: one corrupt payload must not fail the task and, after
    * retries, the whole job. */
  def decode(r: Multimodal.MediaRecord): Option[Multimodal.MediaFeatures] =
    try {
      val raw = ImageIO.read(new ByteArrayInputStream(r.media))
      if (raw == null) None
      else {
        val img = resizeTo match {
          case Some((w, h)) => ImageIoDecoder.resize(raw, w, h)
          case None => raw
        }
        Some(Multimodal.MediaFeatures(
          r.doc_id, r.media.length.toLong, r.media_type,
          img.getWidth, img.getHeight, ImageIoDecoder.meanLuma(img)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}

object ImageIoDecoder {

  // The default disk-backed stream cache writes every image to a temp
  // file — pure overhead for in-memory byte-array decodes on executors.
  // Flipping it mutates PROCESS-GLOBAL JVM state (every ImageIO user in
  // this JVM sees it), so it runs exactly once, at companion class-load,
  // not per partition-instance.
  ImageIO.setUseCache(false)

  /** Touching the companion from the class constructor guarantees the
    * global-state initializer above has run before the first decode. */
  private[multimodal] def init(): Unit = ()

  /** Real bilinear resize on the JDK raster pipeline. */
  def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    require(w > 0 && h > 0, s"resize target must be positive, got ${w}x$h")
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** Mean BT.601 luma over all pixels, normalized to [0, 1].
    * Accumulated in integers (exact) and divided once. */
  def meanLuma(img: BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    if (w == 0 || h == 0) return 0.0
    // 1000x-scaled integer BT.601 weights: exact, overflow-safe
    // (maxLuma per pixel 255000; Long holds ~3.6e13 pixels).
    var acc = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        acc += 299L * r + 587L * g + 114L * b
        x += 1
      }
      y += 1
    }
    acc.toDouble / (1000.0 * 255.0 * w * h)
  }
}
