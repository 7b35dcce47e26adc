package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

/** REAL audio decoder over the JDK's own `javax.sound.sampled` — zero
  * external dependencies (WAV/AIFF/AU PCM readers ship with every JDK 17).
  * Closes the "images only" caveat of round 9 the same way
  * [[ImageIoDecoder]] did for images: actual header parse, actual sample
  * decode, a real signal statistic as the feature.
  *
  * Feature mapping onto the shared [[Multimodal.MediaFeatures]] row
  * (documented, not overloaded: the row is the pipeline's fixed schema):
  *  - `width`  = sample rate in Hz,
  *  - `height` = channel count,
  *  - `feature` = RMS level of the normalized samples in [0, 1]
  *    (a 440 Hz sine at amplitude a has RMS a/√2 — asserted in spec).
  * Duration is `n_frames / rate`; [[WavDecoder.durationSeconds]] exposes
  * it for callers that need the second statistic.
  *
  * Decode failures follow the [[ImageIoDecoder]] drop contract: payloads
  * the JDK cannot parse (text blobs, truncated RIFF headers,
  * non-PCM encodings) return None and are dropped — never a task failure.
  * [[StubDecoder]] remains the gate/oracle default (byte-replicable in
  * SQL; real sample stats are not).
  */
class WavDecoder extends MediaDecoder {

  override def decodeBatch(batch: Seq[Multimodal.MediaRecord]): Seq[Multimodal.MediaFeatures] =
    batch.flatMap(decode)

  /** None when the payload is not decodable PCM audio. */
  def decode(r: Multimodal.MediaRecord): Option[Multimodal.MediaFeatures] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.media))
      try {
        val fmt = in.getFormat
        WavDecoder.rms(in.readAllBytes(), fmt).map { rmsLevel =>
          Multimodal.MediaFeatures(
            r.doc_id, r.media.length.toLong, r.media_type,
            fmt.getSampleRate.toInt, fmt.getChannels, rmsLevel)
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Duration in seconds (frames / rate); None when undecodable. */
  def durationSeconds(r: Multimodal.MediaRecord): Option[Double] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.media))
      try {
        val frames = in.getFrameLength
        val rate = in.getFormat.getFrameRate
        if (frames >= 0 && rate > 0) Some(frames / rate.toDouble) else None
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
}

object WavDecoder {

  /** Decode a WAV/AIFF/AU payload to the normalized [-1, 1] sample stream
    * (interleaved channels) — the [[graft.multimodal.Multimodal
    * .audioFingerprint]] input. None for undecodable payloads or
    * unsupported encodings (the same support matrix as [[rms]]). */
  private[multimodal] def normalizedSamples(payload: Array[Byte]): Option[Array[Double]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val pcm = in.readAllBytes()
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        if (enc == AudioFormat.Encoding.PCM_SIGNED && bits == 16) {
          val n = pcm.length / 2
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            val b0 = pcm(2 * i) & 0xff
            val b1 = pcm(2 * i + 1) & 0xff
            val s = (if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
            out(i) = s / 32768.0
            i += 1
          }
          Some(out)
        } else if (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8) {
          Some(pcm.map(b => ((b & 0xff) - 128) / 128.0))
        } else None
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** RMS of the PCM sample stream normalized to [-1, 1]. Supports the two
    * encodings the JDK WAV reader actually emits: 16-bit signed and
    * 8-bit unsigned PCM (any channel count — RMS over the interleaved
    * stream). None for other sample sizes/encodings. */
  private[multimodal] def rms(pcm: Array[Byte], fmt: AudioFormat): Option[Double] = {
    val bits = fmt.getSampleSizeInBits
    val enc = fmt.getEncoding
    if (enc == AudioFormat.Encoding.PCM_SIGNED && bits == 16) {
      val n = pcm.length / 2
      if (n == 0) return Some(0.0)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val b0 = pcm(2 * i) & 0xff // first byte: WAV little-endian, AIFF big
        val b1 = pcm(2 * i + 1) & 0xff
        val s = (if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
        val v = s / 32768.0
        acc += v * v
        i += 1
      }
      Some(math.sqrt(acc / n))
    } else if (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8) {
      val n = pcm.length
      if (n == 0) return Some(0.0)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val v = ((pcm(i) & 0xff) - 128) / 128.0
        acc += v * v
        i += 1
      }
      Some(math.sqrt(acc / n))
    } else None
  }
}
