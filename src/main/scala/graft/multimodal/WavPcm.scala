package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM WAV/PCM codec — the REAL audio decoder behind
  * [[WavPcmDecoder]] (retiring the all-stub decode story: audio now
  * decodes actual RIFF/WAVE payloads; image/video remain stubbed because
  * this container ships no codec libraries).
  *
  * Scope: the canonical RIFF/WAVE container with linear PCM samples
  * (format code 1) at 8 or 16 bits — the format every recorder and
  * `ffmpeg -f wav` can emit, parseable from the public spec with zero
  * dependencies. The chunk walk honors word alignment and skips unknown
  * chunks (LIST/INFO metadata etc.), so real-world files decode, not
  * just the happy 44-byte-header path.
  */
object WavPcm {

  /** Decoded waveform: interleaved channels, samples normalized to
    * [-1, 1]. */
  final case class Wav(channels: Int, sampleRateHz: Int, bitsPerSample: Int,
      samples: Array[Float])

  /** Parse a RIFF/WAVE byte payload. Throws IllegalArgumentException on
    * anything that is not a PCM WAV — a decoder must be loud about
    * payloads it would silently misread. */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, "payload shorter than a RIFF header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, US_ASCII)
    require(tag(0) == "RIFF" && tag(8) == "WAVE",
      s"not a RIFF/WAVE payload (got '${tag(0)}'/'${tag(8)}')")
    var pos = 12
    var fmt = Option.empty[(Int, Int, Int, Int)] // format, ch, rate, bits
    var data = Option.empty[(Int, Int)]          // offset, size
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val size = bb.getInt(pos + 4)
      require(size >= 0, s"negative chunk size in '$id'")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16 && body + 16 <= bytes.length, "truncated fmt chunk")
          fmt = Some((bb.getShort(body) & 0xffff,
            bb.getShort(body + 2) & 0xffff,
            bb.getInt(body + 4),
            bb.getShort(body + 14) & 0xffff))
        case "data" => data = Some((body, size)) // truncation clamped below
        case _ => // LIST, fact, cue … — skipped, but bounded like Png's
          // chunk walk: a declared size past the payload is hostile input
          // and must be an IAE, never a silent skip or a wrapped index
          require(size <= bytes.length - body,
            s"chunk '$id' overruns payload ($size > ${bytes.length - body})")
      }
      // word-aligned advance in Long: a size near Int.MaxValue must
      // terminate the walk, never wrap pos negative into tag() territory
      pos = math.min(body.toLong + size.toLong + (size & 1),
        bytes.length.toLong).toInt
    }
    val (audioFormat, channels, rate, bits) =
      fmt.getOrElse(throw new IllegalArgumentException("no fmt chunk"))
    require(audioFormat == 1, s"only linear PCM (format 1), got $audioFormat")
    require(bits == 8 || bits == 16, s"only 8/16-bit PCM, got $bits-bit")
    require(channels > 0 && rate > 0, s"bad fmt: channels=$channels rate=$rate")
    val (off, declared) =
      data.getOrElse(throw new IllegalArgumentException("no data chunk"))
    // tolerate truncation; Long arithmetic so a hostile declared size
    // can't wrap (off + declared) negative and fake an empty data chunk
    val end = math.min(off.toLong + declared.toLong, bytes.length.toLong).toInt
    val samples =
      if (bits == 16) {
        val n = math.max(end - off, 0) / 2
        val out = new Array[Float](n)
        var i = 0
        while (i < n) { out(i) = bb.getShort(off + 2 * i) / 32768.0f; i += 1 }
        out
      } else {
        val n = math.max(end - off, 0)
        val out = new Array[Float](n)
        var i = 0
        while (i < n) { out(i) = ((bytes(off + i) & 0xff) - 128) / 128.0f; i += 1 }
        out
      }
    Wav(channels, rate, bits, samples)
  }

  /** (channels, sampleRateHz, bitsPerSample, nFrames) from the chunk
    * walk ALONE — constant work, no sample allocation: the pre-decode
    * ADMISSION read (the [[Png.dims]] analogue). A quality gate rejects
    * under-floor durations and over-ceiling payloads from these four
    * numbers before paying a full sample parse. nFrames counts the
    * frames actually PRESENT (truncation clamped, like [[decode]]), so
    * duration = nFrames / rate reflects the bytes on disk, not a
    * hostile declared size. Throws on anything that is not a PCM WAV —
    * same loudness contract as the decoder. */
  def info(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    require(bytes.length >= 12, "payload shorter than a RIFF header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, US_ASCII)
    require(tag(0) == "RIFF" && tag(8) == "WAVE",
      s"not a RIFF/WAVE payload (got '${tag(0)}'/'${tag(8)}')")
    var pos = 12
    var fmt = Option.empty[(Int, Int, Int, Int)]
    var data = Option.empty[(Int, Int)]
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val size = bb.getInt(pos + 4)
      require(size >= 0, s"negative chunk size in '$id'")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16 && body + 16 <= bytes.length,
            "truncated fmt chunk")
          fmt = Some((bb.getShort(body) & 0xffff,
            bb.getShort(body + 2) & 0xffff,
            bb.getInt(body + 4),
            bb.getShort(body + 14) & 0xffff))
        case "data" => data = Some((body, size))
        case _ =>
          require(size <= bytes.length - body,
            s"chunk '$id' overruns payload ($size > ${bytes.length - body})")
      }
      pos = math.min(body.toLong + size.toLong + (size & 1),
        bytes.length.toLong).toInt
    }
    val (audioFormat, channels, rate, bits) =
      fmt.getOrElse(throw new IllegalArgumentException("no fmt chunk"))
    require(audioFormat == 1, s"only linear PCM (format 1), got $audioFormat")
    require(bits == 8 || bits == 16, s"only 8/16-bit PCM, got $bits-bit")
    require(channels > 0 && rate > 0, s"bad fmt: channels=$channels rate=$rate")
    val (off, declared) =
      data.getOrElse(throw new IllegalArgumentException("no data chunk"))
    val end = math.min(off.toLong + declared.toLong, bytes.length.toLong)
    val nSamples = math.max(end - off, 0L) / (bits / 8)
    (channels, rate, bits, nSamples / channels)
  }

  /** Write a 16-bit PCM WAV (canonical 44-byte header) — the encode half
    * that makes the decoder round-trip-testable and gives pipelines a
    * way to materialize audio columns. Samples are clamped to [-1, 1]. */
  def encodePcm16(samples: Array[Float], sampleRateHz: Int,
      channels: Int): Array[Byte] = {
    require(channels > 0 && sampleRateHz > 0, "bad encode params")
    val dataSize = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataSize)
      .put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRateHz)
      .putInt(sampleRateHz * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes(US_ASCII)).putInt(dataSize)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1.0f, math.min(1.0f, samples(i)))
      bb.putShort(math.round(v * 32767.0f).toShort)
      i += 1
    }
    bb.array()
  }
}

/** Real codec-backed [[MediaDecoder]] for audio payloads: decodes the
  * RIFF/WAVE container and summarizes the waveform as `featureDim`
  * equal-width time bins of RMS energy — the standard energy-envelope
  * feature a data-curation pass filters on (silence/clipping detection,
  * loudness bucketing). Deterministic: the bin sums run in sample order
  * with no parallel float reduction. */
object WavPcmDecoder extends MediaDecoder {
  val featureDim = 8
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
    val wav = WavPcm.decode(payload)
    val n = wav.samples.length
    val out = new Array[Float](featureDim)
    if (n == 0) return out
    val sums = new Array[Double](featureDim)
    val counts = new Array[Int](featureDim)
    var i = 0
    while (i < n) {
      val b = ((i.toLong * featureDim) / n).toInt
      val s = wav.samples(i)
      sums(b) += s.toDouble * s.toDouble
      counts(b) += 1
      i += 1
    }
    var b = 0
    while (b < featureDim) {
      out(b) = if (counts(b) == 0) 0.0f
               else math.sqrt(sums(b) / counts(b)).toFloat
      b += 1
    }
    out
  }
}
