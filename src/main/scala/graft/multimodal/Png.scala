package graft.multimodal

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — the REAL image decoder behind [[PngDecoder]]
  * (with [[WavPcm]] for audio, this retires the image half of the stub
  * decode story; only video container parsing remains stubbed).
  *
  * Scope: non-interlaced 8-bit-per-sample PNGs in grayscale (color type
  * 0), gray+alpha (4), truecolor RGB (2), and RGBA (6) — the shapes
  * `libpng`/`ffmpeg`/Pillow emit by default. Everything needed is in the
  * JDK: `Inflater` for the zlib IDAT stream, `CRC32` for chunk checksums.
  * Paletted (3) and sub-8-bit images are rejected loudly rather than
  * silently misread; CRCs are verified on the chunks we consume.
  */
object Png {

  private val Signature = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Decoded image: `pixels` is row-major interleaved samples, one byte
    * per sample, `channels` samples per pixel. */
  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** Deterministic box-average resize in pure integer arithmetic: each
    * output pixel averages (floor division) the input box
    * `[x·W/newW, (x+1)·W/newW) × [y·H/newH, (y+1)·H/newH)` per channel;
    * a degenerate box (upscale) collapses to the nearest source pixel.
    * Integer-exact, so resized rasters are bit-identical across JVMs,
    * partitionings and architectures — the property a float bilinear
    * kernel cannot give a checked pipeline. The downscale every training
    * ingest needs (thumbnail/normalize-resolution) without an image
    * dependency. */
  def resizeBox(img: Image, newW: Int, newH: Int): Image = {
    require(newW > 0 && newH > 0, s"bad resize target ${newW}x$newH")
    val (w, h, c) = (img.width, img.height, img.channels)
    val out = new Array[Byte](newW * newH * c)
    var y = 0
    while (y < newH) {
      val y0 = y * h / newH
      val y1 = math.max(((y + 1) * h / newH), y0 + 1)
      var x = 0
      while (x < newW) {
        val x0 = x * w / newW
        val x1 = math.max(((x + 1) * w / newW), x0 + 1)
        var ch = 0
        while (ch < c) {
          var sum = 0L; var n = 0
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              sum += img.pixels((yy * w + xx) * c + ch) & 0xff
              n += 1; xx += 1
            }
            yy += 1
          }
          out((y * newW + x) * c + ch) = (sum / n).toByte
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    Image(newW, newH, c, out)
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case 3 => throw new IllegalArgumentException(
      "paletted PNG (color type 3) not supported")
    case t => throw new IllegalArgumentException(s"bad PNG color type $t")
  }

  /** (width, height) from the IHDR alone — constant work, no inflate,
    * no raster allocation: the pre-decode ADMISSION read. A quality
    * gate rejects under-floor and over-ceiling payloads from these 8
    * header bytes, so a decompression bomb (tiny IDAT declaring a huge
    * raster) never reaches [[decode]]'s allocation, and an undersized
    * thumbnail never pays an inflate just to be dropped. The IHDR is
    * REQUIRED to be the first chunk by the PNG spec, so offsets are
    * fixed; integrity of the pixel stream is still [[decode]]'s job. */
  def dims(bytes: Array[Byte]): (Int, Int) = {
    require(bytes.length >= 24 &&
      (0 until 8).forall(i => bytes(i) == Signature(i)),
      "not a PNG payload (bad signature)")
    require(new String(bytes, 12, 4, US_ASCII) == "IHDR",
      "first chunk is not IHDR")
    val bb = ByteBuffer.wrap(bytes)
    (bb.getInt(16), bb.getInt(20))
  }

  /** Parse a PNG byte payload: chunk walk (CRC-verified), concatenated
    * IDAT inflate, scanline unfilter. Throws IllegalArgumentException on
    * anything that is not a supported PNG — a decoder must be loud about
    * payloads it would silently misread. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == Signature(i)),
      "not a PNG payload (bad signature)")
    val bb = ByteBuffer.wrap(bytes) // PNG ints are big-endian (BB default)
    var pos = 8
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (pos + 8 <= bytes.length && !sawEnd) {
      val len = bb.getInt(pos)
      // bound as `len <= remaining` (not `pos+12+len <= length`) so a
      // hostile length near Int.MaxValue cannot wrap the sum negative
      require(len >= 0 && len <= bytes.length - pos - 12,
        s"truncated PNG chunk at offset $pos")
      val typ = new String(bytes, pos + 4, 4, US_ASCII)
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len != 13")
          verifyCrc(bytes, pos, len)
          width = bb.getInt(pos + 8)
          height = bb.getInt(pos + 12)
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val compression = bytes(pos + 18) & 0xff
          val filterMethod = bytes(pos + 19) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(bitDepth == 8, s"only 8-bit PNG supported, got $bitDepth-bit")
          require(compression == 0 && filterMethod == 0,
            s"unknown compression/filter method $compression/$filterMethod")
          require(interlace == 0, "interlaced (Adam7) PNG not supported")
          require(width > 0 && height > 0, s"bad dims ${width}x$height")
          channels = channelsOf(colorType)
          // a hostile IHDR must fail loudly here, not as a negative/huge
          // array allocation downstream: bound the raster size so the
          // (stride+1)*height arithmetic stays inside Int
          require((width.toLong * channels + 1) * height < Int.MaxValue,
            s"raster ${width}x$height/$channels exceeds decoder bounds")
        case "IDAT" =>
          verifyCrc(bytes, pos, len)
          idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // tEXt, pHYs, gAMA … — skip (ancillary)
      }
      pos += 12 + len
    }
    require(width > 0, "no IHDR chunk")
    require(idat.size > 0, "no IDAT data")
    val stride = width * channels
    val raw = inflate(idat.toByteArray, (stride + 1) * height)
    require(raw.length == (stride + 1) * height,
      s"inflated ${raw.length} bytes, expected ${(stride + 1) * height}")
    Image(width, height, channels, unfilter(raw, width, height, channels))
  }

  private def verifyCrc(bytes: Array[Byte], chunkPos: Int, len: Int): Unit = {
    val crc = new CRC32()
    crc.update(bytes, chunkPos + 4, 4 + len) // type + data
    val stored = ByteBuffer.wrap(bytes).getInt(chunkPos + 8 + len)
    require(crc.getValue.toInt == stored,
      f"PNG chunk CRC mismatch at offset $chunkPos")
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    try {
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException("truncated IDAT zlib stream")
        off += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt IDAT zlib stream: $e")
    } finally inf.end()
    if (off < expected) java.util.Arrays.copyOf(out, off) else out
  }

  /** Reverse per-scanline filters (spec §6: None/Sub/Up/Average/Paeth).
    * `raw` is height rows of [filterByte ++ stride bytes]. */
  private def unfilter(raw: Array[Byte], width: Int, height: Int,
      channels: Int): Array[Byte] = {
    val stride = width * channels
    val out = new Array[Byte](stride * height)
    val bpp = channels // 8-bit samples: bytes-per-pixel == channels
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xff
        val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val up = if (y > 0) out(dst - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) out(dst - stride + x - bpp) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, upLeft)
          case f => throw new IllegalArgumentException(s"bad PNG filter $f in row $y")
        }
        out(dst + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Write a non-interlaced 8-bit PNG (filter 0 on every row, one IDAT)
    * — the encode half that makes the decoder round-trip-testable and
    * gives pipelines a way to materialize image columns. `pixels` is
    * row-major interleaved, `channels` ∈ {1, 2, 3, 4}. */
  def encode(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(Set(1, 2, 3, 4)(channels), s"bad channel count $channels")
    require(pixels.length == width * height * channels,
      s"pixels length ${pixels.length} != ${width * height * channels}")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    }
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) { // filter byte 0 + row copy
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) comp.write(buf, 0, def_.deflate(buf))
    def_.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", comp.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val t = typ.getBytes(US_ASCII)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    val bb = ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
    out.write(bb.array(), 0, bb.capacity())
  }
}

/** Real codec-backed [[MediaDecoder]] for image payloads: decodes the PNG
  * container and summarizes the raster as per-channel mean and standard
  * deviation (up to 4 channels → 8 floats, normalized to [0, 1]) — the
  * brightness/contrast features a curation pass filters on (all-black
  * frames, low-contrast scans, alpha-only sprites). Deterministic: sample
  * sums run in pixel order with no parallel float reduction. */
object PngDecoder extends MediaDecoder {
  val featureDim = 8
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
    val img = Png.decode(payload)
    val out = new Array[Float](featureDim)
    val n = img.width.toLong * img.height
    var c = 0
    while (c < img.channels) {
      var sum = 0.0; var sumSq = 0.0
      var i = c
      while (i < img.pixels.length) {
        val v = (img.pixels(i) & 0xff) / 255.0
        sum += v; sumSq += v * v
        i += img.channels
      }
      val mean = sum / n
      out(c) = mean.toFloat
      out(4 + c) = math.sqrt(math.max(0.0, sumSq / n - mean * mean)).toFloat
      c += 1
    }
    out
  }
}
