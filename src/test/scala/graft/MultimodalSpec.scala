package graft

import graft.multimodal.{DeterministicStubDecoder, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing checks (north-star brief): the decode itself is a
  * stub, but the schema, binary payloads, per-partition batch shape and
  * frame sampling are real. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private def fixture = Multimodal.fixtureFromDocuments(
    Tables.documents(spark, Sf).limit(60))

  test("fixture: payload bytes mirror the source text, metadata is typed") {
    val docs = Tables.documents(spark, Sf).limit(60)
    val joined = fixture
      .select(col("media_id"), octet_length(col("payload")).as("n_bytes"),
        col("meta.modality").as("modality"))
      .join(docs, col("media_id") === col("doc_id"))
    // synthetic text is ASCII → byte length == char length
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).count() === 0)
    assert(joined.select("modality").distinct().count() === 3)
  }

  test("feature extraction is deterministic and partition-shaped") {
    implicit val s = spark
    val f1 = Multimodal.extractFeatures(fixture.repartition(4),
      DeterministicStubDecoder).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(fixture.repartition(7),
      DeterministicStubDecoder).collect().sortBy(_.media_id)
    assert(f1.length === 60)
    // partitioning must not affect the features (per-record decode)
    assert(f1.map(_.checksum).toSeq === f2.map(_.checksum).toSeq)
    assert(f1.forall(_.features.length === DeterministicStubDecoder.featureDim))
  }

  test("frame sampling keeps every nth fixed-size chunk") {
    val frames = Multimodal.sampleFrames(fixture, frameBytes = 100, every = 2)
    val perMedia = frames.groupBy("media_id").count()
      .join(fixture.select(col("media_id"),
        octet_length(col("payload")).as("len")), "media_id")
    val wrong = perMedia.filter(
      col("count") =!= ceil(ceil(col("len") / 100.0) / 2.0).cast("long"))
    assert(wrong.count() === 0)
    // frames are the right size except possibly the tail chunk
    val bad = frames.join(fixture.select(col("media_id"),
        octet_length(col("payload")).as("len")), "media_id")
      .filter(octet_length(col("frame_payload")) =!= 100 &&
        col("frame_id") =!= ceil(col("len") / 100.0).cast("long") - 1)
    assert(bad.count() === 0)
  }

  test("frame sampling of an empty payload yields zero rows (no [0,-1] ramp)") {
    import spark.implicits._
    val df = Seq(
      (1L, Array.empty[Byte]),
      (2L, Array.fill[Byte](10)(1))).toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(df, frameBytes = 4, every = 1)
      .groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!frames.contains(1L), s"empty payload emitted frames: $frames")
    assert(frames(2L) === 3) // ceil(10/4)
  }

  test("WAV decoder: real RIFF/WAVE payloads decode through the Spark pipeline") {
    import graft.multimodal.{MediaMeta, WavPcm, WavPcmDecoder}
    import spark.implicits._
    implicit val s = spark
    // synthesize three real WAV files: a 440 Hz half-amplitude sine, a
    // full-amplitude sine, and digital silence
    def sine(amp: Float, n: Int): Array[Float] =
      Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * 440 * i / 8000.0)).toFloat)
    val payloads = Seq(
      1L -> WavPcm.encodePcm16(sine(0.5f, 8000), 8000, 1),
      2L -> WavPcm.encodePcm16(sine(1.0f, 8000), 8000, 1),
      3L -> WavPcm.encodePcm16(new Array[Float](8000), 8000, 1))
    val records = payloads.toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("audio").as("modality"), lit(0).as("width"),
          lit(0).as("height"), lit(8000).as("sampleRateHz"),
          lit(0).as("nFrames")).as("meta"),
        col("payload"))
    val feats = Multimodal.extractFeatures(records, WavPcmDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.length === 3)
    // RMS of a sine = amp/sqrt(2); every time bin holds many full periods
    val rms05 = 0.5 / math.sqrt(2.0)
    val rms10 = 1.0 / math.sqrt(2.0)
    assert(feats(0).features.forall(f => math.abs(f - rms05) < 0.02),
      s"half-amp bins: ${feats(0).features.toSeq}")
    assert(feats(1).features.forall(f => math.abs(f - rms10) < 0.03),
      s"full-amp bins: ${feats(1).features.toSeq}")
    assert(feats(2).features.forall(_ === 0.0f))
  }

  test("WAV codec: header round-trip, chunk skipping, loud failures") {
    import graft.multimodal.WavPcm
    val samples = Array.tabulate(100)(i => (i - 50) / 64.0f)
    val wav = WavPcm.decode(WavPcm.encodePcm16(samples, 16000, 1))
    assert(wav.sampleRateHz === 16000 && wav.channels === 1
      && wav.bitsPerSample === 16 && wav.samples.length === 100)
    // 16-bit quantization: round-trip within 1 LSB
    assert(wav.samples.zip(samples).forall { case (a, b) =>
      math.abs(a - b) <= 1.5f / 32768f })
    // an unknown chunk (LIST metadata) before data must be skipped: splice
    // one into a valid file
    val base = WavPcm.encodePcm16(samples, 16000, 1)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(36) ++ list ++ base.drop(36)
    // RIFF size field is now stale, but the chunk walk is length-bounded
    val wav2 = WavPcm.decode(spliced)
    assert(wav2.samples.length === 100 && wav2.sampleRateHz === 16000)
    // loud failures on non-WAV payloads
    intercept[IllegalArgumentException](WavPcm.decode("hello".getBytes))
    intercept[IllegalArgumentException](
      WavPcm.decode("RIFFxxxxWAVE".getBytes ++ Array[Byte](1, 2, 3)))
  }

  test("WAV info: the chunk-walk admission read agrees with the full " +
      "decode, clamps truncation, and is loud on non-WAV") {
    import graft.multimodal.WavPcm
    val samples = Array.tabulate(1600)(i => (i % 64) / 64.0f)
    val base = WavPcm.encodePcm16(samples, 16000, 2)
    val (ch, rate, bits, frames) = WavPcm.info(base)
    val wav = WavPcm.decode(base)
    assert((ch, rate, bits) === (wav.channels, wav.sampleRateHz,
      wav.bitsPerSample))
    assert(frames === wav.samples.length / wav.channels,
      "info frame count != decoded frame count")
    // truncation clamps identically to decode — duration from info
    // reflects bytes present, never the hostile declared size
    val cut = base.take(44 + 100)
    val (_, _, _, fCut) = WavPcm.info(cut)
    assert(fCut === WavPcm.decode(cut).samples.length / 2)
    // same loudness contract as the decoder
    intercept[IllegalArgumentException](WavPcm.info("junk".getBytes))
    intercept[IllegalArgumentException](
      WavPcm.info("RIFFxxxxWAVE".getBytes ++ Array[Byte](1, 2, 3)))
  }

  test("WAV decoder: corrupt inputs fail loudly, truncated data decodes bounded") {
    import graft.multimodal.WavPcm
    val base = WavPcm.encodePcm16(Array.tabulate(64)(i => i / 64.0f), 8000, 1)
    // deterministic fuzz: flip/truncate at every interesting boundary —
    // decode must either succeed or throw IllegalArgumentException;
    // anything else (ArrayIndexOutOfBounds, infinite loop) is a bug
    (0 until base.length by 3).foreach { cut =>
      try { WavPcm.decode(base.take(cut)); () }
      catch { case _: IllegalArgumentException => () }
    }
    (0 until 44).foreach { i =>
      val mutated = base.clone(); mutated(i) = (mutated(i) ^ 0x5a).toByte
      try { WavPcm.decode(mutated); () }
      catch { case _: IllegalArgumentException => () }
    }
    // data chunk truncated mid-sample: decoder clamps to the bytes present
    val wav = WavPcm.decode(base.take(44 + 33))
    assert(wav.samples.length === 16, "truncated data must clamp, not throw")
  }

  test("WAV decoder: hostile chunk sizes can't overflow int arithmetic") {
    import graft.multimodal.WavPcm
    import java.nio.{ByteBuffer, ByteOrder}
    val base = WavPcm.encodePcm16(Array.tabulate(64)(i => i / 64.0f), 8000, 1)
    // data size = Int.MaxValue: off + declared would wrap negative in int
    // math and fake an empty data chunk — must clamp to the real bytes
    val hugeData = base.clone()
    ByteBuffer.wrap(hugeData).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue)
    assert(WavPcm.decode(hugeData).samples.length === 64,
      "hostile data size silently decoded as zero samples")
    // an unknown chunk declaring a size past the payload is hostile input:
    // IAE, never a silent skip or a wrapped index into tag()
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 0x7f) ++ "INFO".getBytes("US-ASCII")
    val hostileList = base.take(36) ++ list ++ base.drop(36)
    val e = intercept[IllegalArgumentException](WavPcm.decode(hostileList))
    assert(e.getMessage.contains("overruns"), e.getMessage)
  }

  test("PNG codec: round-trips every supported color type") {
    import graft.multimodal.Png
    val rnd = new scala.util.Random(42)
    for (channels <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 1), (7, 3), (32, 16))) {
      val pixels = Array.fill[Byte](w * h * channels)(rnd.nextInt(256).toByte)
      val img = Png.decode(Png.encode(w, h, channels, pixels))
      assert(img.width === w && img.height === h && img.channels === channels)
      assert(img.pixels.toSeq === pixels.toSeq,
        s"round-trip mismatch at ${w}x$h/$channels")
    }
  }

  test("PNG decoder: reverses scanline filters 1-4 (Sub/Up/Average/Paeth)") {
    import graft.multimodal.Png
    import java.util.zip.{CRC32, Deflater}
    import java.nio.ByteBuffer
    // hand-assemble a PNG whose rows use every non-zero filter, by
    // forward-filtering known pixels the way a real encoder would
    val (w, h, ch) = (6, 4, 3)
    val pixels = Array.tabulate[Byte](w * h * ch)(i => ((i * 37 + 11) % 256).toByte)
    val stride = w * ch
    val filters = Array(1, 2, 3, 4)
    val raw = new Array[Byte]((stride + 1) * h)
    def px(y: Int, x: Int) = if (y < 0 || x < 0) 0 else pixels(y * stride + x) & 0xff
    def paeth(a: Int, b: Int, c: Int) = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (y <- 0 until h) {
      raw(y * (stride + 1)) = filters(y).toByte
      for (x <- 0 until stride) {
        val (cur, left, up, ul) =
          (px(y, x), px(y, x - ch), px(y - 1, x), px(y - 1, x - ch))
        val filtered = filters(y) match {
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (filtered & 0xff).toByte
      }
    }
    val d = new Deflater(); d.setInput(raw); d.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    def chunk(typ: String, data: Array[Byte]) = {
      val t = typ.getBytes("US-ASCII")
      val crc = new CRC32(); crc.update(t); crc.update(data)
      ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
    }
    val ihdr = ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr.array()) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    val img = Png.decode(png)
    assert(img.pixels.toSeq === pixels.toSeq,
      "filtered scanlines must reconstruct the original raster")
  }

  test("PNG decoder: real rasters decode through the Spark pipeline") {
    import graft.multimodal.{Png, PngDecoder}
    import spark.implicits._
    implicit val s = spark
    // three real PNGs: all-black, all-white, and a horizontal gradient
    def flat(v: Int) = Png.encode(16, 16, 3, Array.fill[Byte](16 * 16 * 3)(v.toByte))
    val gradient = Png.encode(256, 2, 1,
      Array.tabulate[Byte](256 * 2)(i => (i % 256).toByte))
    val payloads = Seq(1L -> flat(0), 2L -> flat(255), 3L -> gradient)
    val records = payloads.toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("image").as("modality"), lit(16).as("width"),
          lit(16).as("height"), lit(0).as("sampleRateHz"),
          lit(0).as("nFrames")).as("meta"),
        col("payload"))
    val feats = Multimodal.extractFeatures(records, PngDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.length === 3)
    // all-black: zero mean + zero std in the 3 used channels
    assert(feats(0).features.forall(f => math.abs(f) < 1e-6))
    // all-white: mean 1.0, std 0 per channel
    assert((0 until 3).forall(c => math.abs(feats(1).features(c) - 1.0f) < 1e-6))
    assert((4 until 7).forall(c => math.abs(feats(1).features(c)) < 1e-6))
    // uniform gradient over [0,255]: mean ≈ 0.5, std ≈ 1/sqrt(12)
    assert(math.abs(feats(2).features(0) - 0.5f) < 0.01)
    assert(math.abs(feats(2).features(4) - 1.0 / math.sqrt(12.0)) < 0.01)
  }

  test("PNG dims: header-only read matches decode, rejects non-PNG, " +
      "never inflates") {
    import graft.multimodal.Png
    for ((w, h, c) <- Seq((9, 5, 4), (16, 16, 1), (1, 1, 2))) {
      val bytes = Png.encode(w, h, c,
        Array.tabulate[Byte](w * h * c)(i => (i * 73 % 256).toByte))
      assert(Png.dims(bytes) === (w, h))
      val img = Png.decode(bytes)
      assert((img.width, img.height) === Png.dims(bytes))
    }
    intercept[IllegalArgumentException](
      Png.dims("not a png".getBytes("UTF-8")))
    intercept[IllegalArgumentException](Png.dims(Array.empty[Byte]))
    // a decompression bomb's declared dims read in constant work — the
    // admission answer a gate acts on BEFORE decode's allocation (the
    // patched header breaks the CRC, which dims deliberately ignores:
    // integrity stays decode's job)
    val bomb = Png.encode(2, 2, 1, Array[Byte](1, 2, 3, 4))
    java.nio.ByteBuffer.wrap(bomb).putInt(16, 60000).putInt(20, 60000)
    assert(Png.dims(bomb) === (60000, 60000))
  }

  test("PNG decoder: corrupt inputs fail loudly, ancillary chunks skipped") {
    import graft.multimodal.Png
    val base = Png.encode(9, 5, 4,
      Array.tabulate[Byte](9 * 5 * 4)(i => (i * 73 % 256).toByte))
    // deterministic fuzz: truncate at every boundary and flip every header
    // byte — decode must succeed or throw IllegalArgumentException only
    (0 until base.length by 3).foreach { cut =>
      try { Png.decode(base.take(cut)); () }
      catch { case _: IllegalArgumentException => () }
    }
    (0 until math.min(64, base.length)).foreach { i =>
      val mutated = base.clone(); mutated(i) = (mutated(i) ^ 0x5a).toByte
      try { Png.decode(mutated); () }
      catch { case _: IllegalArgumentException => () }
    }
    // ancillary chunk (tEXt) spliced before IDAT must be skipped
    import java.util.zip.CRC32
    import java.nio.ByteBuffer
    val data = "k v".getBytes("ISO-8859-1")
    val t = "tEXt".getBytes("US-ASCII")
    val crc = new CRC32(); crc.update(t); crc.update(data)
    val text = ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
    val ihdrEnd = 8 + 12 + 13 // sig + IHDR chunk
    val spliced = base.take(ihdrEnd) ++ text ++ base.drop(ihdrEnd)
    assert(Png.decode(spliced).pixels.toSeq === Png.decode(base).pixels.toSeq)
    // loud failures: paletted color type and interlace flag
    intercept[IllegalArgumentException] {
      val mutated = base.clone(); mutated(8 + 8 + 9) = 3.toByte // colorType
      Png.decode(mutated) // (CRC catches it first — still IAE)
    }
    // a hostile IHDR claiming a gigantic raster must be an IAE, never a
    // negative/huge array allocation: rewrite width and re-CRC the chunk
    import java.util.zip.CRC32
    import java.nio.ByteBuffer
    val hostile = base.clone()
    ByteBuffer.wrap(hostile).putInt(16, 0x40000000) // width = 2^30
    val crc2 = new CRC32(); crc2.update(hostile, 12, 4 + 13)
    ByteBuffer.wrap(hostile).putInt(29, crc2.getValue.toInt)
    val e = intercept[IllegalArgumentException](Png.decode(hostile))
    assert(e.getMessage.contains("decoder bounds"))
  }

  test("binaryFile source: PNG files on disk flow into the decode pipeline") {
    import graft.multimodal.{Png, PngDecoder}
    import spark.implicits._
    implicit val s = spark
    // three real PNG files in a mixed-media directory (plus a decoy the
    // glob must prune at listing time)
    val dir = java.nio.file.Files.createTempDirectory("media_lake")
    def gray(v: Int) = Png.encode(4, 4, 1, Array.fill[Byte](16)(v.toByte))
    java.nio.file.Files.write(dir.resolve("img_000.png"), gray(0))
    java.nio.file.Files.write(dir.resolve("img_128.png"), gray(128))
    java.nio.file.Files.write(dir.resolve("img_255.png"), gray(255))
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "not media")

    val files = graft.sources.Sources.binaryFiles(spark, dir.toString, "*.png")
    assert(files.count() === 3, "glob must prune the decoy at listing")
    val records = files
      .select(regexp_extract(col("path"), "img_(\\d+)", 1).cast("long")
          .as("media_id"),
        struct(lit("image").as("modality"), lit(4).as("width"),
          lit(4).as("height"), lit(0).as("sampleRateHz"),
          lit(0).as("nFrames")).as("meta"),
        col("content").as("payload"))
    val feats = Multimodal.extractFeatures(records, PngDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq === Seq(0L, 128L, 255L))
    assert(math.abs(feats(0).features(0)) < 1e-6)
    assert(math.abs(feats(1).features(0) - 128f / 255f) < 1e-6)
    assert(math.abs(feats(2).features(0) - 1.0f) < 1e-6)
  }

  test("q_multimodal_decode: embeddings round-trip through real PNG encode+decode") {
    val out = ops.ImplOps.multimodalDecode.fn(spark, Sf).collect()
    assert(out.length === 200)
    // every payload is a real PNG: 8x8 gray => decoded stats exist and
    // the run is deterministic (repeat equals itself)
    val again = ops.ImplOps.multimodalDecode.fn(spark, Sf).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("MP4 parser: metadata round-trips through encodeMeta") {
    import graft.multimodal.Mp4
    val tracks = Seq(Mp4.Track("vide", "avc1"), Mp4.Track("soun", "mp4a"))
    val bytes = Mp4.encodeMeta("isom", 90000, 2700000L, tracks)
    val m = Mp4.parse(bytes)
    assert(m.majorBrand === "isom")
    assert(m.timescaleHz === 90000L && m.durationTicks === 2700000L)
    assert(m.durationMs === 30000L)
    assert(m.tracks === tracks)
    // audio-only container
    val a = Mp4.parse(Mp4.encodeMeta("M4A ", 44100, 441000L,
      Seq(Mp4.Track("soun", "mp4a"))))
    assert(a.tracks === Seq(Mp4.Track("soun", "mp4a")) &&
      a.durationMs === 10000L)
  }

  test("MP4 parser: hostile box sizes fail loudly, never wrap or loop") {
    import graft.multimodal.Mp4
    import java.nio.ByteBuffer
    val base = Mp4.encodeMeta("isom", 1000, 5000L,
      Seq(Mp4.Track("vide", "avc1")))
    // non-BMFF payloads
    intercept[IllegalArgumentException](Mp4.parse("hello".getBytes))
    intercept[IllegalArgumentException](
      Mp4.parse(Array.fill[Byte](32)(0x41)))
    // moov size claiming past the payload: IAE, not a wrapped index
    val huge = base.clone()
    ByteBuffer.wrap(huge).putInt(16, Int.MaxValue) // moov box size field
    val e = intercept[IllegalArgumentException](Mp4.parse(huge))
    assert(e.getMessage.contains("overruns"), e.getMessage)
    // size < 8 (would loop forever without the bound)
    val tiny = base.clone()
    ByteBuffer.wrap(tiny).putInt(16, 3)
    intercept[IllegalArgumentException](Mp4.parse(tiny))
    // deterministic fuzz over every truncation boundary
    (0 until base.length by 5).foreach { cut =>
      try { Mp4.parse(base.take(cut)); () }
      catch { case _: IllegalArgumentException => () }
    }
    // and every single-byte corruption either parses or throws IAE
    base.indices.foreach { i =>
      val mutated = base.clone(); mutated(i) = (mutated(i) ^ 0x5a).toByte
      try { Mp4.parse(mutated); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("q_multimodal_video: container metadata flows through the decode plumbing") {
    val out = ops.ImplOps.multimodalVideo.fn(spark, Sf).collect()
    assert(out.length === 200)
    // derived fields follow the synthesis rule: duration 1+id%600 s,
    // audio track present unless id % 3 == 0
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) === 1L + id % 600, s"duration for $id")
      assert(r.getLong(3) === (if (id % 3 != 0) 2L else 1L))
      assert(r.getLong(4) === (if (id % 3 != 0) 1L else 0L))
    }
  }

  test("resizeBox: exact integer box averages, identity, 1x1 collapse, PNG round trip") {
    import graft.multimodal.Png
    // 4x2 grayscale, hand-checkable: 2x1 output boxes are 2x2 input
    // blocks averaged with floor division
    val px = Array[Byte](10, 20, 30, 40,
                         50, 60, 70, 80)
    val img = Png.Image(4, 2, 1, px)
    val half = Png.resizeBox(img, 2, 1)
    // box1 = {10,20,50,60} -> 140/4 = 35; box2 = {30,40,70,80} -> 55
    assert(half.pixels.map(_ & 0xff).toSeq === Seq(35, 55))
    // identity resize is bit-identical
    assert(Png.resizeBox(img, 4, 2).pixels.toSeq === px.toSeq)
    // 1x1 collapse = floor of the global mean (360/8 = 45)
    assert(Png.resizeBox(img, 1, 1).pixels.map(_ & 0xff).toSeq === Seq(45))
    // upscale degenerates to nearest-pixel (no invented values)
    val up = Png.resizeBox(half, 4, 1)
    assert(up.pixels.map(_ & 0xff).toSeq === Seq(35, 35, 55, 55))
    // multi-channel: channels resize independently
    val rgb = Png.Image(2, 1, 3,
      Array[Byte](100, 0, 50, 2, 10, 52))
    assert(Png.resizeBox(rgb, 1, 1).pixels.map(_ & 0xff).toSeq ===
      Seq(51, 5, 51))
    // the resized raster survives a real encode/decode round trip
    val enc = Png.encode(2, 1, 1, half.pixels)
    assert(Png.decode(enc).pixels.toSeq === half.pixels.toSeq)
    // registered query: deterministic rows, resized shape as declared
    val rows = graft.ops.ImplOps.multimodalResize.fn(spark, Sf).collect()
    assert(rows.length === 200)
    rows.foreach { r =>
      assert(r.getLong(3) === 4L && r.getLong(4) === 4L)
      assert(r.getLong(2) < r.getLong(1),
        "resized payload must be smaller than the original PNG")
    }
    val again = graft.ops.ImplOps.multimodalResize.fn(spark, Sf).collect()
    assert(again.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
  }

  test("approx_count_distinct stays within 15% of exact (HLL sanity)") {
    val r = Tables.events(spark, Sf)
      .agg(approx_count_distinct("user_id").as("a"),
        countDistinct("user_id").as("e"))
      .collect()(0)
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e <= 0.15, s"approx=$a exact=$e")
  }
}
