package graft.multimodal

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM MP4/ISO-BMFF container METADATA parser — the last declared
  * multimodal stub retired (images decode via [[Png]], audio via
  * [[WavPcm]]). No frame decode: a video codec (H.264/AV1) is far
  * outside a dependency-free library, and a 100 TB curation pass
  * filters on CONTAINER metadata (duration, track inventory, codec
  * fourcc) long before it touches pixel data.
  *
  * Scope: the ISO base-media box model (ISO/IEC 14496-12 as publicly
  * documented): size+fourcc box walk with 64-bit `largesize` and
  * to-end-of-file (`size == 0`) forms, `ftyp` major brand,
  * `moov/mvhd` timescale+duration (versions 0 and 1), and per-`trak`
  * `mdia/hdlr` handler + `mdia/minf/stbl/stsd` first sample-entry
  * fourcc. Unknown boxes are skipped but BOUNDED — a declared size
  * past the payload is hostile input and throws
  * IllegalArgumentException, never a wrapped index (all size math in
  * Long, the [[WavPcm]]/[[Png]] hardening standard).
  */
object Mp4 {

  /** One track's identity: handler fourcc ("vide", "soun", …) and the
    * first sample-entry (codec) fourcc ("avc1", "mp4a", …). */
  final case class Track(handler: String, codec: String)

  /** Container metadata: `durationTicks` is in `timescaleHz` units. */
  final case class Meta(majorBrand: String, timescaleHz: Long,
      durationTicks: Long, tracks: Seq[Track]) {
    def durationMs: Long =
      if (timescaleHz <= 0) 0L else durationTicks * 1000L / timescaleHz
  }

  /** Parse an ISO-BMFF payload's container metadata. Throws
    * IllegalArgumentException on anything that is not a well-formed
    * container — loud about payloads it would silently misread. */
  def parse(bytes: Array[Byte]): Meta = {
    require(bytes.length >= 16, "payload shorter than one ISO-BMFF box")
    val top = children(bytes, 0, bytes.length).toSeq
    val ftyp = top.find(_._1 == "ftyp").getOrElse(
      throw new IllegalArgumentException(
        "no ftyp box — not an ISO-BMFF payload"))
    require(ftyp._3 - ftyp._2 >= 8, "truncated ftyp body")
    val majorBrand = fourcc(bytes, ftyp._2)
    val moov = top.find(_._1 == "moov").getOrElse(
      throw new IllegalArgumentException("no moov box"))
    val moovKids = children(bytes, moov._2, moov._3).toSeq
    val (timescale, duration) = moovKids.find(_._1 == "mvhd") match {
      case None => throw new IllegalArgumentException("no moov/mvhd box")
      case Some((_, b, e)) => parseMvhd(bytes, b, e)
    }
    val tracks = moovKids.filter(_._1 == "trak").map { case (_, tb, te) =>
      val mdia = children(bytes, tb, te).find(_._1 == "mdia")
      val kids = mdia.map(m => children(bytes, m._2, m._3).toSeq)
        .getOrElse(Seq.empty)
      val handler = kids.find(_._1 == "hdlr") match {
        case Some((_, b, e)) if e - b >= 12 => fourcc(bytes, b + 8)
        case _ => "none"
      }
      val codec = (for {
        minf <- kids.find(_._1 == "minf")
        stbl <- children(bytes, minf._2, minf._3).find(_._1 == "stbl")
        stsd <- children(bytes, stbl._2, stbl._3).find(_._1 == "stsd")
      } yield parseStsd(bytes, stsd._2, stsd._3)).getOrElse("none")
      Track(handler, codec)
    }
    Meta(majorBrand, timescale, duration, tracks)
  }

  /** mvhd full box: version byte selects 32-bit (v0) or 64-bit (v1)
    * creation/modification/duration fields. */
  private def parseMvhd(bytes: Array[Byte], body: Int,
      end: Int): (Long, Long) = {
    require(end - body >= 4, "truncated mvhd")
    (bytes(body) & 0xff) match {
      case 0 =>
        require(end - body >= 20, "truncated mvhd v0")
        (u32(bytes, body + 12), u32(bytes, body + 16))
      case 1 =>
        require(end - body >= 32, "truncated mvhd v1")
        val dur = u64(bytes, body + 24)
        require(dur >= 0, "mvhd v1 duration overflows")
        (u32(bytes, body + 20), dur)
      case v => throw new IllegalArgumentException(s"bad mvhd version $v")
    }
  }

  /** stsd: ver/flags, entry count, then sample entries (each a box whose
    * fourcc is the codec). Returns the first entry's fourcc. */
  private def parseStsd(bytes: Array[Byte], body: Int, end: Int): String = {
    if (end - body < 8) return "none"
    if (u32(bytes, body + 4) == 0L) return "none"
    if (end - body < 16) return "none"
    val entrySize = u32(bytes, body + 8)
    require(entrySize >= 8 && entrySize <= (end - body - 8).toLong,
      s"stsd sample entry overruns ($entrySize)")
    fourcc(bytes, body + 12)
  }

  /** Bounded child-box walk over [start, end): yields
    * (fourcc, bodyStart, boxEnd). All size arithmetic in Long; any
    * declared size that escapes the parent is an IAE. */
  private def children(bytes: Array[Byte], start: Int,
      end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = start
      def hasNext: Boolean = pos + 8 <= end
      def next(): (String, Int, Int) = {
        val size = u32(bytes, pos)
        val typ = fourcc(bytes, pos + 4)
        var bodyStart = pos + 8
        val boxEnd: Long =
          if (size == 0L) end.toLong // box extends to end of parent
          else if (size == 1L) {
            require(pos + 16 <= end, s"truncated largesize box '$typ'")
            val ls = u64(bytes, pos + 8)
            require(ls >= 16L && ls <= (end - pos).toLong,
              s"box '$typ' largesize $ls overruns parent")
            bodyStart = pos + 16
            pos.toLong + ls
          } else {
            require(size >= 8L && size <= (end - pos).toLong,
              s"box '$typ' size $size overruns parent " +
                s"(${end - pos} bytes left)")
            pos.toLong + size
          }
        val out = (typ, bodyStart, boxEnd.toInt)
        pos = boxEnd.toInt
        out
      }
    }

  private def fourcc(bytes: Array[Byte], pos: Int): String =
    new String(bytes, pos, 4, US_ASCII)

  private def u32(bytes: Array[Byte], pos: Int): Long =
    ByteBuffer.wrap(bytes).getInt(pos) & 0xffffffffL

  private def u64(bytes: Array[Byte], pos: Int): Long =
    ByteBuffer.wrap(bytes).getLong(pos)

  // ---- encode half: makes the parser round-trip-testable and gives
  // pipelines a way to materialize synthetic video-shaped fixtures ----

  /** Build a minimal well-formed container carrying exactly the
    * metadata [[parse]] extracts: ftyp + moov(mvhd + one trak per
    * Track with hdlr and minf/stbl/stsd). */
  def encodeMeta(majorBrand: String, timescaleHz: Int, durationTicks: Long,
      tracks: Seq[Track]): Array[Byte] = {
    require(majorBrand.length == 4 &&
      tracks.forall(t => t.handler.length == 4 && t.codec.length == 4),
      "fourcc fields must be exactly 4 ASCII bytes")
    val ftyp = box("ftyp",
      majorBrand.getBytes(US_ASCII) ++ beInt(0)) // major + minor version
    val mvhdBody = new Array[Byte](100) // full v0 body, zero-filled
    System.arraycopy(beInt(timescaleHz), 0, mvhdBody, 12, 4)
    System.arraycopy(beInt(durationTicks.toInt), 0, mvhdBody, 16, 4)
    val traks = tracks.map { t =>
      val hdlr = box("hdlr", beInt(0) ++ beInt(0) ++
        t.handler.getBytes(US_ASCII) ++ new Array[Byte](13))
      val entry = beInt(16) ++ t.codec.getBytes(US_ASCII) ++
        new Array[Byte](8)
      val stsd = box("stsd", beInt(0) ++ beInt(1) ++ entry)
      box("trak", box("mdia",
        hdlr ++ box("minf", box("stbl", stsd))))
    }
    ftyp ++ box("moov",
      box("mvhd", mvhdBody) ++ traks.foldLeft(Array.empty[Byte])(_ ++ _))
  }

  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(8 + body.length)
      .putInt(8 + body.length).put(typ.getBytes(US_ASCII)).put(body)
      .array()

  private def beInt(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v).array()
}

/** Metadata-level [[MediaDecoder]] for video payloads: parses the
  * container and emits the triage features a curation pass filters on —
  * duration in seconds, track count, and has-video/has-audio flags.
  * Deterministic: pure integer container fields. */
object Mp4MetaDecoder extends MediaDecoder {
  val featureDim = 4
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
    val m = Mp4.parse(payload)
    Array(m.durationMs / 1000.0f, m.tracks.size.toFloat,
      if (m.tracks.exists(_.handler == "vide")) 1.0f else 0.0f,
      if (m.tracks.exists(_.handler == "soun")) 1.0f else 0.0f)
  }
}
