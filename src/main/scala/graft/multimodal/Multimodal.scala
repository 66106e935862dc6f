package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star brief): image/audio/video are
  * opaque BINARY payloads with typed metadata; decode/feature-extraction
  * runs per-partition so one partition = one decode batch (the shape a
  * real codec wants — amortized model/codec init per partition, vectorized
  * inner loop).
  *
  * Decoders: AUDIO and IMAGE decode for real with zero dependencies —
  * [[WavPcmDecoder]] parses the RIFF/WAVE container (PCM 8/16-bit) into
  * RMS-energy-envelope features, and [[PngDecoder]] parses PNG
  * (IHDR + zlib IDAT + scanline unfilter, JDK `Inflater`/`CRC32`) into
  * per-channel mean/std features. Only VIDEO container parsing remains
  * stubbed ([[DeterministicStubDecoder]]); the registry fixture also uses
  * the stub because its payloads are document text bytes, not media
  * containers. Everything around the decoders — the schema, the binary
  * column handling, the partitioning, the per-partition batch shape, the
  * frame-sampling chunker — is real and tested (MultimodalSpec).
  */
final case class MediaMeta(
    modality: String, // "image" | "audio" | "video"
    width: Int,
    height: Int,
    sampleRateHz: Int,
    nFrames: Int)

final case class MediaRecord(media_id: Long, meta: MediaMeta, payload: Array[Byte])

final case class MediaFeatures(
    media_id: Long,
    modality: String,
    n_bytes: Int,
    checksum: Long,
    features: Array[Float])

/** Pluggable decoder; the real implementation would wrap a codec library. */
trait MediaDecoder extends Serializable {
  def featureDim: Int
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Float]
}

/** STUB decoder: a rolling-hash projection of the payload into
  * `featureDim` floats — deterministic, so tests and rows-only driver
  * checks are stable. Swap for a real codec-backed decoder in production. */
object DeterministicStubDecoder extends MediaDecoder {
  val featureDim = 8
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
    val acc = new Array[Long](featureDim)
    var i = 0
    while (i < payload.length) {
      val d = i % featureDim
      acc(d) = acc(d) * 31 + (payload(i) & 0xff)
      i += 1
    }
    acc.map(v => ((v % 1000).toFloat) / 1000.0f)
  }
}

object Multimodal {

  /** Deterministic binary fixture derived from the documents table: the
    * UTF-8 text bytes stand in for a media payload; modality/metadata are
    * derived from doc_id so every modality appears. */
  def fixtureFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("modality"),
        (col("doc_id") % 64 + 1).cast(IntegerType).as("width"),
        (col("doc_id") % 48 + 1).cast(IntegerType).as("height"),
        lit(16000).cast(IntegerType).as("sampleRateHz"),
        (col("doc_id") % 30 + 1).cast(IntegerType).as("nFrames")).as("meta"),
      col("text").cast(BinaryType).as("payload"))

  /** Per-partition feature extraction: the decoder is instantiated once
    * per partition (where a real codec would load its model/codec state)
    * and applied across the partition's records. */
  def extractFeatures(records: DataFrame, decoder: MediaDecoder)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    records.as[MediaRecord].mapPartitions { it =>
      // per-partition init happens here (stub has none)
      it.map { r =>
        val feats = decoder.decode(r.payload, r.meta)
        var checksum = 0L
        var i = 0
        while (i < r.payload.length) { checksum = checksum * 131 + (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.media_id, r.meta.modality, r.payload.length, checksum, feats)
      }
    }
  }

  /** Frame sampling for video-shaped payloads: split the payload into
    * fixed-size chunks ("frames") and keep every `every`-th — pure
    * column expressions, stays in codegen. Output one row per kept frame.
    * An empty payload yields ZERO rows — without the guard,
    * `sequence(0, -1)` takes Spark's default step -1 and emits the
    * spurious two-element ramp [0, -1]. */
  def sampleFrames(records: DataFrame, frameBytes: Int, every: Int): DataFrame =
    records
      .filter(expr("octet_length(payload) > 0"))
      .select(col("media_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, CAST(ceil(octet_length(payload) / CAST($frameBytes AS DOUBLE)) AS INT) - 1),
             |  i -> substring(payload, i * $frameBytes + 1, $frameBytes))""".stripMargin))
          .as(Seq("frame_id", "frame_payload")))
      .filter(col("frame_id") % every === 0)
}
