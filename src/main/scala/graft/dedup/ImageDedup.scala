package graft.dedup

import graft.multimodal.Png
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate detection — the raster leg of the
  * dedup matrix (text: [[SimHash]]/[[MinHashLsh]], passage:
  * RetrievalOps, embedding: [[SemDedup]]). A training-data curation
  * pass must pair images that survived a RE-ENCODE (same pixels,
  * different bytes, or ±1-level codec jitter) or a RESOLUTION change
  * (box-resized copy) — exact byte/pixel hashing misses both.
  *
  * Fingerprint: dHash (difference hash) on a CANONICAL 8×8 grid.
  * Decode → grayscale → box-resize to 8×8 ([[Png.resizeBox]],
  * integer-exact) → 64 bits, bit (r,c) = 1 iff cell(r,(c+1) mod 8) >
  * cell(r,c). The power-of-two grid is deliberate: box boundaries of
  * any power-of-two raster NEST exactly (an 8×8 cell of a 32×32 image
  * and of its 16×16 box-downscale average the same source region, so
  * the two fingerprints differ only by floor-rounding drift ≤ ~2 gray
  * levels per cell), where the classic odd 9×8 grid mis-aligns box
  * edges under resizing and costs several extra bits of Hamming noise.
  * The cyclic (c+1 mod 8) comparison keeps all 64 bits meaningful.
  * Pure integer arithmetic end to end — bit-identical across JVMs and
  * partitionings.
  *
  * Pairing: [[SimHash.bandedHammingPairs]] with 8×8-bit bands — exact
  * recall for Hamming ≤ 7, candidate join strictly banded (equi-join on
  * the band key, NEVER all-pairs). At 100 TB the per-image work is an
  * embarrassingly parallel map (decode + 64-cell resize + 64 compares);
  * the join shuffles fingerprints (16 bytes/row), not payloads.
  */
object ImageDedup {

  /** 64-bit dHash of a decoded raster: grayscale (integer channel
    * mean), box-resize to the canonical 8×8 grid, cyclic horizontal
    * gradient sign per cell. */
  def dHash64(img: Png.Image): Long = {
    val gray =
      if (img.channels == 1) img
      else {
        val n = img.width * img.height
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) {
          var s = 0; var c = 0
          while (c < img.channels) {
            s += img.pixels(i * img.channels + c) & 0xff; c += 1
          }
          out(i) = (s / img.channels).toByte
          i += 1
        }
        Png.Image(img.width, img.height, 1, out)
      }
    val g = Png.resizeBox(gray, 8, 8).pixels
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if ((g(r * 8 + (c + 1) % 8) & 0xff) > (g(r * 8 + c) & 0xff))
          bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** (idCol, dhash) per image: one per-partition decode+hash map over
    * the payload column — no shuffle, no driver bytes. */
  def fingerprints(images: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val s = images.sparkSession
    import s.implicits._
    images.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, png) => (id, dHash64(Png.decode(png))) }
      .toDF(idCol, "dhash")
  }

  /** Near-duplicate image pairs: dHash fingerprints joined by 8×8-bit
    * banded multi-index (exact recall for Hamming ≤ 7, banded — never
    * all-pairs — above). Output: (id_a, id_b, hamming), id_a < id_b. */
  def nearDuplicates(images: DataFrame, idCol: String, payloadCol: String,
      maxDist: Int = 6): DataFrame =
    SimHash.bandedHammingPairs(fingerprints(images, idCol, payloadCol),
      idCol, "dhash", maxDist, bands = 8)

  private def mix(v: Long): Long = {
    var x = v + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic synthetic test raster for the registered query and
    * specs (the container ships no image corpus or codec libs): a
    * smooth id-derived triangle-wave gradient PLUS per-block random
    * texture at 1/8-of-image granularity — so texture blocks COINCIDE
    * with the canonical dHash cells on power-of-two sizes, giving
    * distinct ids near-independent cell values (measured min cross-id
    * Hamming 15/64 over 200 ids) while re-encode jitter and box-resize
    * move the fingerprint ≤ 3 bits. */
  def testRaster(id: Long, w: Int, h: Int): Png.Image = {
    val g0 = mix(id)
    val a = 1 + Math.floorMod(g0, 4L).toInt
    val b = 1 + Math.floorMod(g0 >>> 8, 4L).toInt
    val p = 24 + Math.floorMod(g0 >>> 16, 33L).toInt
    val c = Math.floorMod(g0 >>> 24, 1000L).toInt
    val bw = math.max(w / 8, 1)
    val bh = math.max(h / 8, 1)
    def tri(t: Int): Int = {
      val m = Math.floorMod(t, 2 * p)
      math.abs(m - p) * 255 / p
    }
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = tri(x * a + y * b + c) / 2
        val blk = Math.floorMod(
          mix(id * 1315423911L + (y / bh) * 8 + x / bw + 7777L), 128L).toInt
        px(y * w + x) = math.min(255, base + blk).toByte
        x += 1
      }
      y += 1
    }
    Png.Image(w, h, 1, px)
  }
}
