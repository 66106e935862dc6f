package graft

import graft.dedup.ImageDedup
import graft.multimodal.Png
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual image near-dup (q_dedup_image): the dHash fingerprint
  * must be stable under the two transforms a byte hash misses
  * (re-encode with ±1 jitter, box-resize), planted near-dup rasters
  * must pair while distinct rasters must not, the banded join must
  * equal a sequential all-pairs reference inside its exact-recall
  * radius, and the candidate join must stay BANDED (equi-join — never a
  * cartesian/all-pairs plan). */
class ImageDedupSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** The registered query's corpus shape, small: ids 0..19, every third
    * id with a jittered re-encode (+1) and a 16×16 resize (+2). */
  private def corpus(n: Int) = (0L until n.toLong).flatMap { id =>
    val base = ImageDedup.testRaster(id, 32, 32)
    val orig = (id * 10, Png.encode(32, 32, 1, base.pixels))
    if (id % 3 != 0) Seq(orig)
    else {
      val jittered = base.pixels.zipWithIndex.map { case (p, i) =>
        val x = i % 32; val y = i / 32
        math.min(255, (p & 0xff) + (x + y) % 2).toByte
      }
      val small = Png.resizeBox(base, 16, 16)
      Seq(orig, (id * 10 + 1, Png.encode(32, 32, 1, jittered)),
        (id * 10 + 2, Png.encode(16, 16, 1, small.pixels)))
    }
  }

  test("dHash is invariant to the decode path and survives re-encode " +
      "jitter and box-resize with small Hamming distance") {
    (0L until 30L).foreach { id =>
      val base = ImageDedup.testRaster(id, 32, 32)
      val viaPng = ImageDedup.dHash64(
        Png.decode(Png.encode(32, 32, 1, base.pixels)))
      assert(viaPng === ImageDedup.dHash64(base),
        s"id $id: PNG round-trip changed the fingerprint")
      val jittered = Png.Image(32, 32, 1,
        base.pixels.zipWithIndex.map { case (p, i) =>
          val x = i % 32; val y = i / 32
          math.min(255, (p & 0xff) + (x + y) % 2).toByte
        })
      val dJit = java.lang.Long.bitCount(
        ImageDedup.dHash64(base) ^ ImageDedup.dHash64(jittered))
      assert(dJit <= 6, s"id $id: jitter moved dHash by $dJit bits")
      val dRes = java.lang.Long.bitCount(
        ImageDedup.dHash64(base) ^
          ImageDedup.dHash64(Png.resizeBox(base, 16, 16)))
      assert(dRes <= 6, s"id $id: 16x16 resize moved dHash by $dRes bits")
    }
  }

  test("distinct rasters are FAR apart (no accidental near-dups in the " +
      "planted corpus)") {
    val hs = (0L until 30L)
      .map(id => id -> ImageDedup.dHash64(ImageDedup.testRaster(id, 32, 32)))
    for ((ia, ha) <- hs; (ib, hb) <- hs if ia < ib) {
      val d = java.lang.Long.bitCount(ha ^ hb)
      assert(d > 12, s"ids $ia/$ib collide at Hamming $d")
    }
  }

  test("banded near-dup pairs == sequential all-pairs reference within " +
      "the exact-recall radius; planted variants all pair; no " +
      "cross-source pairs") {
    val df = corpus(20).toDF("media_id", "payload")
    val got = ImageDedup.nearDuplicates(df, "media_id", "payload",
        maxDist = 6)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    // sequential reference: brute-force all pairs over the same corpus
    val fps = corpus(20).map { case (id, png) =>
      id -> ImageDedup.dHash64(Png.decode(png))
    }
    val ref = (for {
      (ia, ha) <- fps; (ib, hb) <- fps if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ia, ib, d)).toSet
    assert(got === ref,
      s"banded != reference; missing=${ref -- got} extra=${got -- ref}")
    // every planted variant group pairs completely (orig/reenc/resize)
    val grouped = (0L until 20L).filter(_ % 3 == 0)
    grouped.foreach { id =>
      val expect = Set((id * 10, id * 10 + 1), (id * 10, id * 10 + 2),
        (id * 10 + 1, id * 10 + 2))
      val present = got.map(p => (p._1, p._2)).filter(expect)
      assert(present === expect,
        s"id $id: planted variants missing pairs ${expect -- present}")
    }
    // and nothing pairs across source images
    assert(got.forall(p => p._1 / 10 == p._2 / 10),
      s"cross-source false pair: ${got.filterNot(p => p._1 / 10 == p._2 / 10)}")
  }

  test("the candidate join is BANDED: equi-join on the band key, never " +
      "a cartesian / nested-loop all-pairs plan") {
    val df = corpus(20).toDF("media_id", "payload")
    val plan = ImageDedup.nearDuplicates(df, "media_id", "payload")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"image dedup planned a CartesianProduct:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"image dedup planned a nested-loop join:\n$plan")
  }

  test("banding law on RANDOM fingerprints (seed 4242): inside the " +
      "exact-recall radius (Hamming <= bands-1) both the self-join and " +
      "the two-sided join equal brute force EXACTLY") {
    import graft.dedup.SimHash
    val rnd = new scala.util.Random(4242)
    // random base fingerprints + planted variants <= 7 bit-flips away
    val sigs: Seq[(Long, Long)] = (0 until 60).flatMap { i =>
      val h = rnd.nextLong()
      val variants = (0 until rnd.nextInt(3)).map { j =>
        var v = h
        (0 until rnd.nextInt(8)).foreach(_ => v ^= 1L << rnd.nextInt(64))
        (i * 10L + j + 1, v)
      }
      (i * 10L, h) +: variants
    }
    val df = sigs.toDF("media_id", "dhash")
    for (maxDist <- Seq(0, 3, 7)) {
      val got = SimHash.bandedHammingPairs(df, "media_id", "dhash",
          maxDist, bands = 8)
        .as[(Long, Long, Int)].collect().toSet
      val ref = (for {
        (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
      } yield (ia, ib, d)).toSet
      assert(got === ref, s"self-join diverges at maxDist=$maxDist: " +
        s"missing=${ref -- got} extra=${got -- ref}")
    }
    // two-sided: split the corpus in half, screen one against the other
    val (l, r) = sigs.partition(_._1 % 20 < 10)
    val got2 = SimHash.bandedHammingJoin(
        l.toDF("media_id", "dhash"), "media_id",
        r.toDF("sid", "dhash"), "sid", "dhash", maxDist = 7, bands = 8)
      .as[(Long, Long, Int)].collect().toSet
    val ref2 = (for {
      (ia, ha) <- l; (ib, hb) <- r
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (ia, ib, d)).toSet
    assert(got2 === ref2,
      s"two-sided diverges: missing=${ref2 -- got2} extra=${got2 -- ref2}")
  }

  test("two-sided banded screen == sequential cross reference; incoming " +
      "never votes against incoming; planted re-ingests are caught") {
    import graft.dedup.SimHash
    // standing = ids 0..14; incoming = resized copies of 0,5,10 plus
    // two genuinely new images 100,101
    val standing = (0L until 15L).map(id =>
      id -> ImageDedup.dHash64(ImageDedup.testRaster(id, 32, 32)))
    val incoming = (Seq(0L, 5L, 10L).map { id =>
      (1000 + id) -> ImageDedup.dHash64(
        Png.resizeBox(ImageDedup.testRaster(id, 32, 32), 16, 16))
    } ++ Seq(100L, 101L).map(id =>
      (1000 + id) -> ImageDedup.dHash64(ImageDedup.testRaster(id, 32, 32))))
    val got = SimHash.bandedHammingJoin(
      incoming.toDF("media_id", "dhash"), "media_id",
      standing.toDF("media_id", "dhash"), "media_id",
      "dhash", maxDist = 6, bands = 8)
      .as[(Long, Long, Int)].collect().toSet
    val ref = (for {
      (ia, ha) <- incoming; (ib, hb) <- standing
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ia, ib, d)).toSet
    assert(got === ref,
      s"screen != reference; missing=${ref -- got} extra=${got -- ref}")
    // the three re-ingests hit their source; the two new images pass
    val hitBy = got.groupBy(_._1)
    Seq(0L, 5L, 10L).foreach(id => assert(
      hitBy.get(1000 + id).exists(_.exists(_._2 == id)),
      s"re-ingest of $id not caught"))
    Seq(1100L, 1101L).foreach(id =>
      assert(!hitBy.contains(id), s"fresh image $id falsely flagged"))
    // registered incremental query: every planted re-ingest rejects,
    // everything else accepts
    val out = Registry.all.find(_.name == "q_dedup_image_incr").get
      .fn(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val accept = r.getAs[Boolean]("accept")
      assert(accept === (id % 5 != 4),
        s"media $id: accept=$accept (re-ingests must reject, fresh pass)")
    }
  }

  test("registered q_dedup_image runs on the sf corpus and flags only " +
      "same-source pairs") {
    val out = Registry.all.find(_.name == "q_dedup_image").get
      .fn(spark, Sf).collect()
    assert(out.nonEmpty, "q_dedup_image returned no pairs")
    assert(out.forall(_.getAs[Boolean]("same_source")),
      "q_dedup_image paired images from different sources")
  }
}
