package graft

import graft.dedup.FingerprintStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Model-based testing for the persisted fingerprint store (the
  * SnapshotModelSpec discipline at fingerprint grain): a seeded random
  * program of appends, at-least-once replays, folds ([[FingerprintStore
  * .compact]]) and screens must always agree with a driver-side
  * sequential model —
  *
  *  - CONTENT law: the store's distinct (media_id, dhash) set equals
  *    the model's committed set, through any number of folds and
  *    replays (folds collapse batch provenance, never fingerprints);
  *  - SCREEN law: every screen's (n_dups, nearest, accept) verdicts
  *    equal a brute-force all-pairs sweep over the model's standing set;
  *  - REPLAY law: a replayed batch — folded or verbatim — never changes
  *    the content set;
  *  - WATERMARK law: after a fold, as-of reads at or below the highest
  *    folded batch refuse, and the watermark is exactly that batch.
  */
class FingerprintModelSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val MaxDist = 6

  test("random append/replay/compact/screen programs match the " +
      "sequential model (seed 4242)") {
    val rnd = new scala.util.Random(4242)
    val dir = Files.createTempDirectory("fpmodel").toString + "/fps"

    // model state: committed batches in order (id -> fingerprints)
    var batches = Vector.empty[Seq[(Long, Long)]]
    var nextId = 0L

    def freshFps(n: Int): Seq[(Long, Long)] = (0 until n).map { _ =>
      val id = nextId; nextId += 1
      // ~1 in 3 fingerprints is a near-dup (≤ 3 flipped bits) of an
      // already-committed one — keeps the screen verdicts non-trivial
      val all = batches.flatten
      val h =
        if (all.nonEmpty && rnd.nextInt(3) == 0) {
          var v = all(rnd.nextInt(all.size))._2
          (0 until 1 + rnd.nextInt(3)).foreach(_ =>
            v ^= 1L << rnd.nextInt(64))
          v
        } else rnd.nextLong()
      (id, h)
    }

    def standingOf(asOf: Int): Seq[(Long, Long)] =
      batches.take(asOf).flatten

    def contentLaw(): Unit = {
      val got = spark.read.parquet(dir)
        .select(col("media_id"), col("dhash")).distinct()
        .as[(Long, Long)].collect().toSet
      assert(got === batches.flatten.toSet, "store content != model")
    }

    def screenLaw(incoming: Seq[(Long, Long)], asOf: Int): Unit = {
      val got = FingerprintStore.screen(spark, dir,
          incoming.toDF("media_id", "dhash"), asOfBatch = asOf.toLong,
          maxDist = MaxDist)
        .as[(Long, Long, Int, Boolean)].collect().toSeq
      val standing = standingOf(asOf)
      val want = incoming.map { case (id, h) =>
        val dists = standing.map(s => java.lang.Long.bitCount(s._2 ^ h))
          .filter(_ <= MaxDist)
        (id, dists.size.toLong,
          if (dists.isEmpty) 64 else dists.min, dists.isEmpty)
      }.sortBy(_._1)
      assert(got === want, s"screen@asOf=$asOf != brute-force model")
    }

    // bootstrap: one committed batch so every op has something to act on
    FingerprintStore.append(spark, dir,
      { val b = freshFps(6); batches :+= b; b.toDF("media_id", "dhash") },
      batchId = 0L)

    (1 to 40).foreach { step =>
      rnd.nextInt(4) match {
        case 0 | 1 => // append the next batch
          val b = freshFps(2 + rnd.nextInt(6))
          val bid = batches.size.toLong
          FingerprintStore.append(spark, dir,
            b.toDF("media_id", "dhash"), bid)
          batches :+= b
        case 2 => // at-least-once replay of ANY prior batch
          val bid = rnd.nextInt(batches.size)
          FingerprintStore.append(spark, dir,
            batches(bid).toDF("media_id", "dhash"), bid.toLong)
          contentLaw()
        case 3 => // fold + watermark law
          FingerprintStore.compact(spark, dir)
          val w = FingerprintStore.compactionWatermark(spark, dir)
          if (batches.size >= 2) {
            assert(w === Some(batches.size - 2L),
              s"watermark after fold: $w, want ${batches.size - 2}")
            val e = intercept[IllegalArgumentException](
              FingerprintStore.screen(spark, dir,
                Seq((0L, 0L)).toDF("media_id", "dhash"),
                asOfBatch = batches.size - 2L))
            assert(e.getMessage.contains("watermark"))
          }
          contentLaw()
      }
      if (step % 5 == 0) {
        contentLaw()
        screenLaw(freshFps(3).map { case (id, h) => (id + 100000, h) },
          asOf = batches.size)
      }
    }
    contentLaw()
    screenLaw(freshFps(5).map { case (id, h) => (id + 200000, h) },
      asOf = batches.size)
  }
}
