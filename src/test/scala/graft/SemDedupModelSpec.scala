package graft

import graft.sim.Ivf
import graft.streaming.SemDedupStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Model-based testing for the accepted-vector store (the
  * FingerprintModelSpec discipline at embedding grain): a seeded random
  * program of merges, at-least-once replays and folds
  * ([[SemDedupStream.compact]]) under a FROZEN quantizer must always
  * agree with a driver-side sequential model of the ingest rule —
  *
  *  - CONTENT law: the store's accepted vec_id set equals the model's
  *    fold of the ingest rule over the committed batches, through any
  *    number of folds and replays;
  *  - REPLAY law: a replayed batch — folded (no-op), newest (verbatim
  *    rewrite) or mid-history — never changes the accepted set;
  *  - WATERMARK law: after a fold the watermark is exactly the
  *    second-newest committed batch id, and a replay at or below it
  *    returns 0.
  *
  * The model mirrors the engine's arithmetic exactly: sequential-order
  * double dot products, snapped micro-unit cosines, nearest-centroid
  * assignment with FP ties to the smallest list id — so even
  * coincidental near-dups among random vectors are classified
  * identically by both sides.
  */
class SemDedupModelSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val Tau = 950000L

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cos6(a: Array[Float], b: Array[Float]): Long =
    math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      * 1e6 + 0.5).toLong

  test("random merge/replay/compact programs match the sequential " +
      "ingest model (seed 2718)") {
    val rnd = new scala.util.Random(2718)
    val dim = 16
    def fresh(): Array[Float] = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)

    // frozen quantizer: trained ONCE on a reference set, as the
    // contract demands (re-training mid-stream re-clusters history)
    val ref = (0 until 40).map(i => (i.toLong, fresh(), i % 4))
      .toDF("vec_id", "embedding", "label")
    val cents = Ivf.centroidsIter(ref, "embedding", "label", iters = 2)
      .cache()
    val centsSeq = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    def listOf(v: Array[Float]): Long =
      centsSeq.map { case (lid, c) =>
        var d = 0.0; var i = 0
        while (i < c.length) {
          val t = v(i).toDouble - c(i); d += t * t; i += 1
        }
        (d, lid)
      }.minBy(identity)._2

    // the sequential model of SemDedup.ingestVerdicts, folded over the
    // committed batches in order (same rule as SemDedupStreamSpec)
    def acceptedOf(batches: Seq[Seq[(Long, Array[Float])]])
        : Set[Long] = {
      var accepted = Vector.empty[(Long, Long, Array[Float])]
      batches.foreach { batch =>
        val assigned = batch.sortBy(_._1).map { case (id, emb) =>
          (id, listOf(emb), emb) }
        assigned.foreach { case (id, lid, emb) =>
          val dupVsAccepted = accepted.exists { case (_, alid, aemb) =>
            alid == lid && cos6(aemb, emb) >= Tau }
          val dupInBatch = assigned.exists { case (oid, olid, oemb) =>
            oid < id && olid == lid && cos6(oemb, emb) >= Tau }
          if (!dupVsAccepted && !dupInBatch) accepted :+= ((id, lid, emb))
        }
      }
      accepted.map(_._1).toSet
    }

    val outDir = Files.createTempDirectory("semmodel").toString
    val cfg = SemDedupStream.Config(tauMicro = Tau)
    var batches = Vector.empty[Seq[(Long, Array[Float])]]
    var nextId = 1000L

    def freshBatch(n: Int): Seq[(Long, Array[Float])] = (0 until n).map { _ =>
      val id = nextId; nextId += 1
      val all = batches.flatten
      // ~1 in 3 vectors is an EXACT copy of an already-committed one
      // (same cluster under any quantizer, cosine exactly 1 >= τ) —
      // keeps the cross-batch verdicts non-trivial
      val emb =
        if (all.nonEmpty && rnd.nextInt(3) == 0)
          all(rnd.nextInt(all.size))._2
        else fresh()
      (id, emb)
    }

    def merge(b: Seq[(Long, Array[Float])], bid: Long): Long =
      SemDedupStream.mergeBatch(spark,
        b.toDF("vec_id", "embedding"), bid, outDir, cents, cfg)

    def contentLaw(): Unit = {
      val got = spark.read.parquet(SemDedupStream.storePath(outDir))
        .select("vec_id").as[Long].collect().toSet
      assert(got === acceptedOf(batches), "store accepted set != model")
    }

    // a batch that accepts NOTHING writes no partition, so folds skip
    // it: the expected watermark walks the store's real dirs, not the
    // logical batch counter
    def nonEmptyBatches(): Seq[Int] =
      (0 until batches.size).filter { b =>
        (acceptedOf(batches.take(b + 1)) -- acceptedOf(batches.take(b)))
          .nonEmpty
      }
    var wm = -1L

    // bootstrap
    { val b = freshBatch(5); merge(b, 0L); batches :+= b }

    (1 to 30).foreach { step =>
      rnd.nextInt(4) match {
        case 0 | 1 => // merge the next batch
          val b = freshBatch(2 + rnd.nextInt(5))
          merge(b, batches.size.toLong)
          batches :+= b
        case 2 => // at-least-once replay of ANY prior batch
          val bid = rnd.nextInt(batches.size)
          val n = merge(batches(bid), bid.toLong)
          if (SemDedupStream.compactionWatermark(spark, outDir)
              .exists(bid <= _))
            assert(n === 0L, s"replay of folded batch $bid was not a no-op")
          contentLaw()
        case 3 => // fold + watermark law
          SemDedupStream.compact(spark, outDir)
          // dirs on disk = batches that accepted >= 1 vector and were
          // not already folded; the fold absorbs all but the newest
          // (fewer than two real dirs -> nothing to fold, wm holds)
          val realDirs = nonEmptyBatches().map(_.toLong).filter(_ > wm)
          if (realDirs.size >= 2) wm = realDirs.dropRight(1).last
          val w = SemDedupStream.compactionWatermark(spark, outDir)
          assert(w === (if (wm >= 0) Some(wm) else None),
            s"watermark after fold: $w, want wm=$wm " +
              s"(non-empty batches ${nonEmptyBatches().mkString(",")})")
          if (wm >= 0) {
            assert(merge(batches(wm.toInt), wm) === 0L,
              "replay at the watermark was not a no-op")
          }
          contentLaw()
      }
      if (step % 5 == 0) contentLaw()
    }
    contentLaw()
  }
}
