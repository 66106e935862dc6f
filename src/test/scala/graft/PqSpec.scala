package graft

import graft.sim.{Ann, Pq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization laws: structural code bounds, full determinism
  * (hash-seeded Lloyd — no RNG), Lloyd distortion monotonicity, and
  * ADC recall against brute-force cosine. */
class PqSpec extends AnyFunSuite with SparkFixture {

  private def e = Tables.embeddings(spark, Sf)
  private val (m, subDim, k) = (8, 8, 16)

  test("codes are m dense in-range entries; model shape is bounded") {
    val model = Pq.train(e, "embedding", m, subDim, k, iters = 2)
    assert(model.cents.length === m)
    model.cents.foreach { cs =>
      assert(cs.nonEmpty && cs.length <= k)
      cs.foreach(c => assert(c.length === subDim))
    }
    val codes = Pq.encode(e, "vec_id", "embedding", model).collect()
    assert(codes.length === e.count())
    codes.foreach { r =>
      val cs = r.getSeq[Long](1)
      assert(cs.length === m)
      cs.zipWithIndex.foreach { case (c, j) =>
        assert(c >= 0 && c < model.cents(j).length, s"code $c subspace $j")
      }
    }
  }

  test("training and encoding are deterministic end to end") {
    val a = Pq.train(e, "embedding", m, subDim, k, iters = 2)
    val b = Pq.train(e, "embedding", m, subDim, k, iters = 2)
    assert(a.cents.map(_.map(_.toSeq).toSeq).toSeq ===
      b.cents.map(_.map(_.toSeq).toSeq).toSeq)
    val ca = Pq.encode(e, "vec_id", "embedding", a).collect().map(_.toSeq)
    val cb = Pq.encode(e, "vec_id", "embedding", b).collect().map(_.toSeq)
    assert(ca.toSeq === cb.toSeq)
  }

  test("Lloyd iterations never increase total reconstruction distortion") {
    // driver-side exact distortion over the (small) spec corpus
    val vecs = e.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    def distortion(iters: Int): Double = {
      val model = Pq.train(e, "embedding", m, subDim, k, iters)
      vecs.map { v =>
        (0 until m).map { j =>
          val sub = v.slice(j * subDim, (j + 1) * subDim)
          model.cents(j).map(c =>
            c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum
    }
    val (d1, d2, d3) = (distortion(1), distortion(2), distortion(3))
    assert(d2 <= d1 + 1e-9, s"d1=$d1 d2=$d2")
    assert(d3 <= d2 + 1e-9, s"d2=$d2 d3=$d3")
  }

  test("ADC + exact re-rank: recall laws on random and clustered corpora") {
    // The spec corpus is NEAR-RANDOM (cosine spread ~0.23-0.33 — a numpy
    // PQ replication gets the same numbers), the hardest regime for any
    // quantizer. Laws here: ADC prunes sanely and exact re-ranking can
    // only help.
    val brute = Ann.bruteTopK(e, "vec_id", "embedding", probeId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val adcOnly = Pq.probeTopK(e, "vec_id", "embedding", probeId = 0L,
      k = 10).collect().map(_.getLong(0)).toSet
    assert(adcOnly.size === 10)
    assert((adcOnly & brute).nonEmpty, "ADC pruning lost the whole true set")
    val refined = Pq.probeTopK(e, "vec_id", "embedding", probeId = 0L,
      k = 10, refine = 50).collect().map(_.getLong(0)).toSet
    assert((refined & brute).size >= (adcOnly & brute).size,
      "exact re-ranking over the ADC shortlist reduced recall")
    assert((refined & brute).size >= 5,
      s"shortlist recall collapsed: ${(refined & brute).size}/10")

    // Clustered data — the regime ANN actually serves — must recall the
    // full true top-10 through the refined path.
    import spark.implicits._
    val clustered = (0 until 300).map { i =>
      val c = i % 5
      val base = Array.tabulate(64)(p =>
        if (p % 5 == c) 4.0f else 0.1f * ((i * 31 + p) % 7))
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val cb = Ann.bruteTopK(clustered, "vec_id", "embedding",
      probeId = 0L, k = 10).collect().map(_.getLong(0)).toSet
    val cr = Pq.probeTopK(clustered, "vec_id", "embedding", probeId = 0L,
      k = 10, refine = 50).collect().map(_.getLong(0)).toSet
    val recall = (cr & cb).size / 10.0
    assert(recall >= 0.9, s"clustered refined recall@10 = $recall")
  }

  test("an unknown probe id yields an empty result, not a crash") {
    assert(Pq.probeTopK(e, "vec_id", "embedding", probeId = -12345L,
      k = 10).count() === 0)
  }
}
