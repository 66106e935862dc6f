package graft

import graft.sim.{Ann, Ivf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN checks: assignment integrity, exact cosine math on the probed
  * subset, and non-trivial recall vs brute force (deterministic — the
  * quantizer is label-seeded, no RNG). */
class IvfSpec extends AnyFunSuite with SparkFixture {

  private def e = Tables.embeddings(spark, Sf)

  test("every vector lands in exactly one inverted list") {
    val cents = Ivf.centroids(e, "embedding", "label")
    assert(cents.count() === 10)
    val assigned = Ivf.assign(e, cents, "vec_id", "embedding")
    assert(assigned.count() === e.count())
    assert(assigned.groupBy("vec_id").count().filter(col("count") =!= 1)
      .count() === 0)
  }

  test("probe searches nProbe lists and reproduces brute-force cosines") {
    val ivf = Ivf.probeTopK(e, "vec_id", "embedding", "label",
      probeId = 0L, k = 10, nProbe = 3).collect()
    assert(ivf.nonEmpty)
    assert(ivf.map(_.getLong(1)).distinct.length <= 3, "searched >nProbe lists")
    val brute = Ann.bruteTopK(e, "vec_id", "embedding", probeId = 0L, k = 2000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach { r =>
      assert(math.abs(brute(r.getLong(0)) - r.getDouble(2)) < 1e-12,
        s"cosine mismatch for ${r.getLong(0)}")
    }
  }

  test("recall vs brute force is non-trivial at nProbe=3 of 10") {
    val ivfIds = Ivf.probeTopK(e, "vec_id", "embedding", "label",
      probeId = 0L, k = 10, nProbe = 3).collect().map(_.getLong(0)).toSet
    val bruteIds = Ann.bruteTopK(e, "vec_id", "embedding", probeId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (ivfIds & bruteIds).size / 10.0
    // near-random embeddings: probing 3/10 lists should still recover some
    // true neighbors; the exact value is deterministic for this corpus
    assert(recall > 0.0, s"zero recall: ivf=$ivfIds brute=$bruteIds")
  }

  /** Deterministic clustered corpus with DELIBERATELY junk seed labels:
    * 3 well-separated clusters on axes 0/1/2 (center value 10, jitter
    * ±0.5 from a sine of the ids — no RNG), seed = vec_id % 5, which cuts
    * across every cluster. Iteration 1's centroids are all near the
    * global mean; Lloyd iterations must recover the real structure. */
  private def clustered = {
    import spark.implicits._
    (0 until 150).map { i =>
      val c = i / 50
      val emb = Array.tabulate(8) { d =>
        val jitter = (math.sin(i * (d + 1) + 0.7) * 0.5).toFloat
        (if (d == c) 10.0f else 0.0f) + jitter
      }
      (i.toLong, i % 5, emb)
    }.toDF("vec_id", "label", "embedding")
  }

  test("Lloyd iterations: recall improves monotonically on clustered data") {
    val brute = Ann.bruteTopK(clustered, "vec_id", "embedding",
      probeId = 0L, k = 10).collect().map(_.getLong(0)).toSet
    def recallAt(iters: Int): Double = {
      val ids = Ivf.probeTopK(clustered, "vec_id", "embedding", "label",
        probeId = 0L, k = 10, nProbe = 1, iters = iters)
        .collect().map(_.getLong(0)).toSet
      (ids & brute).size / 10.0
    }
    val (r1, r3, r5) = (recallAt(1), recallAt(3), recallAt(5))
    assert(r3 >= r1, s"recall fell with iterations: r1=$r1 r3=$r3")
    assert(r5 >= r3, s"recall fell with iterations: r3=$r3 r5=$r5")
    assert(r5 > r1, s"training never improved recall: r1=$r1 r5=$r5")
    assert(r5 === 1.0, s"converged quantizer should nail this corpus: $r5")
  }

  test("splitHotLists: hot lists split deterministically, membership conserved") {
    import org.apache.spark.sql.DataFrame
    // seed everything into ONE list — maximally hot
    val one = clustered.withColumn("label", lit(0))
    val c0 = Ivf.centroids(one, "embedding", "label")
    assert(c0.count() === 1)
    def maxListSize(cents: DataFrame): Long =
      Ivf.assign(one, cents, "vec_id", "embedding")
        .groupBy("list_id").count().agg(max("count")).collect()(0).getLong(0)
    // each round must cut the worst list; two rounds reach <= 60 here
    val c1 = Ivf.splitHotLists(one, c0, "embedding", maxListSize = 60)
    val c2 = Ivf.splitHotLists(one, c1, "embedding", maxListSize = 60)
    assert(c1.count() === 2 && c2.count() >= 3)
    assert(maxListSize(c1) < 150 && maxListSize(c2) <= 60,
      s"sizes: round1=${maxListSize(c1)} round2=${maxListSize(c2)}")
    // membership conserved: every vector in exactly one list
    val a = Ivf.assign(one, c2, "vec_id", "embedding")
    assert(a.count() === 150)
    assert(a.groupBy("vec_id").count().filter(col("count") =!= 1).count() === 0)
    // a quantizer with no hot lists is returned unchanged
    assert(Ivf.splitHotLists(one, c2, "embedding", maxListSize = 60)
      .collect().toSet === c2.collect().toSet)
    // determinism: the same inputs split the same way
    assert(Ivf.splitHotLists(one, c0, "embedding", maxListSize = 60)
      .collect().toSet === c1.collect().toSet)
  }

  test("splitHotListsToFixpoint: one call bounds EVERY list (the " +
      "multi-round adversarial-blob case); degenerate corpora terminate") {
    import spark.implicits._
    // one maximally hot list needing > 1 halving round to reach 20
    val one = clustered.withColumn("label", lit(0))
    val c0 = Ivf.centroids(one, "embedding", "label")
    val cFix = Ivf.splitHotListsToFixpoint(one, c0, "embedding",
      maxListSize = 20)
    val sizes = Ivf.assign(one, cFix, "vec_id", "embedding")
      .groupBy("list_id").count().collect().map(_.getLong(1))
    assert(sizes.max <= 20,
      s"fixpoint left a hot list: max=${sizes.max}")
    assert(sizes.sum === 150, "membership not conserved")
    // degenerate: identical vectors can never split — the fixpoint
    // returns after ONE probe round instead of spinning to maxRounds
    val dup = (0 until 100)
      .map(i => (i.toLong, Array(1.0f, 2.0f, 3.0f, 4.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val d0 = Ivf.centroids(dup, "embedding", "label")
    assert(Ivf.splitHotListsToFixpoint(dup, d0, "embedding", 10)
      .collect().toSet === d0.collect().toSet)
    // maxRounds = 1 is exactly one splitHotLists round
    assert(Ivf.splitHotListsToFixpoint(one, c0, "embedding", 60,
        maxRounds = 1).collect().toSet
      === Ivf.splitHotLists(one, c0, "embedding", 60).collect().toSet)
  }

  test("splitHotLists: all-duplicate hot list is a fixpoint, not an infinite loop") {
    import spark.implicits._
    // 100 identical vectors: no plane can separate them — the documented
    // degenerate case. splitHotLists must return the quantizer UNCHANGED
    // (the explicit termination signal), not a silent no-op child that
    // keeps a caller loop spinning with ever-growing list ids.
    val dup = (0 until 100)
      .map(i => (i.toLong, Array(1.0f, 2.0f, 3.0f, 4.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val c0 = Ivf.centroids(dup, "embedding", "label")
    val c1 = Ivf.splitHotLists(dup, c0, "embedding", maxListSize = 10)
    assert(c1.collect().toSet === c0.collect().toSet,
      "degenerate split must be the identity")
    // mixed case: a splittable hot list still splits even when a
    // degenerate one is present; the degenerate list keeps its centroid
    // far-away tight cluster with spread on dim 0 only, so nearest-
    // centroid assignment keeps the two families separate
    val mixed = dup.unionByName((0 until 100)
      .map(i => (1000L + i,
        Array(1000f + i * 0.01f, 0.0f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label"))
    val m0 = Ivf.centroids(mixed, "embedding", "label")
    val m1 = Ivf.splitHotLists(mixed, m0, "embedding", maxListSize = 60)
    assert(m1.count() === 3, "splittable list did not split")
    val dupCent = c0.collect().head.getSeq[Double](1)
    assert(m1.filter(col("list_id") === 0).collect()
      .head.getSeq[Double](1) === dupCent,
      "degenerate list's centroid must be untouched")
  }
}
