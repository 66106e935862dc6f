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
}
