package graft

import graft.sim.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed PCA laws: the integer-snapped moment pass makes the model
  * layout-invariant; the driver eigensolve must return genuine
  * eigenpairs; reconstruction error must never increase with k. */
class PcaSpec extends AnyFunSuite with SparkFixture {

  private lazy val emb = Tables.embeddings(spark, Sf)

  test("model is bit-identical across partition layouts (fold-order-free moments)") {
    val m1 = Pca.fit(emb.repartition(1), "embedding", k = 4)
    val m7 = Pca.fit(emb.repartition(7), "embedding", k = 4)
    assert(m1.n === m7.n)
    assert(m1.mean.toSeq === m7.mean.toSeq)
    assert(m1.eigenvalues.toSeq === m7.eigenvalues.toSeq)
    m1.components.zip(m7.components).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }

  test("eigenpairs satisfy A·v = λ·v and components are orthonormal") {
    val model = Pca.fit(emb, "embedding", k = 4)
    // rebuild the covariance the fit used, from the same moments
    val (n, s1, s2) = Pca.moments(emb, "embedding")
    val cov = Pca.covariance(n, s1, s2)
    val d = s1.length
    model.components.zip(model.eigenvalues).foreach { case (v, lambda) =>
      val av = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val resid = math.sqrt(av.zip(v).map { case (a, x) =>
        val e = a - lambda * x; e * e }.sum)
      assert(resid < 1e-8, s"A·v deviates from λ·v by $resid (λ=$lambda)")
    }
    for (i <- model.components.indices; j <- i until model.components.length) {
      val dot = model.components(i).zip(model.components(j))
        .map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"components ${i}x${j} = $dot")
    }
  }

  test("eigenvalues are descending; explained variance sums to at most 1") {
    val model = Pca.fit(emb, "embedding", k = 8)
    model.eigenvalues.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12)
    }
    val evr = model.explainedVarianceRatio
    assert(evr.forall(r => r >= 0 && r <= 1.0 + 1e-12))
    assert(evr.sum <= 1.0 + 1e-9)
  }

  test("reconstruction error never increases with k; projection variance is ordered") {
    import spark.implicits._
    val vs = emb.select(col("embedding")).as[Array[Float]].head(20)
    val m2 = Pca.fit(emb, "embedding", k = 2)
    val m8 = Pca.fit(emb, "embedding", k = 8)
    vs.foreach { x =>
      val e2 = Pca.reconstructionSqError(x, m2)
      val e8 = Pca.reconstructionSqError(x, m8)
      assert(e8 <= e2 + 1e-9, s"more components worsened reconstruction")
    }
    // top component carries at least as much sample variance as the 2nd
    val proj = Pca.project(emb, "embedding", m8)
      .select(var_samp(col("pc1")), var_samp(col("pc2"))).head()
    assert(proj.getDouble(0) >= proj.getDouble(1) - 1e-9)
  }

  test("q_embed_pca dumps a bounded per-label frame") {
    val df = ops.ImplOps.embedPca.fn(spark, Sf)
    val rows = df.collect()
    assert(rows.length === 10)
    assert(df.columns.toSeq === Seq("label", "n", "pc1_mean_micro",
      "pc2_mean_micro", "evr_top2_milli"))
    assert(rows.map(_.getAs[Long]("n")).sum === emb.count())
  }
}
