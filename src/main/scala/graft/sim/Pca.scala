package graft.sim

import graft.functions.VectorExprs.dotLit
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed exact-moment PCA over an embedding column — the
  * whitening / dimensionality-reduction step an embedding store runs
  * before indexing (decorrelate dims, keep the top-k components, spend
  * the PQ/IVF budget where the variance is).
  *
  * Shape (the Ivf "bounded model state" contract, `sim/Ivf.scala`):
  *  - ONE typed-Aggregator pass over the corpus accumulates the d(d+1)/2
  *    upper-triangle second moments + d first moments + count, all in
  *    INTEGER micro-units (each per-row product snapped once) — partials
  *    merge map-side, the shuffle carries one 2 144-long buffer per
  *    partition, and the distributed sums are fold-order-free, so the
  *    model is layout-invariant (PcaSpec proves repartition invariance).
  *  - The eigensolve runs on the DRIVER over the d×d covariance — 64×64
  *    here, a few KB; cyclic Jacobi with a fixed sweep order and sweep
  *    count, deterministic to the bit. Model state stays bounded by d²,
  *    never by the corpus.
  *  - Projection is MAP-ONLY: each component is one codegen'd
  *    [[graft.functions.VectorExprs.dotLit]] against the literal
  *    component vector (no join, no broadcast frame, nothing shuffles).
  *
  * At 100 TB: the moment pass is the only corpus touch (CPU O(n·d²),
  * the covariance lower bound); everything downstream is arithmetic on
  * the driver plus a map-only projection — the same split Lloyd/PQ
  * training uses.
  */
object Pca {

  /** Snap scale for per-row moment contributions: products of
    * embedding coordinates (‖x‖≈1 ⇒ |xi·xj| ≤ 1) snapped at 1e8 keep
    * 8 exact decimal digits; 2⁶³/1e8 ≈ 9.2e10 rows before overflow. */
  private val Snap = 1e8

  final case class MomentBuffer(var n: Long, var s1: Array[Long],
                                var s2: Array[Long])

  /** One-pass integer-snapped moment accumulator: s1(i) = Σ ⌊xi·1e8⌉,
    * s2(tri(i,j)) = Σ ⌊xi·xj·1e8⌉ over the upper triangle. */
  object MomentAgg extends Aggregator[Array[Float], MomentBuffer,
      (Long, Array[Long], Array[Long])] {
    override def zero: MomentBuffer =
      MomentBuffer(0L, Array.emptyLongArray, Array.emptyLongArray)

    override def reduce(b: MomentBuffer, v: Array[Float]): MomentBuffer = {
      val d = v.length
      if (b.s1.isEmpty) {
        b.s1 = new Array[Long](d); b.s2 = new Array[Long](d * (d + 1) / 2)
      }
      require(b.s1.length == d, "ragged embedding dimensions")
      var i = 0
      var t = 0
      while (i < d) {
        b.s1(i) += math.floor(v(i) * Snap + 0.5).toLong
        var j = i
        while (j < d) {
          b.s2(t) += math.floor(v(i).toDouble * v(j) * Snap + 0.5).toLong
          t += 1; j += 1
        }
        i += 1
      }
      b.n += 1
      b
    }

    override def merge(a: MomentBuffer, b: MomentBuffer): MomentBuffer = {
      if (a.s1.isEmpty) b
      else if (b.s1.isEmpty) a
      else {
        var i = 0
        while (i < a.s1.length) { a.s1(i) += b.s1(i); i += 1 }
        var t = 0
        while (t < a.s2.length) { a.s2(t) += b.s2(t); t += 1 }
        a.n += b.n
        a
      }
    }

    override def finish(b: MomentBuffer): (Long, Array[Long], Array[Long]) =
      (b.n, b.s1, b.s2)

    override def bufferEncoder: Encoder[MomentBuffer] = Encoders.product
    override def outputEncoder: Encoder[(Long, Array[Long], Array[Long])] =
      Encoders.tuple(Encoders.scalaLong,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
  }

  final case class Model(n: Long, mean: Array[Double],
                         components: Array[Array[Double]],
                         eigenvalues: Array[Double]) {
    /** Fraction of total variance per component (descending). */
    def explainedVarianceRatio: Array[Double] = {
      val tot = eigenvalues.sum
      eigenvalues.map(_ / tot)
    }
  }

  /** The one corpus pass: count + snapped first/second moments. */
  private[graft] def moments(df: DataFrame,
      embCol: String): (Long, Array[Long], Array[Long]) = {
    import df.sparkSession.implicits._
    val row = df.select(col(embCol)).as[Array[Float]]
      .select(udaf(MomentAgg).apply(col(embCol)).as("m"))
      .select(col("m._1"), col("m._2"), col("m._3")).head()
    (row.getLong(0), row.getSeq[Long](1).toArray, row.getSeq[Long](2).toArray)
  }

  /** Exact covariance from the snapped integer moments:
    * cov(i,j) = (S2ij − S1i·S1j/n) / (n·Snap) — both terms derived from
    * the SAME integers every layout produces, so the matrix (and hence
    * the whole model) is bit-identical across partitionings. */
  private[graft] def covariance(n: Long, s1: Array[Long],
      s2: Array[Long]): Array[Array[Double]] = {
    val d = s1.length
    val c = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        // S2 is snapped at 1e8, S1 at 1e8 ⇒ S1i·S1j carries 1e16; align
        val cij = (s2(t).toDouble / Snap -
          s1(i).toDouble * s1(j) / (Snap * Snap) / n) / n
        c(i)(j) = cij; c(j)(i) = cij
        t += 1; j += 1
      }
      i += 1
    }
    c
  }

  /** Deterministic cyclic Jacobi eigensolver for a symmetric matrix:
    * fixed (p,q) sweep order, fixed sweep count — no data-dependent
    * pivoting, so identical input bits give identical eigenpairs. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 30)
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    while (s < sweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0 // 45° rotation when diagonals tie
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      s += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fit a k-component model. Total order on eigenpairs: eigenvalue
    * DESC, then original index ASC; sign convention: the component's
    * largest-|coordinate| entry is positive (ties to the lowest index)
    * — every choice pinned so two fits of the same corpus agree. */
  def fit(df: DataFrame, embCol: String, k: Int): Model = {
    import df.sparkSession.implicits._
    val (n, s1, s2) = moments(df, embCol)
    require(n > 0, "empty corpus")
    val d = s1.length
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    val cov = covariance(n, s1, s2)
    val (evals, evecs) = jacobiEigen(cov)
    val order = (0 until d).sortBy(i => (-evals(i), i)).take(k)
    val comps = order.map { i =>
      val c = Array.tabulate(d)(r => evecs(r)(i))
      val m = c.indices.maxBy(j => (math.abs(c(j)), -j))
      if (c(m) < 0) c.map(x => -x) else c
    }.toArray
    val mean = s1.map(_.toDouble / Snap / n)
    Model(n, mean, comps, order.map(i => math.max(evals(i), 0.0)).toArray)
  }

  /** Map-only projection: k codegen'd literal dots against the CENTERED
    * input — x·cᵢ − μ·cᵢ, the mean dot folded to one literal constant
    * per component. Appends `pc1..pck` DOUBLE columns. */
  def project(df: DataFrame, embCol: String, model: Model): DataFrame = {
    val meanDots = model.components.map(c =>
      c.indices.map(i => c(i) * model.mean(i)).sum)
    model.components.zipWithIndex.foldLeft(df) { case (acc, (comp, i)) =>
      acc.withColumn(s"pc${i + 1}",
        dotLit(col(embCol), comp) - lit(meanDots(i)))
    }
  }

  /** Reconstruction squared error of a row under the model — spec fuel:
    * adding components must never increase it. */
  private[graft] def reconstructionSqError(x: Array[Float], model: Model)
      : Double = {
    val d = x.length
    val centered = Array.tabulate(d)(i => x(i) - model.mean(i))
    val coords = model.components.map(c =>
      c.indices.map(i => c(i) * centered(i)).sum)
    val rec = new Array[Double](d)
    model.components.zipWithIndex.foreach { case (c, ci) =>
      var i = 0
      while (i < d) { rec(i) += coords(ci) * c(i); i += 1 }
    }
    var err = 0.0
    var i = 0
    while (i < d) { val e = centered(i) - rec(i); err += e * e; i += 1 }
    err
  }
}
