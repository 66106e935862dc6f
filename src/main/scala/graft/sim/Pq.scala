package graft.sim

import graft.functions.VectorExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Product quantization — the fourth ANN leg (brute cosine, hyperplane
  * LSH, IVF already ship) and the one that changes the 100 TB MEMORY
  * story: a 64-dim float vector (256 B) compresses to m one-byte codes
  * (m=8 → 32× smaller), so a candidate set that would never fit hot
  * storage as floats scans as codes, scored against a probe through
  * per-subspace lookup tables (the classic ADC — asymmetric distance
  * computation — of IVF-PQ systems).
  *
  * Determinism (no RNG anywhere): subspace codebooks train with Lloyd
  * iterations seeded by `xxhash64` of the subvector itself, so a given
  * corpus always yields the same model; assignment ties break to the
  * smallest code (the [[VectorExprs.NearestCentroid]] contract).
  *
  * Scale design: the model is m·k·(dim/m) doubles (m=8, k=16, dim=64 →
  * 1024 doubles) — MODEL state, bounded and data-size-independent,
  * collected once and inlined as codegen literals (the sanctioned Ivf
  * pattern). Training is ONE distributed aggregate per Lloyd iteration
  * over an exploded (subspace, subvector) frame — all m subspaces train
  * in the same pass, not m separate jobs. Encoding is a zero-shuffle,
  * zero-join, fully codegen'd map (m NearestCentroid kernels); ADC
  * scoring is m literal-array lookups + one division per row feeding
  * TakeOrderedAndProject. No UDFs, no driver-side per-row work.
  */
object Pq {

  /** Trained codebooks: `cents(j)(c)` is subspace j's centroid for code
    * c (codes are dense 0..cents(j).length-1). */
  final case class Model(m: Int, subDim: Int,
      cents: Array[Array[Array[Double]]])

  /** Split `embCol` into the exploded (j, sub) subvector frame. */
  private def subFrame(df: DataFrame, embCol: String, m: Int,
      subDim: Int): DataFrame =
    df.select(posexplode(expr(
      s"transform(sequence(0, ${m - 1}), jj -> " +
        s"slice($embCol, jj * $subDim + 1, $subDim))"))
      .as(Seq("j", "sub")))

  /** Per-(subspace, code) means of an assigned frame, collected to the
    * (tiny, bounded) model arrays with codes re-densified per subspace. */
  private def meansOf(assigned: DataFrame, m: Int): Array[Array[Array[Double]]] = {
    val rows = assigned
      .select(col("j"), col("lid"), posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy("j", "lid", "pos")
      .agg(avg(col("v").cast(DoubleType)).as("mv"))
      .groupBy("j", "lid")
      .agg(array_sort(collect_list(struct(col("pos"), col("mv"))))
        .as("pairs"))
      .select(col("j"), col("lid"),
        expr("transform(pairs, p -> p.mv)").as("centroid"))
      .collect()
    val byJ = rows.groupBy(_.getInt(0))
    Array.tabulate(m) { j =>
      byJ.getOrElse(j, Array.empty).sortBy(_.getLong(1))
        .map(_.getSeq[Double](2).toArray)
    }
  }

  /** Nearest-code assignment column for the exploded frame under the
    * current model: a when-chain of m codegen'd NearestCentroid kernels
    * (one per subspace, dense code ids). */
  private def assignExpr(model: Array[Array[Array[Double]]]): Column =
    model.zipWithIndex.foldLeft(lit(-1L)) { case (acc, (cs, j)) =>
      when(col("j") === j,
        VectorExprs.nearestCentroid(col("sub"), cs,
          Array.tabulate(cs.length)(_.toLong))).otherwise(acc)
    }

  /** Train m codebooks of (at most) k codes each with `iters`
    * deterministic Lloyd iterations (iteration 1 = hash-seeded means).
    * A code that loses all members disappears (classic Lloyd); codes
    * re-densify each collect. */
  def train(df: DataFrame, embCol: String, m: Int, subDim: Int, k: Int,
      iters: Int): Model = {
    require(iters >= 1 && m >= 1 && k >= 2, "bad PQ hyperparameters")
    val sub = subFrame(df, embCol, m, subDim)
    var cents = meansOf(
      sub.withColumn("lid", pmod(xxhash64(col("sub")), lit(k))), m)
    for (_ <- 2 to iters)
      cents = meansOf(sub.withColumn("lid", assignExpr(cents)), m)
    Model(m, subDim, cents)
  }

  /** Encode every vector to its m-code array — zero-shuffle codegen map:
    * output (idCol, codes array<bigint>). */
  def encode(df: DataFrame, idCol: String, embCol: String,
      model: Model): DataFrame =
    df.select(col(idCol),
      array(model.cents.zipWithIndex.map { case (cs, j) =>
        VectorExprs.nearestCentroid(
          slice(col(embCol), j * model.subDim + 1, model.subDim),
          cs, Array.tabulate(cs.length)(_.toLong))
      }.toIndexedSeq: _*).as("codes"))

  /** ADC approximate-cosine top-k for one probe: score every encoded
    * vector via per-subspace lookup tables built driver-side from the
    * probe (dot(probe_j, c) and |c|² per code), so per-row work is m
    * literal-array lookups, one sqrt, one division — then
    * TakeOrderedAndProject. approx_cos = dot(probe, reconstruct(v)) /
    * (|probe|·|reconstruct(v)|); |reconstruct|² is exactly additive
    * across subspaces. Output: (idCol, approx cosine).
    *
    * With `refine > k` (the production IVF-PQ shape) the ADC pass only
    * PRUNES — its top-`refine` shortlist is re-ranked by EXACT cosine
    * (broadcast the parameter-bounded shortlist back onto the corpus,
    * codegen'd DotLit/Norm2, TakeOrdered k), so quantization error
    * costs recall only when a true neighbor falls outside the
    * shortlist, not when it merely reorders inside it. */
  def probeTopK(df: DataFrame, idCol: String, embCol: String,
      probeId: Long, k: Int, m: Int = 8, codes: Int = 16,
      iters: Int = 2, refine: Int = 0): DataFrame = {
    val s = df.sparkSession
    val dim = df.select(size(col(embCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val probeRow = df.filter(col(idCol) === probeId)
      .select(col(embCol)).limit(1).collect().headOption.getOrElse(
        return s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(idCol, LongType),
            org.apache.spark.sql.types.StructField("approx_cos", DoubleType)))))
    val probe = probeRow.getSeq[Float](0).map(_.toDouble).toArray
    val model = train(df, embCol, m, subDim, codes, iters)
    adcOne(df, encode(df, idCol, embCol, model), idCol, embCol, model,
      probe, probeId, k, refine)
  }

  /** ADC + optional exact refine for ONE probe against an
    * already-trained model and already-encoded corpus — the scoring
    * core shared by [[probeTopK]] and [[multiProbeTopK]]. */
  private def adcOne(df: DataFrame, encoded: DataFrame, idCol: String,
      embCol: String, model: Model, probe: Array[Double], probeId: Long,
      k: Int, refine: Int): DataFrame = {
    val probeNorm = math.sqrt(probe.map(x => x * x).sum)
    val subDim = model.subDim
    // driver-side LUTs: tiny (m × codes doubles each)
    def lutCols(j: Int): (Column, Column) = {
      val pj = probe.slice(j * subDim, (j + 1) * subDim)
      val dots = model.cents(j).map(c =>
        c.zip(pj).map { case (a, b) => a * b }.sum)
      val norms = model.cents(j).map(_.map(x => x * x).sum)
      val idx = (element_at(col("codes"), j + 1) + 1).cast(IntegerType)
      (element_at(array(dots.map(lit).toIndexedSeq: _*), idx),
        element_at(array(norms.map(lit).toIndexedSeq: _*), idx))
    }
    val (dotSum, normSum) = (0 until model.m).map(lutCols)
      .reduce[(Column, Column)] { case ((d1, n1), (d2, n2)) =>
        (d1 + d2, n1 + n2)
      }
    val adc = encoded.filter(col(idCol) =!= probeId)
      .select(col(idCol),
        (dotSum / (lit(probeNorm) * sqrt(normSum))).as("raw"))
      // zero-norm reconstruction (all-zero vector) scores NaN → floor it
      .select(col(idCol),
        when(isnan(col("raw")), lit(-2.0)).otherwise(col("raw"))
          .as("approx_cos"))
      .orderBy(col("approx_cos").desc, col(idCol))
    if (refine <= k) adc.limit(k)
    else {
      val shortlist = adc.limit(refine).select(col(idCol))
      df.join(broadcast(shortlist), idCol) // parameter-bounded broadcast
        .select(col(idCol),
          (VectorExprs.dotLit(col(embCol), probe) /
            (lit(probeNorm) * sqrt(VectorExprs.norm2(col(embCol)))))
            .as("approx_cos"))
        .orderBy(col("approx_cos").desc, col(idCol))
        .limit(k)
    }
  }

  /** Batch-of-probes PQ top-k: train the codebooks and encode the
    * corpus ONCE, then run each probe's LUT scoring over the shared
    * encoded frame — [[probeTopK]] pays train+encode per call, which a
    * multi-probe eval must not. Output: (probe_id, idCol, approx_cos),
    * k rows per FOUND probe id. Per-probe results are bit-identical to
    * the single-probe call (same model, same encode, same LUT math). */
  def multiProbeTopK(df: DataFrame, idCol: String, embCol: String,
      probeIds: Seq[Long], k: Int, m: Int = 8, codes: Int = 16,
      iters: Int = 2, refine: Int = 0): DataFrame = {
    require(probeIds.nonEmpty, "need at least one probe id")
    val dim = df.select(size(col(embCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val model = train(df, embCol, m, dim / m, codes, iters)
    // encoded once, materialized once — every probe scans these blocks
    val encoded = encode(df, idCol, embCol, model).localCheckpoint(true)
    val probes = df.filter(col(idCol).isin(probeIds: _*))
      .select(col(idCol), col(embCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    probeIds.filter(probes.contains).map { pid =>
      adcOne(df, encoded, idCol, embCol, model, probes(pid), pid, k, refine)
        .withColumn("probe_id", lit(pid))
        .select("probe_id", idCol, "approx_cos")
    }.reduce(_.unionByName(_))
  }
}
