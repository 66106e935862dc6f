package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the dense twin of the lexical inverted index
  * (RetrievalOps): "build once, probe many". [[Ivf.probeTopK]] trains
  * and assigns per CALL, which is right for one-off analytics; a serving
  * path builds the index once and answers every probe from layout:
  *
  *  - `dir/vectors/` — the corpus with its list assignment,
  *    hive-partitioned BY list_id: a probe reads its nProbe nearest
  *    lists as a planning-time directory prune, never the corpus.
  *  - `dir/centroids/` — the bounded quantizer (k rows), read and
  *    collected per query (the Ivf model-state contract).
  *
  * Determinism: the quantizer is [[Ivf.centroidsIter]]'s (no RNG), the
  * assignment is the codegen'd NearestCentroid with ties to the lowest
  * list, and the probe-side cosine reuses the same dotLit/norm2 fold
  * shapes as [[Ivf.probeTopK]] and [[Ann.bruteTopK]] — so an index query
  * is BIT-IDENTICAL to the per-call IVF probe with the same parameters
  * (IvfIndexSpec asserts exact equality, plus physical pruning via the
  * scan's numFiles metric).
  *
  * At 100 TB: lists shard across the fleet as directories; hot lists are
  * split by [[Ivf.splitHotLists]] BEFORE the write (pass the splitter's
  * output as `cents`), so no directory outgrows its neighbors. Probe
  * cost is nProbe directory reads + one TakeOrderedAndProject.
  */
object IvfIndex {

  def vectorsPath(dir: String): String = s"$dir/vectors"
  def centroidsPath(dir: String): String = s"$dir/centroids"

  /** Build and persist the index. `cents` defaults to k-iteration Lloyd
    * over the corpus; pass a pre-split quantizer to bound hot lists. */
  def write(df: DataFrame, dir: String, idCol: String, embCol: String,
      seedCol: String, iters: Int = 3,
      cents: Option[DataFrame] = None): Unit = {
    val quantizer = cents.getOrElse(Ivf.centroidsIter(df, embCol, seedCol, iters))
    Ivf.assign(df, quantizer, idCol, embCol)
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(vectorsPath(dir))
    quantizer.coalesce(1).write.mode("overwrite").parquet(centroidsPath(dir))
  }

  /** Top-k by cosine for a probe VECTOR: nearest nProbe centroids are
    * driver-side scalar math over the k-row quantizer; the corpus-side
    * work is a directory-pruned scan of those lists feeding a parallel
    * partial top-k. `excludeId` drops the probe's own row when probing
    * by a corpus member. */
  def query(spark: SparkSession, dir: String, probe: Array[Double],
      idCol: String, embCol: String, k: Int = 10, nProbe: Int = 3,
      excludeId: Option[Long] = None): DataFrame = {
    val cs = spark.read.parquet(centroidsPath(dir)).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    val probedLists = cs.map { case (lid, c) =>
      val d2 = probe.indices.foldLeft(0.0) { (acc, i) =>
        acc + (probe(i) - c(i)) * (probe(i) - c(i))
      }
      (d2, lid)
    }.sorted.take(nProbe).map(_._2)
    import graft.functions.VectorExprs.{dotLit, norm2}
    val normProbe = lit(math.sqrt(probe.foldLeft(0.0)((a, x) => a + x * x)))
    val base = spark.read.parquet(vectorsPath(dir))
      .filter(col("list_id").isin(probedLists: _*))
    val cands = excludeId.fold(base)(id => base.filter(col(idCol) =!= id))
    cands
      .withColumn("cos_sim",
        dotLit(col(embCol), probe) / (sqrt(norm2(col(embCol))) * normProbe))
      // partition-column type inference narrows list_id to int on read;
      // restore probeTopK's schema so index and per-call results compare
      .select(col(idCol),
        col("list_id").cast(org.apache.spark.sql.types.LongType).as("list_id"),
        col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Probe by corpus member id: fetch its vector (one pruned lookup is
    * not possible without knowing its list — a serving deployment keys a
    * side lookup; here one filter scan), then [[query]] excluding it. */
  def queryById(spark: SparkSession, dir: String, probeId: Long,
      idCol: String, embCol: String, k: Int = 10, nProbe: Int = 3): DataFrame = {
    val row = spark.read.parquet(vectorsPath(dir))
      .filter(col(idCol) === probeId).select(col(embCol)).limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException(s"probe id $probeId not in index"))
    val probe = row.getSeq[Float](0).map(_.toDouble).toArray
    query(spark, dir, probe, idCol, embCol, k, nProbe, excludeId = Some(probeId))
  }
}
