package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF-style ANN (the "IVF variant" of the north-star brief): a coarse
  * quantizer partitions the corpus into inverted lists; a probe searches
  * only the nProbe nearest lists.
  *
  * The coarse centroids here are one Lloyd iteration seeded by the label
  * column (deterministic — no RNG, so tests are exact); a production
  * build would iterate a few more times or plug in trained centroids. At
  * 100 TB the list id becomes the partition/bucket key, so a probe reads
  * nProbe partitions instead of the whole corpus, and list sizes are the
  * skew knob (split hot lists, like IVF-PQ systems do).
  *
  * Everything is DataFrame-native: centroids via posexplode + per-dim
  * means, assignment via a broadcast crossJoin + aggregate-fold distance,
  * no UDFs.
  */
object Ivf {

  private def sqDistExpr(a: String, b: String): String =
    s"""aggregate(sequence(1, size($a)), CAST(0 AS DOUBLE),
       |(acc, i) -> acc + (CAST(element_at($a, i) AS DOUBLE) - element_at($b, i))
       |            * (CAST(element_at($a, i) AS DOUBLE) - element_at($b, i)))""".stripMargin

  /** Per-seed-list centroids as DOUBLE arrays: (list_id, centroid). */
  def centroids(df: DataFrame, embCol: String, seedCol: String): DataFrame =
    df.select(col(seedCol).cast(LongType).as("list_id"),
        posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy("list_id", "pos")
      .agg(avg(col("v").cast(DoubleType)).as("mean_v"))
      .groupBy("list_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("mean_v"))))
        .as("pairs"))
      .select(col("list_id"),
        expr("transform(pairs, p -> p.mean_v)").as("centroid"))

  /** Assign every vector to its nearest centroid (one Lloyd step).
    * Output: df columns + list_id. */
  def assign(df: DataFrame, cents: DataFrame, idCol: String,
             embCol: String): DataFrame = {
    val withDist = df.crossJoin(broadcast(cents))
      .withColumn("d2", expr(sqDistExpr(embCol, "centroid")))
    // nearest list per vector, ties broken by list_id for determinism
    val best = withDist
      .groupBy(col(idCol).as("assign_id"))
      .agg(min(struct(col("d2"), col("list_id"))).as("best"))
      .select(col("assign_id"), col("best.list_id").as("list_id"))
    df.join(best, df(idCol) === col("assign_id")).drop("assign_id")
  }

  /** IVF top-k: search only the nProbe lists nearest to the probe vector.
    * Output: (idCol, list_id, cos_sim), the k best candidates. */
  def probeTopK(df: DataFrame, idCol: String, embCol: String, seedCol: String,
                probeId: Long, k: Int, nProbe: Int): DataFrame = {
    val cents = centroids(df, embCol, seedCol).cache()
    val assigned = assign(df, cents, idCol, embCol)
    val probeVec = df.filter(col(idCol) === probeId)
      .select(col(embCol).as("probe_emb"))
    val probedLists = probeVec.crossJoin(broadcast(cents))
      .withColumn("d2", expr(sqDistExpr("probe_emb", "centroid")))
      .orderBy(col("d2"), col("list_id"))
      .limit(nProbe)
      .select("list_id")
    val cands = assigned
      .join(broadcast(probedLists), "list_id")
      .filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probeVec))
    cands
      .withColumn("cos_sim",
        expr(
          s"""aggregate(sequence(1, size($embCol)), CAST(0 AS DOUBLE),
             |(acc, i) -> acc + CAST(element_at($embCol, i) AS DOUBLE)
             |  * CAST(element_at(probe_emb, i) AS DOUBLE))""".stripMargin) /
          (sqrt(expr(
            s"""aggregate($embCol, CAST(0 AS DOUBLE),
               |(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin)) *
            sqrt(expr(
              """aggregate(probe_emb, CAST(0 AS DOUBLE),
                |(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin))))
      .select(col(idCol), col("list_id"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
