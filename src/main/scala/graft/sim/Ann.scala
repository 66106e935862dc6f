package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate nearest-neighbor search over an embedding column
  * (SURVEY.md §2.2-K impl row).
  *
  * Baseline: brute-force cosine top-k (one broadcast of the probe, no
  * shuffle of the big side — the q_sim_topk plan). Scale path: random-
  * hyperplane LSH — an nBits-bit bucket per vector from the signs of dot
  * products with deterministic pseudo-random hyperplanes (weights derived
  * from xxhash64(plane, dim), so every executor materializes the same
  * planes with zero driver-side state or broadcast). Candidates = probe's
  * bucket only; at 100 TB the bucket column becomes the partition key so
  * a probe touches one partition instead of the whole corpus. Recall is
  * tunable via nBits (fewer bits → bigger buckets → higher recall); probe
  * multiple neighboring buckets (bit-flips) for multi-probe if needed.
  */
object Ann {

  private def dotWithPlane(embCol: String, plane: String): String =
    s"""aggregate(sequence(1, size($embCol)), CAST(0 AS DOUBLE),
       |(acc, i) -> acc + CAST(element_at($embCol, i) AS DOUBLE)
       |  * (CAST(xxhash64($plane, i) % 1001 AS DOUBLE) / 1000.0))""".stripMargin

  /** Add an nBits-bit LSH `bucket` column (sign pattern of hyperplane
    * projections). */
  def withBucket(df: DataFrame, embCol: String, nBits: Int = 8): DataFrame =
    df.withColumn("bucket", expr(
      s"""aggregate(sequence(0, ${nBits - 1}), CAST(0 AS BIGINT),
         |(acc, p) -> CASE WHEN (${dotWithPlane(embCol, "p")}) > 0
         |                 THEN acc | shiftleft(CAST(1 AS BIGINT), p)
         |                 ELSE acc END)""".stripMargin))

  private def cosineTo(probe: DataFrame, df: DataFrame, idCol: String,
                       embCol: String): DataFrame = {
    // native codegen'd folds (VectorExprs) instead of interpreted HOF
    // lambdas — same left-to-right double accumulation, bit-identical
    // (VectorExprsSpec), ~10× less per-row overhead; with 8 probes
    // unioned into one stage the interpreted form dominated the
    // q_eval_ann_recall wall (2.9 s single-task stage, TimeQ-measured)
    import graft.functions.VectorExprs.{dotVec, norm2}
    df.crossJoin(broadcast(probe))
      .withColumn("cos_sim",
        dotVec(col(embCol), col("probe_emb")) /
          (sqrt(norm2(col(embCol))) * sqrt(norm2(col("probe_emb")))))
  }

  /** Exact brute-force cosine top-k for probeId (the recall baseline). */
  def bruteTopK(df: DataFrame, idCol: String, embCol: String,
                probeId: Long, k: Int): DataFrame = {
    val probe = df.filter(col(idCol) === probeId)
      .select(col(embCol).as("probe_emb"))
    cosineTo(probe, df.filter(col(idCol) =!= probeId), idCol, embCol)
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** ANN top-k: rank only the probe's LSH bucket. */
  def annTopK(df: DataFrame, idCol: String, embCol: String,
              probeId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val bucketed = withBucket(df, embCol, nBits)
    val probeRow = bucketed.filter(col(idCol) === probeId)
      .select(col(embCol).as("probe_emb"), col("bucket").as("probe_bucket"))
    val cands = bucketed.filter(col(idCol) =!= probeId)
      .join(broadcast(probeRow.select("probe_bucket")),
        col("bucket") === col("probe_bucket"))
    cosineTo(probeRow.select("probe_emb"), cands, idCol, embCol)
      .select(col(idCol), col("bucket"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
