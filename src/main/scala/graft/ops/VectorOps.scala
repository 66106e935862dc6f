package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding storage/layout operators. Int8 symmetric quantization is the
  * standard 4× storage/IO reduction for a 100 TB embedding store (float32
  * → int8 + one float scale per vector); what a pipeline must know before
  * flipping it on is the reconstruction-error profile, which is exactly
  * what q_vec_quantize reports per label.
  *
  * Determinism notes (SURVEY §7.5): rounding is `floor(x/scale + 0.5)` on
  * BOTH engines — Spark `round()` (HALF_UP on decimals) and DuckDB
  * `round()` (banker's on doubles) disagree on exact ties, `floor` never
  * does. The per-vector scale is a float max (exact), widened once to
  * double; per-element error math is identical IEEE on both engines;
  * error sums go through DECIMAL(18,9).
  */
object VectorOps {

  /** Per-label int8 quantization error profile: element count, summed and
    * max absolute reconstruction error, and a clipped-value count (always
    * 0 by construction — max|x|/scale = 127 exactly — kept as the guard a
    * real pipeline wants). Zero-scale (all-zero) vectors are excluded on
    * both engines: x/0 is NaN-poison, not data. */
  val vecQuantize: Q = Q.checked(
    "q_vec_quantize",
    """WITH q AS (SELECT label,
      |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
      |      / 127.0 AS scale,
      |    embedding
      |  FROM embeddings),
      |e AS (SELECT label, scale, CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM q WHERE scale > 0),
      |r AS (SELECT label,
      |    abs(x - floor(x / scale + 0.5) * scale) AS err,
      |    floor(x / scale + 0.5) AS qv
      |  FROM e)
      |SELECT label, count(*) AS n_vals,
      |  CAST(sum(CAST(err AS DECIMAL(18,9))) AS DOUBLE) AS sum_err,
      |  CAST(max(err) AS DOUBLE) AS max_err,
      |  CAST(count_if(qv > 127 OR qv < -127) AS BIGINT) AS n_clipped
      |FROM r GROUP BY label ORDER BY label""".stripMargin
  ) { (s, dir) =>
    val x = col("x").cast(DoubleType)
    val qv = floor(x / col("scale") + 0.5)
    val err = abs(x - qv * col("scale"))
    Tables.embeddings(s, dir)
      .withColumn("scale",
        array_max(transform(col("embedding"), e => abs(e)))
          .cast(DoubleType) / 127.0)
      .filter(col("scale") > 0)
      .select(col("label"), col("scale"), explode(col("embedding")).as("x"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vals"),
        sum(err.cast(DecimalType(18, 9))).cast(DoubleType).as("sum_err"),
        max(err).cast(DoubleType).as("max_err"),
        count(when(qv > 127 || qv < -127, 1)).as("n_clipped"))
      .orderBy("label")
  }

  /** Per-label L2-norm audit of the embedding store: vector count plus
    * min / max / mean norm, the pre-flight a pipeline runs before cosine
    * math (an un-normalized or degenerate shard shows up here as a norm
    * range far from 1). The per-vector reduce is the `aggregate` HOF —
    * MAP-ONLY, no explode shuffle: at 100 TB the embeddings table never
    * shuffles at vector grain, only the label-grain partial aggregates
    * move.
    *
    * Determinism: each squared term is float×float (exact in double)
    * snapped to DECIMAL(28,10); decimal addition is exact and
    * associative, so the HOF's left fold and DuckDB's unnest-groupBy sum
    * agree regardless of order. sqrt of bit-equal doubles is correctly
    * rounded (IEEE 754) — identical cross-engine. The mean is one final
    * IEEE division of a DECIMAL(18,9)-snapped sum; round(·,4) guards the
    * output. */
  val embedNorm: Q = Q.checked(
    "q_embed_norm",
    """WITH sq AS (
      |  SELECT vec_id, label,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |norms AS (
      |  SELECT vec_id, label,
      |    sqrt(CAST(sum(CAST(x * x AS DECIMAL(28,10))) AS DOUBLE)) AS nrm
      |  FROM sq GROUP BY vec_id, label)
      |SELECT label, count(*) AS n_vecs,
      |  round(min(nrm), 4) AS min_norm,
      |  round(max(nrm), 4) AS max_norm,
      |  round(CAST(sum(CAST(nrm AS DECIMAL(18,9))) AS DOUBLE) / count(*), 4)
      |    AS avg_norm
      |FROM norms GROUP BY label ORDER BY label""".stripMargin
  ) { (s, dir) =>
    Tables.embeddings(s, dir)
      .withColumn("nrm", sqrt(expr(
        """CAST(aggregate(embedding, CAST(0 AS DECIMAL(28,10)),
          |  (acc, x) -> CAST(acc +
          |    CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,10))
          |    AS DECIMAL(28,10))) AS DOUBLE)""".stripMargin)))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(min(col("nrm")), 4).as("min_norm"),
        round(max(col("nrm")), 4).as("max_norm"),
        round(sum(col("nrm").cast(DecimalType(18, 9))).cast(DoubleType) /
          count(lit(1)), 4).as("avg_norm"))
      .orderBy("label")
  }

  val all: Seq[Q] = Seq(vecQuantize, embedNorm)
}
