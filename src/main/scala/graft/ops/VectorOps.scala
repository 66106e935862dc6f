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

  val all: Seq[Q] = Seq(vecQuantize)
}
