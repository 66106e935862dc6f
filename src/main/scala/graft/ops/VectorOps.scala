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

  /** Embedding label-cohesion audit: mean cosine similarity of
    * successor-id vector pairs, split by whether the pair shares a label
    * — the "are my cluster labels real" gauge next to [[embedNorm]]'s
    * magnitude pre-flight and q_embed_drift's distribution monitor. A
    * healthy labeled space shows intra-label means well above
    * cross-label means; a collapsed or shuffled space shows no gap.
    *
    * Scale discipline: pairing is the SUCCESSOR-ID equi-join
    * (b.vec_id = a.vec_id + 1) — a deterministic O(n) sample of pairs
    * with ZERO windows (a per-label rank window would sort each label's
    * corpus in one task, the group-size cliff this repo eradicated).
    * Every pair cosine snaps to integer micro-units (floor — identical
    * both engines) BEFORE aggregation, so the per-group sums are
    * fold-order-free; the mean is one terminal IEEE division of exact
    * integers. Dot/norm fold order matches DuckDB's list_sum exactly
    * (the q_sim_topk bit-identity recipe, native codegen'd loops). */
  val labelCohesion: Q = Q.checked(
    "q_label_cohesion",
    """WITH p AS (
      |  SELECT a.label AS label, (a.label = b.label) AS same_label,
      |    CAST(floor(1000000 *
      |      list_sum(list_transform(range(1, 65),
      |        i -> CAST(a.embedding[i] AS DOUBLE)
      |           * CAST(b.embedding[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(a.embedding,
      |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(b.embedding,
      |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS BIGINT)
      |      AS cos_micro
      |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
      |SELECT label, same_label, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(cos_micro) AS DOUBLE) / count(*) AS mean_cos_micro
      |FROM p GROUP BY label, same_label
      |ORDER BY label, same_label""".stripMargin
  ) { (s, dir) =>
    import graft.functions.VectorExprs.{dotVec, norm2}
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"),
      col("label"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"),
      col("label").as("lb"))
    a.join(b, col("idb") === col("ida") + 1)
      .select(col("label"), (col("label") === col("lb")).as("same_label"),
        floor(lit(1000000.0) * dotVec(col("ea"), col("eb"))
          / (sqrt(norm2(col("ea"))) * sqrt(norm2(col("eb")))))
          .cast(LongType).as("cos_micro"))
      .groupBy("label", "same_label")
      .agg(count(lit(1)).as("n_pairs"),
        (sum("cos_micro").cast(DoubleType) / count(lit(1)))
          .as("mean_cos_micro"))
      .orderBy("label", "same_label")
  }

  val all: Seq[Q] = Seq(vecQuantize, embedNorm, labelCohesion)
}
