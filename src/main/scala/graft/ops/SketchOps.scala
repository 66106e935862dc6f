package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators (DataSketches HLL + count-min sketch, both
  * shipped in Spark) — the 100 TB aggregation story in miniature: a
  * sketch is a bounded-size aggregate whose merge is associative and
  * commutative, so executors build partials map-side and the shuffle
  * carries kilobytes regardless of input size. Exactly the shape a
  * planet-scale "distinct users per segment" or "token frequency over the
  * crawl" job needs where exact aggregation would shuffle the key space.
  *
  * Impl-only: sketch estimates are implementation-defined (DuckDB's HLL
  * differs), so the driver records rows-only and SketchSpec carries the
  * real checks — error bounds vs exact, and the merge laws
  * (union-of-partials == whole, order-independent).
  */
object SketchOps {

  /** Per-event-type distinct users via a DataSketches HLL sketch column,
    * re-aggregated into a global union WITHOUT touching raw data again:
    * the per-group sketches union into the all-types row (`union_est`
    * repeated per row for schema uniformity). At scale the second pass
    * reads n_groups × ~1 KB, not the events table. */
  val sketchHll: Q = Q.implOnly("q_sketch_hll") { (s, dir) =>
    val perType = Tables.events(s, dir)
      .groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
        countDistinct(col("user_id")).as("exact_users"))
    val union = perType
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("union_est"))
    perType
      .select(col("event_type"),
        hll_sketch_estimate(col("sk")).as("approx_users"),
        col("exact_users"))
      .crossJoin(broadcast(union))
      .orderBy("event_type")
  }

  /** Token-frequency count-min sketch over the whole corpus: one binary
    * aggregate (eps=0.001, conf=0.99 → width 2719 × depth 5 ≈ 106 KB)
    * instead of a token-keyed shuffle. Output: the sketch plus its true
    * total count for the spec to bound against. */
  val sketchCms: Q = Q.implOnly("q_sketch_cms") { (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(count_min_sketch(col("token"), lit(0.001d), lit(0.99d), lit(42))
        .as("cms"),
        count(lit(1)).as("n_tokens"))
  }

  /** Approximate quantiles (percentile_approx, accuracy 10⁴) next to the
    * exact rank-crossing values (q_quantile_disc's technique) — the
    * single-pass bounded-memory path a 100 TB profiler takes, with its
    * error visible in-row. Output is flattened to one row per (segment,
    * quantile) — all scalar columns, so the driver's rows-only check can
    * sort/hash the frame (array cells are unhashable on the oracle side). */
  val sketchQuantile: Q = Q.implOnly("q_sketch_quantile") { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy("c_mktsegment")
      .agg(percentile_approx(col("c_acctbal"), array(lit(0.25), lit(0.5),
        lit(0.75)), lit(10000)).as("approx_q"),
        min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
      .select(col("c_mktsegment"),
        posexplode(col("approx_q")).as(Seq("q_idx", "approx_val")),
        col("lo"), col("hi"))
      .withColumn("p", element_at(array(lit(0.25), lit(0.5), lit(0.75)),
        col("q_idx") + 1))
      .select("c_mktsegment", "p", "approx_val", "lo", "hi")
      .orderBy("c_mktsegment", "p")
  }

  /** Trailing-7-day distinct users per day from MERGED DAILY SKETCHES —
    * the 100 TB twin of the exact q_rolling_distinct: the corpus is
    * scanned ONCE into per-day HLL sketches (30 rows × ~KB), and every
    * window is a union of ≤7 sketches — re-aggregation cost is
    * days × 7 × KB, independent of user cardinality, where the exact
    * path's fan-out grows with active (day, user) pairs. Impl-only
    * (DataSketches estimates are implementation-defined; DuckDB's HLL
    * differs) — SketchSpec bounds each window's estimate against the
    * exact rolling distinct. */
  val rollingHll: Q = Q.implOnly("q_rolling_hll") { (s, dir) =>
    val daily = Tables.events(s, dir)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val days = daily.select(col("day").as("d"))
    daily
      .select(explode(expr("sequence(0, 6)")).as("o"), col("day"),
        col("sk"))
      .select(date_add(col("day"), col("o")).as("win_end"), col("sk"))
      .join(broadcast(days), col("win_end") === col("d"), "left_semi")
      .groupBy("win_end")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("est_users"))
      .orderBy("win_end")
  }

  val all: Seq[Q] = Seq(sketchHll, sketchCms, sketchQuantile, rollingHll)
}
