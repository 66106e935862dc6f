package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution-profiling operators: fixed-width histograms, z-score
  * outlier detection, and per-group mode — the data-quality triage a
  * pipeline runs before trusting a 100 TB table. (North-star additions;
  * no reference file:line — upstream has no profiling stage, SURVEY §0.)
  *
  * Scale design: the histogram is ONE hash aggregation whose key space is
  * the bucket count (constant — partial aggregation collapses each map
  * task to ≤20 rows before the shuffle). Outlier detection is the
  * two-pass pattern: a tiny per-group moment frame (count/sum/sum²) is
  * computed in one shuffle, broadcast back, and the second pass is a
  * map-only probe — no window over the raw table, no sort. Mode is one
  * hash aggregation at (group, value) grain plus a window over the
  * already-aggregated counts.
  *
  * Determinism (SURVEY §7.5): moments are exact DECIMAL sums (2-dp money
  * in DECIMAL(18,2), squares in the widened product type), converted to
  * double once; mean/variance/σ are then a fixed tree of correctly-rounded
  * IEEE ops — bit-identical cross-engine, so the `> 2σ` cut never
  * disagrees at the boundary. Bucket ids use floor (never ties).
  */
object StatOps {

  /** 20 equal-width price buckets (width 5000, top bucket open-ended):
    * per-bucket count, min/max, and exact-decimal sum. */
  val histogram: Q = Q.checked(
    "q_histogram",
    """SELECT CAST(least(floor(l_extendedprice / 5.0e3), 19) AS BIGINT)
      |    AS bucket,
      |  count(*) AS n,
      |  CAST(min(l_extendedprice) AS DOUBLE) AS lo,
      |  CAST(max(l_extendedprice) AS DOUBLE) AS hi,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(least(floor(col("l_extendedprice") / lit(5.0e3)), lit(19L))
        .cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("bucket")
  }

  /** Per-segment 2σ account-balance outliers. Moments (n, Σx, Σx²) are
    * exact decimals from ONE pass; the per-segment mean/σ frame (5 rows)
    * broadcasts back onto customer for a map-only flag pass. min/max of
    * an empty outlier set is NULL on both engines. */
  val outliers: Q = Q.checked(
    "q_outliers",
    """WITH st AS (
      |  SELECT c_mktsegment, count(*) AS n,
      |    sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
      |    sum(CAST(c_acctbal AS DECIMAL(18,2))
      |        * CAST(c_acctbal AS DECIMAL(18,2))) AS s2
      |  FROM customer GROUP BY 1),
      |m AS (
      |  SELECT c_mktsegment, n,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)
      |           * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
      |         / CAST(n - 1 AS DOUBLE)) AS sd
      |  FROM st)
      |SELECT m.c_mktsegment, CAST(min(n) AS BIGINT) AS n_customers,
      |  CAST(count_if(abs(CAST(c_acctbal AS DOUBLE) - mean) > 2.0e0 * sd)
      |    AS BIGINT) AS n_outliers,
      |  CAST(min(CASE WHEN abs(CAST(c_acctbal AS DOUBLE) - mean) > 2.0e0 * sd
      |               THEN c_acctbal END) AS DOUBLE) AS min_outlier,
      |  CAST(max(CASE WHEN abs(CAST(c_acctbal AS DOUBLE) - mean) > 2.0e0 * sd
      |               THEN c_acctbal END) AS DOUBLE) AS max_outlier
      |FROM customer c JOIN m USING (c_mktsegment)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val d = col("c_acctbal").cast(DecimalType(18, 2))
    val st = cust.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(d).as("s"), sum(d * d).as("s2"))
    val mean = col("s").cast(DoubleType) / col("n").cast(DoubleType)
    val m = st.select(col("c_mktsegment"), col("n"), mean.as("mean"),
      sqrt((col("s2").cast(DoubleType) -
        col("s").cast(DoubleType) * mean) /
        (col("n") - 1).cast(DoubleType)).as("sd"))
    val isOut = abs(col("c_acctbal").cast(DoubleType) - col("mean")) >
      lit(2.0) * col("sd")
    cust.join(broadcast(m), "c_mktsegment")
      .groupBy("c_mktsegment")
      .agg(min(col("n")).as("n_customers"),
        count(when(isOut, 1)).as("n_outliers"),
        min(when(isOut, col("c_acctbal"))).as("min_outlier"),
        max(when(isOut, col("c_acctbal"))).as("max_outlier"))
      .orderBy("c_mktsegment")
  }

  /** Most frequent order priority per status (grouped mode), lexicographic
    * tiebreak. The window runs over the 15-row aggregated frame, never the
    * raw table. */
  val groupedMode: Q = Q.checked(
    "q_grouped_mode",
    """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |           FROM orders GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      |        ORDER BY n DESC, o_orderpriority) AS rk FROM c)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority, n
      |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin
  ) { (s, dir) =>
    val c = Tables.orders(s, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("n").desc, col("o_orderpriority"))
    c.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("n"))
      .orderBy("o_orderstatus")
  }

  /** 2-D skyline (Pareto frontier): parts where no other part is cheaper
    * (≤) AND larger (≥) with one strict — minimize p_retailprice,
    * maximize p_size. O(n²) dominance collapses to one prefix-max pass:
    * group to one max-size row per distinct price (first shuffle, key
    * space = distinct prices ≪ rows), then a survivor is a part at its
    * price group's max size that beats every strictly-cheaper group's
    * max. Equal (price, size) twins both survive — neither strictly
    * dominates. All comparisons are on raw column values, no derived
    * floats.
    *
    * Scale design for the prefix-max: distinct prices GROW with data, so
    * a global `Window.orderBy(price)` would sort them on one partition.
    * Instead: coarse price buckets (floor(price/100) — bucket count is
    * bounded by the PRICE DOMAIN, not the row count), per-bucket max,
    * prefix-max over the tiny bucket frame (the only unpartitioned
    * window, genuinely bounded like a calendar frame), broadcast back,
    * and the per-price prefix-max runs partitioned BY BUCKET — fully
    * parallel. pmax(price) = max(prev-bucket cumulative, intra-bucket
    * prefix), `greatest` skipping nulls exactly as the single window
    * would. */
  val skyline: Q = Q.checked(
    "q_skyline",
    """WITH per_price AS (
      |  SELECT p_retailprice AS price, max(p_size) AS gmax
      |  FROM part GROUP BY 1),
      |pfx AS (
      |  SELECT price, gmax,
      |    max(gmax) OVER (ORDER BY price
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM per_price)
      |SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
      |FROM part p JOIN pfx ON p.p_retailprice = pfx.price
      |WHERE p.p_size = pfx.gmax AND (pfx.pmax IS NULL OR p.p_size > pfx.pmax)
      |ORDER BY p.p_retailprice, p.p_partkey""".stripMargin
  ) { (s, dir) =>
    val part = Tables.part(s, dir)
    val perPrice = part.groupBy(col("p_retailprice").as("price"))
      .agg(max(col("p_size")).as("gmax"))
      .withColumn("bkt", floor(col("price") / 100).cast(LongType))
    // Pass 1: per-bucket max, prefix-max over the bucket frame only
    // (rows = price-domain/100 — bounded by the domain, not the data).
    val bktCum = perPrice.groupBy("bkt").agg(max(col("gmax")).as("bmax"))
      .withColumn("prev_cum", max(col("bmax")).over(
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)))
      .select("bkt", "prev_cum")
    // Pass 2: intra-bucket prefix-max, partitioned by bucket (parallel);
    // stitch with the broadcast cumulative frame. greatest() skips
    // nulls, so pmax is null exactly when no strictly-cheaper price
    // exists anywhere — identical to the single global window.
    val wb = Window.partitionBy("bkt").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pfx = perPrice
      .withColumn("imax", max(col("gmax")).over(wb))
      .join(broadcast(bktCum), "bkt")
      .withColumn("pmax", greatest(col("prev_cum"), col("imax")))
      .select("price", "gmax", "pmax")
    part.join(pfx, part("p_retailprice") === pfx("price"))
      .filter(col("p_size") === col("gmax") &&
        (col("pmax").isNull || col("p_size") > col("pmax")))
      .select("p_partkey", "p_name", "p_retailprice", "p_size")
      .orderBy("p_retailprice", "p_partkey")
  }

  /** Median-absolute-deviation outliers per market segment — the robust
    * twin of q_outliers' 2σ cut (a single planted whale moves a mean/σ
    * fence but not a median/MAD one). Balances live in exact integer
    * cents (floor(x·100 + 0.5) — 2-dp money never ties, and floor
    * rounds negatives half-up identically on both engines); both medians
    * use the rank-crossing technique (smallest value whose rank crosses
    * n/2 — the q_quantile_disc recipe), so no interpolation ever
    * happens. Flag = |x − med| > 3·MAD in pure BIGINT.
    *
    * Scale note: exact per-group medians need a per-group sort (two
    * window passes here, segment-keyed shuffles); at 100 TB the same
    * shape swaps rank-crossing for approx_percentile and keeps the
    * integer flag pass — q_sketch_quantile demonstrates that path. */
  val madOutliers: Q = Q.checked(
    "q_mad",
    """WITH base AS (
      |  SELECT c_mktsegment, c_custkey,
      |    CAST(floor(c_acctbal * 100 + 5.0e-1) AS BIGINT) AS bal_c
      |  FROM customer),
      |r1 AS (SELECT *, row_number() OVER
      |         (PARTITION BY c_mktsegment ORDER BY bal_c, c_custkey) AS rn,
      |         count(*) OVER (PARTITION BY c_mktsegment) AS n
      |       FROM base),
      |med AS (SELECT c_mktsegment,
      |          min(CASE WHEN 2 * rn >= n THEN bal_c END) AS med_c
      |        FROM r1 GROUP BY c_mktsegment),
      |dev AS (SELECT b.c_mktsegment, b.c_custkey,
      |          abs(b.bal_c - m.med_c) AS dev_c
      |        FROM base b JOIN med m ON b.c_mktsegment = m.c_mktsegment),
      |r2 AS (SELECT *, row_number() OVER
      |         (PARTITION BY c_mktsegment ORDER BY dev_c, c_custkey) AS rn,
      |         count(*) OVER (PARTITION BY c_mktsegment) AS n
      |       FROM dev),
      |mad AS (SELECT c_mktsegment,
      |          min(CASE WHEN 2 * rn >= n THEN dev_c END) AS mad_c
      |        FROM r2 GROUP BY c_mktsegment)
      |SELECT d.c_mktsegment, min(m2.med_c) AS med_c, min(a.mad_c) AS mad_c,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN d.dev_c > 3 * a.mad_c THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad a ON d.c_mktsegment = a.c_mktsegment
      |  JOIN med m2 ON d.c_mktsegment = m2.c_mktsegment
      |GROUP BY d.c_mktsegment ORDER BY d.c_mktsegment""".stripMargin
  ) { (s, dir) =>
    val base = Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast(LongType).as("bal_c"))
    val wSeg = Window.partitionBy("c_mktsegment")
    def rankCross(df: org.apache.spark.sql.DataFrame, v: String,
        out: String) = df
      .withColumn("rn", row_number().over(
        wSeg.orderBy(col(v), col("c_custkey"))))
      .withColumn("n", count(lit(1)).over(wSeg))
      .groupBy("c_mktsegment")
      .agg(min(when(col("rn") * 2 >= col("n"), col(v))).as(out))
    val med = rankCross(base, "bal_c", "med_c")
    // med_c rides along in dev, so the final rollup needs only the mad
    // frame joined back — not a second broadcast of med
    val dev = base.join(broadcast(med), "c_mktsegment")
      .select(col("c_mktsegment"), col("c_custkey"), col("med_c"),
        abs(col("bal_c") - col("med_c")).as("dev_c"))
    val mad = rankCross(dev, "dev_c", "mad_c")
    dev.join(broadcast(mad), "c_mktsegment")
      .groupBy("c_mktsegment")
      .agg(min(col("med_c")).as("med_c"), min(col("mad_c")).as("mad_c"),
        count(lit(1)).as("n"),
        sum(when(col("dev_c") > col("mad_c") * 3, 1).otherwise(0))
          .cast(LongType).as("n_outliers"))
      .orderBy("c_mktsegment")
  }

  /** Exponentially-decayed per-user activity score with dyadic weights:
    * at each user's LATEST event, score = v₀/2 + v₁/4 + … + v₇/256 over
    * the 8 most recent events (missing history contributes 0). Dyadic
    * denominators make every term an exact IEEE scaling (multiplying by
    * 2⁻ᵏ only shifts the exponent), and the 8-term sum is one fixed
    * left-associated expression tree — bit-identical cross-engine with
    * NO aggregation-order exposure (a window sum() would be
    * order-dependent in float).
    *
    * Scale design: both windows share the user_id partitioning — one
    * shuffle, two in-partition sorts; the frame depth is a constant 8,
    * so state per key is bounded (the same shape runs streaming via
    * transformWithState with an 8-deep ring buffer). */
  val decayScore: Q = Q.checked(
    "q_decay",
    Tables.EventsCte +
      """,
        |lagd AS (
        |  SELECT user_id, ts, event_id, value,
        |    lag(value, 1) OVER win AS v1, lag(value, 2) OVER win AS v2,
        |    lag(value, 3) OVER win AS v3, lag(value, 4) OVER win AS v4,
        |    lag(value, 5) OVER win AS v5, lag(value, 6) OVER win AS v6,
        |    lag(value, 7) OVER win AS v7,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn_last,
        |    count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, n_events,
        |  value / 2 + coalesce(v1, 0) / 4 + coalesce(v2, 0) / 8
        |    + coalesce(v3, 0) / 16 + coalesce(v4, 0) / 32
        |    + coalesce(v5, 0) / 64 + coalesce(v6, 0) / 128
        |    + coalesce(v7, 0) / 256 AS decayed
        |FROM lagd WHERE rn_last = 1 ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val last = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val lagd = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("v1", lag(col("value"), 1).over(win))
      .withColumn("v2", lag(col("value"), 2).over(win))
      .withColumn("v3", lag(col("value"), 3).over(win))
      .withColumn("v4", lag(col("value"), 4).over(win))
      .withColumn("v5", lag(col("value"), 5).over(win))
      .withColumn("v6", lag(col("value"), 6).over(win))
      .withColumn("v7", lag(col("value"), 7).over(win))
      .withColumn("rn_last", row_number().over(last))
      .withColumn("n_events",
        count(lit(1)).over(Window.partitionBy("user_id")))
    lagd.filter(col("rn_last") === 1)
      .select(col("user_id"), col("n_events"),
        (col("value") / 2 + coalesce(col("v1"), lit(0.0)) / 4
          + coalesce(col("v2"), lit(0.0)) / 8
          + coalesce(col("v3"), lit(0.0)) / 16
          + coalesce(col("v4"), lit(0.0)) / 32
          + coalesce(col("v5"), lit(0.0)) / 64
          + coalesce(col("v6"), lit(0.0)) / 128
          + coalesce(col("v7"), lit(0.0)) / 256).as("decayed"))
      .orderBy("user_id")
  }

  /** Pareto concentration (the 80/20 report): per market segment, the
    * smallest count of top customers whose revenue reaches 80% of the
    * segment's total, plus the share they actually hold. Revenue lives
    * in exact BIGINT cents end-to-end (floor(x·100+0.5); integer sums
    * are order-free, and int64→double is correctly rounded on both
    * engines — the q_time_weighted recipe), and the 80% test is pure
    * integer arithmetic (5·cum ≥ 4·total). Only customers with ≥1 order
    * participate (inner join).
    *
    * Scale shape: revenue aggregates to customer grain first (the only
    * corpus-sized shuffle); every window below runs over the
    * customer-grain frame partitioned by segment. */
  val pareto: Q = Q.checked(
    "q_pareto",
    """WITH rc AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 5.0e-1) AS BIGINT))
      |      AS BIGINT) AS rev_c
      |  FROM orders GROUP BY o_custkey),
      |j AS (SELECT c.c_mktsegment, rc.o_custkey, rc.rev_c
      |      FROM rc JOIN customer c ON rc.o_custkey = c.c_custkey),
      |w AS (
      |  SELECT c_mktsegment,
      |    row_number() OVER win AS rn,
      |    sum(rev_c) OVER (PARTITION BY c_mktsegment ORDER BY rev_c DESC,
      |      o_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS cum_c,
      |    sum(rev_c) OVER (PARTITION BY c_mktsegment) AS tot_c,
      |    count(*) OVER (PARTITION BY c_mktsegment) AS n_cust
      |  FROM j
      |  WINDOW win AS (PARTITION BY c_mktsegment ORDER BY rev_c DESC,
      |                 o_custkey))
      |SELECT c_mktsegment,
      |  CAST(min(CASE WHEN 5 * cum_c >= 4 * tot_c THEN rn END) AS BIGINT)
      |    AS n_top,
      |  CAST(min(n_cust) AS BIGINT) AS n_cust,
      |  CAST(min(CASE WHEN 5 * cum_c >= 4 * tot_c THEN cum_c END)
      |      AS DOUBLE)
      |    / CAST(min(tot_c) AS DOUBLE) AS top_share
      |FROM w GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    val rc = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType))
        .cast(LongType).as("rev_c"))
    val j = rc.join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
    val ord = Window.partitionBy("c_mktsegment")
      .orderBy(col("rev_c").desc, col("o_custkey"))
    val seg = Window.partitionBy("c_mktsegment")
    j.withColumn("rn", row_number().over(ord))
      .withColumn("cum_c", sum(col("rev_c")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot_c", sum(col("rev_c")).over(seg))
      .withColumn("n_cust", count(lit(1)).over(seg))
      .groupBy("c_mktsegment")
      .agg(
        min(when(col("cum_c") * 5 >= col("tot_c") * 4, col("rn")))
          .cast(LongType).as("n_top"),
        min(col("n_cust")).cast(LongType).as("n_cust"),
        (min(when(col("cum_c") * 5 >= col("tot_c") * 4, col("cum_c")))
          .cast(DoubleType) / min(col("tot_c")).cast(DoubleType))
          .as("top_share"))
      .orderBy("c_mktsegment")
  }

  /** Mann-Whitney U rank-sum test per market segment: do urgent/high-
    * priority orders carry larger totals than the rest? The standard
    * nonparametric two-sample location test, computed EXACTLY in
    * integers: with ties handled by midranks, 2·midrank = 2·rank() +
    * tie_count − 1 is always integral, so the doubled rank sum
    * 2R_A = Σ_A (2·rank + cnt − 1) and the doubled statistic
    * 2U_A = 2R_A − n_A(n_A+1) never touch a float — both engines
    * window-rank the same total (value) order and sum the same integers.
    *
    * Scale shape (r6 de-cliffing): rank() is never computed at row
    * grain — a per-segment window would sort a segment's whole corpus
    * in one task (~5 segments ⇒ parallelism 5). Tie-aware rank depends
    * only on the VALUE prefix: rank(v) = 1 + #rows with smaller value,
    * and every row of value v shares it, so the doubled rank sum
    * collapses onto the (seg, value) frame: Σ_A (2·rk + cnt − 1)
    * = Σ_values a_c · (2·(before+1) + c − 1). `before` comes from the
    * bucketed two-pass (RankedFrames pattern): bounded bucket-frame
    * prefix + intra-bucket cumulative partitioned by (seg, bucket). The
    * whole statistic is assembled from value-grain rows — the corpus is
    * touched exactly once, by the first aggregate. */
  val rankSum: Q = Q.checked(
    "q_rank_sum",
    """WITH r AS (
      |  SELECT c_mktsegment AS seg,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |         THEN 1 ELSE 0 END AS grp_a,
      |    rank() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice)
      |      AS rk,
      |    count(*) OVER (PARTITION BY c_mktsegment, o_totalprice) AS cnt
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT seg,
      |  CAST(sum(grp_a) AS BIGINT) AS n_a,
      |  CAST(count(*) - sum(grp_a) AS BIGINT) AS n_b,
      |  CAST(sum(CASE WHEN grp_a = 1 THEN 2 * rk + cnt - 1 END)
      |       - sum(grp_a) * (sum(grp_a) + 1) AS BIGINT) AS u2x_a
      |FROM r GROUP BY seg ORDER BY seg""".stripMargin
  ) { (s, dir) =>
    // value-grain collapse: one corpus aggregate, then bounded frames
    val vals = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("grp_a"),
        col("o_totalprice"))
      .groupBy("seg", "o_totalprice")
      .agg(count(lit(1)).as("c"), sum("grp_a").as("a_c"))
      .withColumn("bkt", floor(col("o_totalprice") / 10000).cast(LongType))
    val bktBefore = vals.groupBy("seg", "bkt")
      .agg(sum("c").as("bc"))
      .withColumn("b_before", coalesce(
        sum(col("bc")).over(Window.partitionBy("seg").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("seg", "bkt", "b_before")
    val intra = Window.partitionBy("seg", "bkt").orderBy("o_totalprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    vals.join(bktBefore, Seq("seg", "bkt"))
      .withColumn("before",
        col("b_before") + coalesce(sum(col("c")).over(intra), lit(0L)))
      // rk = before + 1 for every row of this value; cnt = c
      .groupBy("seg")
      .agg(sum(col("a_c")).cast(LongType).as("n_a"),
        (sum(col("c")) - sum(col("a_c"))).cast(LongType).as("n_b"),
        (sum(col("a_c") * (lit(2) * (col("before") + 1) + col("c") - 1))
          - sum(col("a_c")) * (sum(col("a_c")) + 1)).cast(LongType)
          .as("u2x_a"))
      .orderBy("seg")
  }

  /** Per-supplier winsorization: clip each line's price to that
    * supplier's [p05, p95] (nearest-rank ⇒ the bound IS a data value —
    * no interpolation, no floats anywhere), then report exact
    * integer-cent sums before/after plus clipped-row counts — the
    * outlier-robust revenue treatment a curation pass applies before
    * training-mix weighting. Scale: the window partitions on l_suppkey,
    * whose cardinality GROWS with the data (100 at sf0.01 → 10k at
    * sf10) — per-group sort work stays bounded and parallelism scales,
    * unlike a 3-key returnflag window that would cap at 3 tasks. The
    * per-supplier bound frame (2 values × n_supp) is broadcast back for
    * the clip ONLY under a key-count guard (the IncrementalJoin
    * `broadcastKeyLimit` pattern): n_supp GROWS with the data, so past
    * the threshold the hint is dropped and the join shuffles on
    * l_suppkey — a key `r` is already partitioned by, so the exchange is
    * reused (and AQE still broadcasts genuinely small frames). The guard
    * probe is an approx_count_distinct over the pruned one-column scan,
    * not a second evaluation of the bound frame. */
  val winsorize: Q = Q.checked(
    "q_winsorize",
    """WITH r AS (
      |  SELECT l_suppkey,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
      |    count(*) OVER (PARTITION BY l_suppkey) AS n
      |  FROM lineitem),
      |b AS (
      |  SELECT l_suppkey, n,
      |    min(CASE WHEN rn = greatest((5*n + 99) // 100, 1) THEN cents END)
      |      AS lo,
      |    min(CASE WHEN rn = (95*n + 99) // 100 THEN cents END) AS hi
      |  FROM r GROUP BY 1, 2)
      |SELECT r.l_suppkey, CAST(b.n AS BIGINT) AS n, b.lo AS lo_cents,
      |  b.hi AS hi_cents,
      |  CAST(sum(r.cents) AS BIGINT) AS sum_cents,
      |  CAST(sum(least(greatest(r.cents, b.lo), b.hi)) AS BIGINT)
      |    AS sum_wins_cents,
      |  CAST(count(*) FILTER (WHERE r.cents < b.lo) AS BIGINT) AS n_clip_lo,
      |  CAST(count(*) FILTER (WHERE r.cents > b.hi) AS BIGINT) AS n_clip_hi
      |FROM r JOIN b USING (l_suppkey)
      |GROUP BY 1, 2, 3, 4 ORDER BY l_suppkey""".stripMargin
  ) { (s, dir) => winsorized(Tables.lineitem(s, dir)) }

  /** q_winsorize body with an explicit broadcast guard, testable at both
    * thresholds (JoinScaleSpec forces the shuffle fallback with limit=0
    * and asserts value identity with the broadcast path). */
  def winsorized(li: DataFrame,
      broadcastKeyLimit: Long = 4000000L): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    val wn = Window.partitionBy("l_suppkey")
    val r = li
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("cents"),
        row_number().over(w).as("rn"), count(lit(1)).over(wn).as("n"))
    val bounds = r.groupBy("l_suppkey", "n")
      .agg(
        min(when(expr("rn = greatest((5*n + 99) div 100, 1)"), col("cents")))
          .as("lo"),
        min(when(expr("rn = (95*n + 99) div 100"), col("cents"))).as("hi"))
    // Guard probe: ±5% HLL estimate over the pruned key column — far
    // cheaper than materializing bounds twice, and a 5% miss near the
    // threshold only flips which safe plan runs.
    val nSupp = li.select("l_suppkey")
      .agg(approx_count_distinct(col("l_suppkey"))).head.getLong(0)
    val boundsSide =
      if (nSupp <= broadcastKeyLimit) broadcast(bounds) else bounds
    r.select("l_suppkey", "cents")
      .join(boundsSide, "l_suppkey")
      .groupBy(col("l_suppkey"), col("n").cast(LongType).as("n"),
        col("lo").as("lo_cents"), col("hi").as("hi_cents"))
      .agg(sum("cents").as("sum_cents"),
        sum(least(greatest(col("cents"), col("lo")), col("hi")))
          .as("sum_wins_cents"),
        count(when(col("cents") < col("lo"), lit(1))).as("n_clip_lo"),
        count(when(col("cents") > col("hi"), lit(1))).as("n_clip_hi"))
      .orderBy("l_suppkey")
  }

  /** Per-event-type OLS fit of value (cents) against the props integer k
    * — the "does this metric trend with the knob" screen run before
    * trusting a correlation at 100 TB. One hash aggregation computes the
    * five exact BIGINT moments (n, Σx, Σy, Σxy, Σx²) with map-side
    * combine; the slope/intercept are closed-form ratios of those
    * moments, so the whole fit is one shuffle of ≤|event_type| rows —
    * no per-row window, no second pass, nothing driver-side.
    *
    * Determinism (§7.5): x = k (integer), y = floor(value·100 + 0.5)
    * cents; all five moments are exact BIGINTs (bounded ≪ 2⁶³ by
    * |rows|·max(x·y), checked against FIXTURES ranges); the normal-
    * equation numerators/denominator are exact BIGINT products (the
    * intercept numerator may exceed 2⁵³ — its int64→double cast is
    * correctly rounded identically in both engines); slope and intercept
    * are then ONE IEEE division each, snapped to 1e6 micro-units. */
  val regrSlope: Q = Q.checked(
    "q_regr_slope",
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS x,
      |    CAST(floor(value * 100 + 5.0e-1) AS BIGINT) AS y
      |  FROM events),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx
      |  FROM e GROUP BY event_type)
      |SELECT event_type, n,
      |  CAST(CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
      |      / CAST(n*sxx - sx*sx AS DOUBLE) * 1e6 + 5.0e-1) AS BIGINT)
      |    AS DOUBLE) / 1e6 AS slope,
      |  CAST(CAST(floor(CAST(sy*sxx - sx*sxy AS DOUBLE)
      |      / CAST(n*sxx - sx*sx AS DOUBLE) * 1e6 + 5.0e-1) AS BIGINT)
      |    AS DOUBLE) / 1e6 AS intercept
      |FROM s ORDER BY event_type""".stripMargin
  ) { (s, dir) =>
    val e = Tables.events(s, dir).select(col("event_type"),
      get_json_object(col("props"), "$.k").cast(LongType).as("x"),
      floor(col("value") * 100 + lit(0.5)).cast(LongType).as("y"))
    val m = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    def snap6(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      floor(num.cast(DoubleType) / den.cast(DoubleType) * lit(1e6)
        + lit(0.5)).cast(LongType).cast(DoubleType) / lit(1e6)
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    m.select(col("event_type"), col("n"),
        snap6(col("n") * col("sxy") - col("sx") * col("sy"), den).as("slope"),
        snap6(col("sy") * col("sxx") - col("sx") * col("sxy"), den)
          .as("intercept"))
      .orderBy("event_type")
  }

  /** Pairwise Pearson correlation matrix (quantity / price / discount)
    * per returnflag — the feature-correlation screen run before
    * trusting a model input at 100 TB. ONE hash aggregation computes
    * all eleven exact BIGINT moments with map-side combine; the three
    * correlations are closed-form over those moments.
    *
    * Determinism: units chosen so every squared sum stays < 2⁵³
    * (quantity integral, price whole dollars, discount basis points);
    * per the chisq recipe every moment is cast int64→double BEFORE any
    * multiply (an int64 product n·Σy² would overflow at bench scale),
    * so both engines run the identical correctly-rounded IEEE sequence;
    * final snap at 1e6. */
  val corrMatrix: Q = Q.checked(
    "q_corr_matrix",
    """WITH b AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(floor(l_quantity + 5.0e-1) AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice + 5.0e-1) AS BIGINT) AS y,
      |    CAST(floor(l_discount * 10000 + 5.0e-1) AS BIGINT) AS z
      |  FROM lineitem),
      |m AS (
      |  SELECT flag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(z) AS BIGINT) AS sz,
      |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
      |    CAST(sum(z*z) AS BIGINT) AS szz,
      |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*z) AS BIGINT) AS sxz,
      |    CAST(sum(y*z) AS BIGINT) AS syz
      |  FROM b GROUP BY flag)
      |SELECT flag,
      |  CAST(CAST(floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
      |     * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
      |    * 1e6 + 5.0e-1) AS BIGINT) AS DOUBLE) / 1e6 AS corr_qty_price,
      |  CAST(CAST(floor((CAST(n AS DOUBLE)*CAST(sxz AS DOUBLE)
      |      - CAST(sx AS DOUBLE)*CAST(sz AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
      |     * sqrt(CAST(n AS DOUBLE)*CAST(szz AS DOUBLE)
      |        - CAST(sz AS DOUBLE)*CAST(sz AS DOUBLE)))
      |    * 1e6 + 5.0e-1) AS BIGINT) AS DOUBLE) / 1e6 AS corr_qty_disc,
      |  CAST(CAST(floor((CAST(n AS DOUBLE)*CAST(syz AS DOUBLE)
      |      - CAST(sy AS DOUBLE)*CAST(sz AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))
      |     * sqrt(CAST(n AS DOUBLE)*CAST(szz AS DOUBLE)
      |        - CAST(sz AS DOUBLE)*CAST(sz AS DOUBLE)))
      |    * 1e6 + 5.0e-1) AS BIGINT) AS DOUBLE) / 1e6 AS corr_price_disc,
      |  n
      |FROM m ORDER BY flag""".stripMargin
  ) { (s, dir) =>
    val b = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("flag"),
      floor(col("l_quantity") + lit(0.5)).cast(LongType).as("x"),
      floor(col("l_extendedprice") + lit(0.5)).cast(LongType).as("y"),
      floor(col("l_discount") * 10000 + lit(0.5)).cast(LongType).as("z"))
    val m = b.groupBy("flag").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("z")).as("sxz"),
      sum(col("y") * col("z")).as("syz"))
    def d(c: String) = col(c).cast(DoubleType)
    def corr6(sab: String, a: String, b2: String, saa: String, sbb: String) =
      floor((d("n") * d(sab) - d(a) * d(b2))
        / (sqrt(d("n") * d(saa) - d(a) * d(a))
          * sqrt(d("n") * d(sbb) - d(b2) * d(b2)))
        * lit(1e6) + lit(0.5)).cast(LongType).cast(DoubleType) / lit(1e6)
    m.select(col("flag"),
        corr6("sxy", "sx", "sy", "sxx", "syy").as("corr_qty_price"),
        corr6("sxz", "sx", "sz", "sxx", "szz").as("corr_qty_disc"),
        corr6("syz", "sy", "sz", "syy", "szz").as("corr_price_disc"),
        col("n"))
      .orderBy("flag")
  }

  /** 2-D fixed-grid histogram (quantity band × discount band) with
    * exact decimal revenue per cell — the heatmap profile behind the
    * skew/pricing dashboards. Cell key space is constant (≤ 6×6), so
    * partial aggregation collapses each map task to the grid before the
    * shuffle; integer banding never ties. */
  val hist2d: Q = Q.checked(
    "q_hist2d",
    s"""SELECT CAST(floor(l_quantity + 5.0e-1) AS BIGINT) // 10 AS qty_band,
      |  CAST(floor(l_discount * 100 + 5.0e-1) AS BIGINT) // 2 AS disc_band,
      |  count(*) AS n,
      |  ${dsumSql("l_extendedprice")} AS revenue
      |FROM lineitem GROUP BY 1, 2 ORDER BY qty_band, disc_band"""
      .stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(
        expr("CAST(floor(l_quantity + 0.5d) AS BIGINT) div 10")
          .as("qty_band"),
        expr("CAST(floor(l_discount * 100 + 0.5d) AS BIGINT) div 2")
          .as("disc_band"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("qty_band", "disc_band")
  }

  /** Welch's two-sample t-test (unequal variances) comparing click vs
    * purchase event values — the parametric twin of q_rank_sum's
    * Wilcoxon: t = (m₁−m₂)/√(v₁/n₁+v₂/n₂) with the Welch–Satterthwaite
    * df. One row: the A/B-comparison primitive an experimentation pass
    * runs per metric.
    *
    * Determinism: values snap to integer CENTS once (floor(x·100+0.5) —
    * the q_mad recipe), so n/Σ/Σ² are exact BIGINTs (cents² sums peak
    * ~6e13 ≪ 2⁶³); every downstream mean/var/t/df is ONE fixed IEEE
    * expression tree written identically in both engines (correctly
    * rounded ops ⇒ bit-identical). The cents unit cancels in t and df.
    *
    * Scale: one hash aggregation with a 2-row result — conditional
    * aggregates collapse map-side; no window, no sort, no second pass. */
  val ttestWelch: Q = Q.checked(
    "q_ttest_welch",
    Tables.EventsCte +
      """,
        |c AS (SELECT event_type,
        |        CAST(floor(value * 100 + 5.0e-1) AS BIGINT) AS v_c
        |      FROM ev WHERE event_type IN ('click', 'purchase')),
        |st AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n1,
        |    CAST(sum(v_c) FILTER (WHERE event_type = 'click') AS BIGINT) AS s1,
        |    CAST(sum(v_c * v_c) FILTER (WHERE event_type = 'click') AS BIGINT) AS q1,
        |    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n2,
        |    CAST(sum(v_c) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS s2,
        |    CAST(sum(v_c * v_c) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS q2
        |  FROM c),
        |m AS (
        |  SELECT n1, n2,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |       * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
        |      / CAST(n1 - 1 AS DOUBLE) AS v1,
        |    (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)
        |       * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        |      / CAST(n2 - 1 AS DOUBLE) AS v2
        |  FROM st)
        |SELECT n1, n2, m1 / 1.0e2 AS mean_click, m2 / 1.0e2 AS mean_purchase,
        |  (m1 - m2) / sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
        |    AS t_stat,
        |  ((v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
        |    * (v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)))
        |  / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
        |       / CAST(n1 - 1 AS DOUBLE)
        |     + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
        |       / CAST(n2 - 1 AS DOUBLE)) AS df_welch
        |FROM m""".stripMargin
  ) { (s, dir) =>
    val c = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("v_c",
        floor(col("value") * 100 + lit(0.5)).cast(LongType))
    def cnt(t: String) = count(when(col("event_type") === t, 1)).cast(LongType)
    def sm(t: String) =
      sum(when(col("event_type") === t, col("v_c"))).cast(LongType)
    def sq(t: String) =
      sum(when(col("event_type") === t, col("v_c") * col("v_c")))
        .cast(LongType)
    val st = c.agg(cnt("click").as("n1"), sm("click").as("s1"),
      sq("click").as("q1"), cnt("purchase").as("n2"),
      sm("purchase").as("s2"), sq("purchase").as("q2"))
    def d(cn: org.apache.spark.sql.Column) = cn.cast(DoubleType)
    val m = st.select(col("n1"), col("n2"),
      (d(col("s1")) / d(col("n1"))).as("m1"),
      (d(col("s2")) / d(col("n2"))).as("m2"),
      ((d(col("q1")) - d(col("s1")) * (d(col("s1")) / d(col("n1"))))
        / d(col("n1") - 1)).as("v1"),
      ((d(col("q2")) - d(col("s2")) * (d(col("s2")) / d(col("n2"))))
        / d(col("n2") - 1)).as("v2"))
    val se1 = d(col("v1")) / d(col("n1"))
    val se2 = d(col("v2")) / d(col("n2"))
    m.select(col("n1"), col("n2"),
      (col("m1") / lit(1.0e2)).as("mean_click"),
      (col("m2") / lit(1.0e2)).as("mean_purchase"),
      ((col("m1") - col("m2")) / sqrt(se1 + se2)).as("t_stat"),
      (((se1 + se2) * (se1 + se2))
        / (se1 * se1 / d(col("n1") - 1) + se2 * se2 / d(col("n2") - 1)))
        .as("df_welch"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the click and
    * purchase value distributions — the nonparametric "did the whole
    * DISTRIBUTION shift" A/B primitive next to q_rank_sum (location) and
    * q_ttest_welch (mean): D = max_v |F̂₁(v) − F̂₂(v)|, with the argmax
    * value reported (where the distributions diverge most).
    *
    * Exactness: values snap once to integer cents; the sup statistic is
    * computed with denominators CLEARED — max |c₁·n₂ − c₂·n₁| over
    * exact BIGINT cumulative counts — so the maximizer is decided in
    * integer arithmetic and only the published D performs one IEEE
    * division (identical cross-engine). Ties on the max break to the
    * SMALLEST cents value (total order).
    *
    * Scale: the corpus collapses FIRST to (cents, side-counts) grain —
    * one hash aggregation with map-side combine. The cumulative window
    * that follows is partition-less but runs over the DISTINCT CENTS
    * GRID, whose size is bounded by the value domain (≤ ~56k cells for
    * this feed), not by the row count — the q_skyline coarse-frame
    * class, constant as the corpus scales. The final argmax is a
    * TakeOrdered top-1, never a global sort. */
  val ksTest: Q = Q.checked(
    "q_ks_test",
    Tables.EventsCte +
      """,
        |g AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |        CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
        |          AS c1,
        |        CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
        |          AS c2
        |      FROM ev WHERE event_type IN ('click', 'purchase')
        |      GROUP BY 1),
        |cum AS (SELECT cents,
        |          sum(c1) OVER (ORDER BY cents) AS f1,
        |          sum(c2) OVER (ORDER BY cents) AS f2,
        |          (SELECT sum(c1) FROM g) AS n1,
        |          (SELECT sum(c2) FROM g) AS n2
        |        FROM g)
        |SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
        |  CAST(abs(f1 * n2 - f2 * n1) AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d_stat,
        |  cents AS at_cents
        |FROM cum
        |ORDER BY abs(f1 * n2 - f2 * n1) DESC, cents LIMIT 1""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value") * 100).cast(LongType).as("cents"),
        col("event_type"))
    val g = ev.groupBy("cents").agg(
      count_if(col("event_type") === "click").as("c1"),
      count_if(col("event_type") === "purchase").as("c2"))
    val w = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = g.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    g.withColumn("f1", sum("c1").over(w))
      .withColumn("f2", sum("c2").over(w))
      .crossJoin(broadcast(totals))
      .select(col("n1").as("n_click"), col("n2").as("n_purchase"),
        (abs(col("f1") * col("n2") - col("f2") * col("n1")).cast(DoubleType)
          / (col("n1").cast(DoubleType) * col("n2").cast(DoubleType)))
          .as("d_stat"),
        col("cents").as("at_cents"),
        abs(col("f1") * col("n2") - col("f2") * col("n1")).as("__m"))
      .orderBy(col("__m").desc, col("at_cents"))
      .limit(1)
      .drop("__m")
  }

  val all: Seq[Q] =
    Seq(histogram, outliers, groupedMode, skyline, madOutliers, decayScore,
      pareto, rankSum, winsorize, regrSlope, corrMatrix, hist2d, ttestWelch,
      ksTest)
}
