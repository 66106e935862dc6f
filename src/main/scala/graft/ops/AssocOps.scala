package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Round-12 association / dispersion statistics — the four classical
  * measures the stat suite still lacked: Spearman rank correlation
  * (monotone association, robust to the outliers Pearson q_agg_corr is
  * not), the Theil T inequality index (decomposable, next to
  * q_gini/q_pareto/q_hhi which are not), the coefficient of variation
  * (the dimensionless spread number operations dashboards quote), and
  * a day-of-week × hour activity heatmap (the load-shape primitive).
  *
  * Determinism (SURVEY §7.5): every aggregate folds EXACT integers —
  * money snaps once to cents (`floor(x*100 + 0.5)`, the q_ttest_welch
  * idiom), ranks ARE integers, squared/cross sums ride DECIMAL(38,0)
  * (exact and fold-order-free at ANY scale factor, where BIGINT sums of
  * squares would overflow past ~sf0.3) — then ONE terminal IEEE tree
  * written identically in both engines, rounded once. The only
  * transcendental (Theil's ln) is snapped to a BIGINT micro-log on an
  * exact integer input — the q_kl_source recipe — so the SUM of terms
  * is integer arithmetic, not a float fold.
  *
  * Scale shape: no window ever touches the raw corpus. Spearman ranks
  * come off the DISTINCT-VALUE grid (value-domain-bounded, the
  * q_ks_test coarse-frame class) and join back by value; Theil
  * collapses orders to customer grain first; CV and the heatmap are
  * single hash aggregates with map-side combine. */
object AssocOps {

  private def d(c: Column): Column = c.cast(DoubleType)
  private val D38 = DecimalType(38, 0)

  /** Spearman rank correlation between quantity and extended price per
    * return flag. Competition ranks (`1 + #{smaller}`), computed
    * scale-sanely per column shape: quantity ranks off its ≤50-value
    * GRID (running count over the grid, joined back by value); price is
    * near-UNIQUE (the grid would be the corpus), so its rank is
    * two-level — a bounded-RANGE bucket (`floor(v/1000)`, ≤ ~5.3k
    * buckets since TPC-H extendedprice ≤ qty·maxprice regardless of
    * row count) carries a cumulative offset, and `rank()` within each
    * (flag, bucket) window adds the in-bucket position: exactly the
    * range-partitioned discipline of a distributed global sort, never
    * a 3-partition corpus window. Ties share a bucket by construction,
    * so offset + in-bucket rank IS the global competition rank. With
    * integer ranks every moment (Σx, Σy, Σxy, Σx², Σy²) is an exact
    * DECIMAL(38,0) fold; the Pearson-on-ranks formula is one fixed
    * IEEE tree (q_agg_corr's), rounded once to 9dp. */
  val spearman: Q = Q.checked(
    "q_spearman",
    """WITH qg AS (
      |  SELECT l_returnflag f, l_quantity v, count(*) c FROM lineitem
      |  GROUP BY 1, 2),
      |qr AS (
      |  SELECT f, v,
      |    sum(c) OVER (PARTITION BY f ORDER BY v
      |                 ROWS UNBOUNDED PRECEDING) - c + 1 AS r
      |  FROM qg),
      |pb AS (
      |  SELECT l_returnflag f, CAST(floor(l_extendedprice / 1000) AS
      |    BIGINT) b, count(*) c
      |  FROM lineitem GROUP BY 1, 2),
      |po AS (
      |  SELECT f, b,
      |    sum(c) OVER (PARTITION BY f ORDER BY b
      |                 ROWS UNBOUNDED PRECEDING) - c AS off
      |  FROM pb),
      |pr AS (
      |  SELECT l.l_returnflag f, l.l_quantity q,
      |    po.off + rank() OVER (
      |      PARTITION BY l.l_returnflag,
      |        CAST(floor(l.l_extendedprice / 1000) AS BIGINT)
      |      ORDER BY l.l_extendedprice) AS ry
      |  FROM lineitem l JOIN po ON po.f = l.l_returnflag
      |    AND po.b = CAST(floor(l.l_extendedprice / 1000) AS BIGINT)),
      |st AS (
      |  SELECT pr.f, count(*) n,
      |    sum(CAST(qr.r AS DECIMAL(38,0))) sx,
      |    sum(CAST(pr.ry AS DECIMAL(38,0))) sy,
      |    sum(CAST(qr.r AS DECIMAL(38,0)) * CAST(pr.ry AS DECIMAL(38,0)))
      |      sxy,
      |    sum(CAST(qr.r AS DECIMAL(38,0)) * CAST(qr.r AS DECIMAL(38,0)))
      |      sxx,
      |    sum(CAST(pr.ry AS DECIMAL(38,0)) * CAST(pr.ry AS DECIMAL(38,0)))
      |      syy
      |  FROM pr JOIN qr ON qr.f = pr.f AND qr.v = pr.q
      |  GROUP BY 1)
      |SELECT f AS l_returnflag, n,
      |  round(
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  , 9) AS spearman_qty_price
      |FROM st ORDER BY f""".stripMargin
  ) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    // quantity: distinct-value grid + running-count competition rank
    // (bounded by the 50-value DOMAIN, not the row count)
    val wq = Window.partitionBy("f").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qr = li.groupBy(col("l_returnflag").as("f"),
        col("l_quantity").as("v"))
      .agg(count(lit(1)).as("c"))
      .select(col("f"), col("v"),
        (sum("c").over(wq) - col("c") + 1).as("r"))
    // price: bounded-range bucket offsets + within-bucket rank
    val bkt = floor(col("l_extendedprice") / 1000).cast(LongType)
    val po = li.groupBy(col("l_returnflag").as("f"), bkt.as("b"))
      .agg(count(lit(1)).as("c"))
      .select(col("f"), col("b"),
        (sum("c").over(Window.partitionBy("f").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("c")).as("off"))
    val wp = Window.partitionBy(col("l_returnflag"), bkt)
      .orderBy("l_extendedprice")
    val pr = li
      .join(po, po("f") === li("l_returnflag") && po("b") === bkt)
      .select(li("l_returnflag").as("f"), li("l_quantity").as("q"),
        (po("off") + rank().over(wp)).as("ry"))
    val joined = pr
      .join(qr, qr("f") === pr("f") && qr("v") === pr("q"))
      .select(pr("f"), qr("r").as("rx"), pr("ry"))
    val st = joined.groupBy("f").agg(
      count(lit(1)).as("n"),
      sum(col("rx").cast(D38)).as("sx"),
      sum(col("ry").cast(D38)).as("sy"),
      sum(col("rx").cast(D38) * col("ry").cast(D38)).as("sxy"),
      sum(col("rx").cast(D38) * col("rx").cast(D38)).as("sxx"),
      sum(col("ry").cast(D38) * col("ry").cast(D38)).as("syy"))
    st.select(col("f").as("l_returnflag"), col("n"),
      round(
        (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
            sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))),
        9).as("spearman_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Theil T inequality index of customer spend per market segment:
    * T = Σ sᵢ·ln(sᵢ)/S − ln(S/n) over per-customer order totals sᵢ —
    * the decomposable inequality number next to q_gini (rank-based) and
    * q_hhi (share-of-squares). Spend snaps once to exact cents; each
    * customer's ln(cents) snaps to a BIGINT micro-log (exact integer
    * term, fold-order-free DECIMAL(38,0) sum — the q_kl_source log
    * recipe), and the published index is one fixed IEEE expression.
    * Plan: orders collapse to customer grain in one hash aggregate,
    * join customer for the segment, one segment-grain fold. */
  val theil: Q = Q.checked(
    "q_theil",
    """WITH spend AS (
      |  SELECT o_custkey,
      |    sum(CAST(floor(o_totalprice * 100 + 5.0e-1) AS BIGINT)) AS s_c
      |  FROM orders GROUP BY 1),
      |term AS (
      |  SELECT c.c_mktsegment, s.s_c,
      |    CAST(floor(ln(CAST(s.s_c AS DOUBLE)) * 1.0e6 + 5.0e-1)
      |      AS BIGINT) AS lmicro
      |  FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey),
      |seg AS (
      |  SELECT c_mktsegment, count(*) n,
      |    sum(CAST(s_c AS DECIMAL(38,0))) AS ssum,
      |    sum(CAST(s_c AS DECIMAL(38,0)) * CAST(lmicro AS DECIMAL(38,0)))
      |      AS slsum
      |  FROM term GROUP BY 1)
      |SELECT c_mktsegment, n,
      |  round(CAST(slsum AS DOUBLE) / (CAST(ssum AS DOUBLE) * 1.0e6)
      |    - ln(CAST(ssum AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS theil_t
      |FROM seg ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    val spend = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType))
        .as("s_c"))
    val term = spend
      .join(Tables.customer(s, dir),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"), col("s_c"),
        floor(log(d(col("s_c"))) * lit(1.0e6) + lit(0.5)).cast(LongType)
          .as("lmicro"))
    val seg = term.groupBy("c_mktsegment").agg(
      count(lit(1)).as("n"),
      sum(col("s_c").cast(D38)).as("ssum"),
      sum(col("s_c").cast(D38) * col("lmicro").cast(D38)).as("slsum"))
    seg.select(col("c_mktsegment"), col("n"),
      round(d(col("slsum")) / (d(col("ssum")) * lit(1.0e6)) -
        log(d(col("ssum")) / d(col("n"))), 9).as("theil_t"))
      .orderBy("c_mktsegment")
  }

  /** Coefficient of variation of order value per order priority —
    * stddev/mean, the dimensionless "how noisy is this lane" number.
    * Exact cents; n/Σ/Σ² fold as BIGINT/DECIMAL(38,0) (squares
    * overflow BIGINT past ~sf0.3); sample variance and the final ratio
    * are one fixed IEEE tree, rounded once. One map-side-combined hash
    * aggregate, ≤|priorities| result rows. */
  val orderValueCv: Q = Q.checked(
    "q_order_value_cv",
    """WITH c AS (
      |  SELECT o_orderpriority,
      |    CAST(floor(o_totalprice * 100 + 5.0e-1) AS BIGINT) AS v_c
      |  FROM orders),
      |st AS (
      |  SELECT o_orderpriority, count(*) n,
      |    sum(CAST(v_c AS DECIMAL(38,0))) s,
      |    sum(CAST(v_c AS DECIMAL(38,0)) * CAST(v_c AS DECIMAL(38,0))) q
      |  FROM c GROUP BY 1)
      |SELECT o_orderpriority, n,
      |  round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 1.0e2, 2)
      |    AS mean_value,
      |  round(
      |    sqrt((CAST(q AS DOUBLE)
      |        - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
      |      / CAST(n - 1 AS DOUBLE))
      |    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS cv
      |FROM st ORDER BY o_orderpriority""".stripMargin
  ) { (s, dir) =>
    val c = Tables.orders(s, dir).select(col("o_orderpriority"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType).as("v_c"))
    val st = c.groupBy("o_orderpriority").agg(
      count(lit(1)).as("n"),
      sum(col("v_c").cast(D38)).as("s"),
      sum(col("v_c").cast(D38) * col("v_c").cast(D38)).as("q"))
    val mean = d(col("s")) / d(col("n"))
    st.select(col("o_orderpriority"), col("n"),
      round(mean / lit(1.0e2), 2).as("mean_value"),
      round(sqrt((d(col("q")) - d(col("s")) * mean) / d(col("n") - 1)) /
        mean, 9).as("cv"))
      .orderBy("o_orderpriority")
  }

  /** Day-of-week × hour activity heatmap over the events stream:
    * traffic count and exact mean event value per (ISO weekday, hour)
    * cell — the load-shape primitive capacity planning reads first.
    * Spark `weekday()+1` equals DuckDB `isodow` (Mon=1); value snaps
    * to cents so the cell sums are exact BIGINTs and the mean is one
    * terminal division. One hash aggregate, ≤168 rows. */
  val dowHourHeatmap: Q = Q.checked(
    "q_dow_hour_heatmap",
    Tables.EventsCte +
      """
        |SELECT isodow(ts) AS dow, hour(ts) AS hr, count(*) AS n,
        |  round((CAST(sum(CAST(floor(value * 100 + 5.0e-1) AS BIGINT))
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 1.0e2, 6)
        |    AS avg_value
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy((weekday(col("ts")) + 1).cast(LongType).as("dow"),
        hour(col("ts")).cast(LongType).as("hr"))
      .agg(count(lit(1)).as("n"),
        round((d(sum(floor(col("value") * 100 + lit(0.5)).cast(LongType)))
          / d(count(lit(1)))) / lit(1.0e2), 6).as("avg_value"))
      .orderBy("dow", "hr")
  }

  /** Lagged cross-correlation between the DAILY click and purchase
    * series (lags 0..7): does click volume lead purchase volume, and by
    * how many days — the lead/lag diagnostic next to q_autocorr (one
    * series against itself) and q_conversion_lag (per-user latency).
    * The corpus collapses to day grain FIRST (≤ |calendar| rows), the
    * day spine gap-fills missing days with 0 (so the lag join is over
    * a complete, deterministic calendar), and each lag's Pearson folds
    * exact integer day-counts — one hash aggregate over ≤ 8·|days|
    * spine rows, one terminal IEEE tree per lag. */
  val crossCorr: Q = Q.checked(
    "q_cross_corr",
    Tables.EventsCte +
      """,
        |daily AS (
        |  SELECT CAST(ts AS DATE) d,
        |    count(*) FILTER (WHERE event_type = 'click') c,
        |    count(*) FILTER (WHERE event_type = 'purchase') p
        |  FROM ev WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    (SELECT min(d) FROM daily), (SELECT max(d) FROM daily),
        |    INTERVAL 1 DAY)) AS DATE) AS d),
        |filled AS (
        |  SELECT s.d, coalesce(daily.c, 0) c, coalesce(daily.p, 0) p
        |  FROM spine s LEFT JOIN daily ON daily.d = s.d),
        |lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
        |pairs AS (
        |  SELECT l.lag, f1.c x, f2.p y
        |  FROM lags l
        |  JOIN filled f1 ON true
        |  JOIN filled f2 ON f2.d = f1.d + CAST(l.lag AS INTEGER)),
        |st AS (
        |  SELECT lag, count(*) n,
        |    sum(CAST(x AS BIGINT)) sx, sum(CAST(y AS BIGINT)) sy,
        |    sum(CAST(x * y AS BIGINT)) sxy,
        |    sum(CAST(x * x AS BIGINT)) sxx,
        |    sum(CAST(y * y AS BIGINT)) syy
        |  FROM pairs GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n,
        |  round(
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |  , 9) AS xcorr
        |FROM st ORDER BY lag""".stripMargin
  ) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("ts").cast(org.apache.spark.sql.types.DateType)
        .as("d"))
      .agg(count(when(col("event_type") === "click", 1)).as("c"),
        count(when(col("event_type") === "purchase", 1)).as("p"))
    val spine = daily.agg(min("d").as("lo"), max("d").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("d"))
    val filled = spine.join(daily, Seq("d"), "left")
      .select(col("d"), coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("p"), lit(0L)).as("p"))
    val lags = s.range(0, 8).select(col("id").as("lag"))
    val f1 = filled.select(col("d").as("d1"), col("c").as("x"))
    val f2 = filled.select(col("d").as("d2"), col("p").as("y"))
    val pairs = lags.join(f1)
      .join(f2, col("d2") === date_add(col("d1"),
        col("lag").cast(org.apache.spark.sql.types.IntegerType)))
    val st = pairs.groupBy("lag").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    st.select(col("lag"), col("n"),
      round(
        (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
            sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))),
        9).as("xcorr"))
      .orderBy("lag")
  }

  /** Cohort lifetime value: customers grouped by FIRST-ORDER quarter,
    * cumulative revenue per quarter offset — the money companion to
    * q_cohort_retention's headcounts (marketing's payback-curve view).
    * Cohort/offset are exact integer quarter indexes (year·4+q), money
    * snaps once to cents, and the cumulative window runs over the
    * (cohort × offset) GRID — ≤ |quarters|² rows, never the corpus.
    * Plan: one customer-grain min-aggregate, one join back by custkey
    * (both sides shuffle on the same key), one grid aggregate. */
  val clvCohort: Q = Q.checked(
    "q_clv_cohort",
    """WITH firsts AS (
      |  SELECT o_custkey,
      |    min(year(o_orderdate) * 4 + quarter(o_orderdate) - 1) AS cq
      |  FROM orders GROUP BY 1),
      |rev AS (
      |  SELECT f.cq,
      |    (year(o.o_orderdate) * 4 + quarter(o.o_orderdate) - 1) - f.cq
      |      AS off,
      |    CAST(floor(o.o_totalprice * 100 + 5.0e-1) AS BIGINT) AS c
      |  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey),
      |grid AS (
      |  SELECT cq, off, count(*) n_orders,
      |    sum(CAST(c AS DECIMAL(38,0))) AS rev_c
      |  FROM rev GROUP BY 1, 2)
      |SELECT cq AS cohort_q, off AS offset_q, n_orders,
      |  round(CAST(sum(rev_c) OVER (PARTITION BY cq ORDER BY off
      |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1.0e2, 2)
      |    AS cum_revenue
      |FROM grid ORDER BY cohort_q, offset_q""".stripMargin
  ) { (s, dir) =>
    val qIdx = (year(col("o_orderdate")) * 4 +
      quarter(col("o_orderdate")) - 1).cast(LongType)
    val orders = Tables.orders(s, dir)
    val firsts = orders.groupBy("o_custkey").agg(min(qIdx).as("cq"))
    val rev = orders.join(firsts, "o_custkey")
      .select(col("cq"), (qIdx - col("cq")).as("off"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType).as("c"))
    val grid = rev.groupBy("cq", "off").agg(
      count(lit(1)).as("n_orders"), sum(col("c").cast(D38)).as("rev_c"))
    val w = Window.partitionBy("cq").orderBy("off")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.select(col("cq").as("cohort_q"), col("off").as("offset_q"),
      col("n_orders"),
      round(d(sum("rev_c").over(w)) / lit(1.0e2), 2).as("cum_revenue"))
      .orderBy("cohort_q", "offset_q")
  }

  /** Revenue share by UNIT-price band ($100 bands of extendedprice per
    * unit): where the money concentrates along the price axis — the
    * merchandising mix diagnostic next to q_decile_spend (customer
    * axis) and q_hist2d (qty × price counts). The band is one fixed
    * IEEE division + floor (identical cross-engine on identical
    * doubles); revenue folds as exact cents; the share clears its
    * denominator in integer milli before the single publish division.
    * One hash aggregate, output ≤ price-domain/100 rows. */
  val priceBandShare: Q = Q.checked(
    "q_price_band_share",
    """WITH b AS (
      |  SELECT CAST(floor((l_extendedprice / l_quantity) / 100) AS
      |    BIGINT) AS band,
      |    CAST(floor(l_extendedprice * 100 + 5.0e-1) AS BIGINT) AS c
      |  FROM lineitem),
      |st AS (
      |  SELECT band, count(*) n, sum(CAST(c AS DECIMAL(38,0))) rev_c
      |  FROM b GROUP BY 1),
      |tot AS (SELECT sum(rev_c) t FROM st)
      |SELECT band, n,
      |  round(CAST(rev_c AS DOUBLE) / 1.0e2, 2) AS revenue,
      |  CAST(rev_c AS BIGINT) * 1000 // CAST(t AS BIGINT)
      |    AS share_milli
      |FROM st, tot ORDER BY band""".stripMargin
  ) { (s, dir) =>
    val b = Tables.lineitem(s, dir).select(
      floor((col("l_extendedprice") / col("l_quantity")) / 100)
        .cast(LongType).as("band"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType)
        .as("c"))
    val st = b.groupBy("band").agg(count(lit(1)).as("n"),
      sum(col("c").cast(D38)).as("rev_c"))
    val tot = st.agg(sum("rev_c").as("t"))
    st.crossJoin(broadcast(tot)).select(col("band"), col("n"),
      round(d(col("rev_c")) / lit(1.0e2), 2).as("revenue"),
      // INTEGER division on exact BIGINTs — decimal '/' rounds and its
      // cross-engine rounding disagrees at band boundaries
      expr("CAST(rev_c AS BIGINT) * 1000L div CAST(t AS BIGINT)")
        .as("share_milli"))
      .orderBy("band")
  }

  val all: Seq[Q] = Seq(spearman, theil, orderValueCv, dowHourHeatmap,
    crossCorr, clvCohort, priceBandShare)
}
