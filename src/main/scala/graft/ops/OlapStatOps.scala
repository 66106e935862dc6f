package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 OLAP/statistics additions: eight more shapes the registry
  * did not cover — market concentration (Herfindahl-Hirschman), serial
  * correlation (lag-1 autocorrelation), a non-parametric randomness
  * test (Wald-Wolfowitz runs), a contingency independence statistic
  * (chi-square cells), quantile banding (NTILE quartiles), cohort
  * retention, inter-order gap statistics, and RFM segmentation cells.
  *
  * Determinism (SURVEY §7.5): money flows through decimal(18,2) cents
  * as BIGINT; every multi-row output carries a total ORDER BY.
  * O(n²)-shaped statistics aggregate FIRST (daily series ≤366 rows,
  * contingency cells ≤6) — the bounded-series discipline.
  *
  * DTYPE RULE (verified r9 by scanning the arrow schema of every green
  * oracle output): NO decimal of ANY precision may reach a checked
  * output boundary — the driver hash accepts int32/int64/float64/
  * string/date/timestamp/bool ONLY. q_gini failed at DECIMAL(38,0) in
  * r8; q_hhi/q_autocorr/q_chi_square failed at DECIMAL(28,0) in r9
  * with values proven bit-identical. Exact decimal arithmetic stays
  * INTERNAL; boundaries ship BIGINT micro-ratios (`div`, never `/` —
  * Column `/` is IEEE double division) or a terminal CAST of the
  * exact integers to DOUBLE (precedent: CdcOps.scala, green).
  */
object OlapStatOps {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * 100).cast("long")

  // squares of cent-scale values exceed BIGINT — run products at
  // decimal(14,0)² → decimal(29,0), sums widen to decimal(38,0)
  // internally; outputs NEVER ship decimal (see the dtype rule above)
  private def d14(c: org.apache.spark.sql.Column) = c.cast("decimal(14,0)")
  private def out28(c: org.apache.spark.sql.Column) = c.cast("decimal(28,0)")

  /** Herfindahl-Hirschman concentration of customer revenue within each
    * market segment: HHI = Σ shareᵢ² = Σ xᵢ² / (Σ xᵢ)², shipped as an
    * exact BIGINT micro-ratio hhi_micro = num div (den div 10⁶) with
    * num = Σ xᵢ² and den = (Σ xᵢ)² in cents² (den-first division keeps
    * every intermediate ≤ den, so the exactness envelope runs to
    * den < 10³⁸ — segment revenue < 10¹⁷ dollars, far beyond 100 TB;
    * both engines state the IDENTICAL formula so the floor bias
    * cancels). The monopoly audit twin of q_gini (HHI weights the TOP
    * of the distribution; Gini the whole curve). One groupBy per
    * grain, no window. */
  val hhi: Q = Q.checked(
    "q_hhi",
    """WITH rev AS (
      |  SELECT c_mktsegment AS segment,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |           AS DECIMAL(18,0)) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY segment, c_custkey)
      |SELECT segment,
      |  CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(sum(CAST(cents AS HUGEINT) * cents)
      |    // (sum(CAST(cents AS HUGEINT)) * sum(CAST(cents AS HUGEINT))
      |       // 1000000) AS BIGINT) AS hhi_micro
      |FROM rev GROUP BY segment ORDER BY segment""".stripMargin
  ) { (s, dir) =>
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
      .agg(cents(sum(col("o_totalprice").cast("decimal(18,2)"))).as("cents"))
    rev.groupBy("segment")
      .agg(count(lit(1)).as("n_cust"),
        sum(d14(col("cents")) * d14(col("cents"))).as("num"),
        (sum(d14(col("cents"))) * sum(d14(col("cents")))).as("den"))
      .select(col("segment"), col("n_cust"),
        expr("CAST(num div (den div 1000000) AS BIGINT)").as("hhi_micro"))
      .orderBy("segment")
  }

  /** Lag-1 autocorrelation of 1996's daily revenue series, as the exact
    * Pearson ingredients over consecutive-day pairs (aₜ, bₜ=xₜ₊₁).
    * Distinct from q_autocorr_daily (event COUNTS, rounded scalar
    * output): this one runs on MONEY (cents) and ships the four exact
    * cleared-denominator integers so no IEEE op ever touches the
    * ledger — the caller takes N/√(Da·Db) off-engine:
    * corr = N / sqrt(Da·Db) with N = m·Σab − Σa·Σb,
    * Da = m·Σa² − (Σa)², Db = m·Σb² − (Σb)² — all computed as exact
    * integers in cents², then shipped as a TERMINAL CAST to DOUBLE
    * (the dtype rule: one round-to-nearest conversion of an exact
    * integer, no IEEE arithmetic on-engine — both engines convert the
    * identical integer so the float64 boundary hashes equal). The
    * lead() window runs on the AGGREGATED ≤366-row series
    * (parameter-bounded, never raw orders). */
  val autocorr: Q = Q.checked(
    "q_autocorr",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |           AS DECIMAL(28,0)) AS BIGINT) AS cents
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1),
      |pairs AS (
      |  SELECT cents AS a, lead(cents) OVER (ORDER BY d) AS b
      |  FROM daily)
      |SELECT CAST(count(*) AS BIGINT) AS m,
      |  CAST(count(*) * sum(CAST(a AS HUGEINT) * b)
      |    - sum(CAST(a AS HUGEINT)) * sum(CAST(b AS HUGEINT))
      |    AS DOUBLE) AS ac_num,
      |  CAST(count(*) * sum(CAST(a AS HUGEINT) * a)
      |    - sum(CAST(a AS HUGEINT)) * sum(CAST(a AS HUGEINT))
      |    AS DOUBLE) AS ac_den_a,
      |  CAST(count(*) * sum(CAST(b AS HUGEINT) * b)
      |    - sum(CAST(b AS HUGEINT)) * sum(CAST(b AS HUGEINT))
      |    AS DOUBLE) AS ac_den_b
      |FROM pairs WHERE b IS NOT NULL""".stripMargin
  ) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(cents(sum(col("o_totalprice").cast("decimal(18,2)"))).as("cents"))
    val pairs = daily
      .select(col("cents").as("a"),
        lead(col("cents"), 1).over(Window.orderBy("d")).as("b"))
      .filter(col("b").isNotNull)
    pairs.agg(
      count(lit(1)).as("m"),
      (count(lit(1)) * sum(d14(col("a")) * d14(col("b"))) -
        sum(d14(col("a"))) * sum(d14(col("b")))).cast("double").as("ac_num"),
      (count(lit(1)) * sum(d14(col("a")) * d14(col("a"))) -
        sum(d14(col("a"))) * sum(d14(col("a")))).cast("double").as("ac_den_a"),
      (count(lit(1)) * sum(d14(col("b")) * d14(col("b"))) -
        sum(d14(col("b"))) * sum(d14(col("b")))).cast("double").as("ac_den_b"))
  }

  /** Wald-Wolfowitz runs test over 1996's daily revenue: each day is
    * ABOVE or BELOW the year mean (exact integer cross-multiplication —
    * cents·n vs total, no division), and a run is a maximal streak of
    * one side. Too few runs = trend/clustering, too many = oscillation;
    * (n_above, n_below, n_runs) feed the normal approximation
    * off-engine. Lag window on the bounded daily series. */
  val runsTest: Q = Q.checked(
    "q_runs_test",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |           AS DECIMAL(28,0)) AS BIGINT) AS cents
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |               CAST(sum(CAST(cents AS HUGEINT)) AS DECIMAL(28,0))
      |                 AS total FROM daily),
      |sides AS (
      |  SELECT d,
      |    CASE WHEN CAST(cents AS DECIMAL(28,0)) * n > total
      |      THEN 1 ELSE 0 END AS above
      |  FROM daily, tot),
      |flips AS (
      |  SELECT above,
      |    CASE WHEN lag(above) OVER (ORDER BY d) IS NULL THEN 1
      |         WHEN lag(above) OVER (ORDER BY d) <> above THEN 1
      |         ELSE 0 END AS run_start
      |  FROM sides)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(above) AS BIGINT) AS n_above,
      |  CAST(count(*) - sum(above) AS BIGINT) AS n_below,
      |  CAST(sum(run_start) AS BIGINT) AS n_runs
      |FROM flips""".stripMargin
  ) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(cents(sum(col("o_totalprice").cast("decimal(18,2)"))).as("cents"))
    // lazy 1-row count frame (the q_mann_kendall idiom: no Spark job at
    // registry construction)
    val tot = daily.agg(count(lit(1)).as("n"),
      out28(sum(d14(col("cents")))).as("total"))
    val sides = daily.crossJoin(broadcast(tot))
      .select(col("d"),
        when(out28(col("cents")) * col("n") > col("total"), lit(1))
          .otherwise(lit(0)).as("above"))
    val lagW = Window.orderBy("d")
    val flips = sides.select(col("above"),
      when(lag(col("above"), 1).over(lagW).isNull, lit(1))
        .when(lag(col("above"), 1).over(lagW) =!= col("above"), lit(1))
        .otherwise(lit(0)).as("run_start"))
    flips.agg(count(lit(1)).as("n_days"),
      sum(col("above")).cast("long").as("n_above"),
      (count(lit(1)) - sum(col("above"))).cast("long").as("n_below"),
      sum(col("run_start")).cast("long").as("n_runs"))
  }

  /** Chi-square independence cells for l_returnflag × l_linestatus:
    * per cell the exact BIGINT micro-contribution
    * chi_micro = 10⁶·(N·obs − r·c)² div (N·r·c) — algebraically
    * 10⁶·(obs−E)²/E with E = r·c/N, so Σ chi_micro/10⁶ = χ² — computed
    * entirely in cleared-denominator integers (internal decimal; the
    * 10⁶-scaled square stays within decimal(38) while N ≤ 10⁸ rows —
    * the scan aggregates FIRST, so N is the table cardinality only in
    * the statistic's value, never in intermediate row counts). Row and
    * column totals via window sums over the ≤9-cell contingency frame
    * (parameter-bounded); the lineitem scan is ONE groupBy. */
  val chiSquare: Q = Q.checked(
    "q_chi_square",
    """WITH cells AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(count(*) AS BIGINT) AS obs
      |  FROM lineitem GROUP BY 1, 2),
      |tot AS (
      |  SELECT l_returnflag, l_linestatus, obs,
      |    sum(obs) OVER (PARTITION BY l_returnflag) AS r,
      |    sum(obs) OVER (PARTITION BY l_linestatus) AS c,
      |    sum(obs) OVER () AS n
      |  FROM cells)
      |SELECT l_returnflag, l_linestatus, obs,
      |  CAST(1000000 * (CAST(n AS HUGEINT) * obs - CAST(r AS HUGEINT) * c)
      |    * (CAST(n AS HUGEINT) * obs - CAST(r AS HUGEINT) * c)
      |    // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS chi_micro
      |FROM tot ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    val cells = Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("obs"))
    // window sums over the ≤9-row cell frame — parameter-bounded
    val tot = cells
      .withColumn("r", sum("obs").over(Window.partitionBy("l_returnflag")))
      .withColumn("c", sum("obs").over(Window.partitionBy("l_linestatus")))
      .withColumn("n", sum("obs").over(Window.partitionBy()))
    val dev = d14(col("n")) * d14(col("obs")) - d14(col("r")) * d14(col("c"))
    tot.select(col("l_returnflag"), col("l_linestatus"), col("obs"),
      (lit(1000000) * out28(dev * dev)).as("chi_num"),
      out28(d14(col("n")) * d14(col("r")) * d14(col("c"))).as("chi_den"))
      .select(col("l_returnflag"), col("l_linestatus"), col("obs"),
        expr("CAST(chi_num div chi_den AS BIGINT)").as("chi_micro"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Customer account-balance quartiles per segment: NTILE(4) over
    * (acctbal, custkey) — the tie-break makes band assignment total —
    * then per band: population and the band's [min, max] in cents.
    * Both engines share NTILE's floor-distribution semantics; the
    * window partitions by segment (hash-distributed, scale-safe). */
  val ntileBands: Q = Q.checked(
    "q_ntile_bands",
    """WITH banded AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
      |      AS DECIMAL(18,0)) AS BIGINT) AS bal_cents,
      |    ntile(4) OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal, c_custkey) AS band
      |  FROM customer)
      |SELECT segment, CAST(band AS INT) AS band,
      |  CAST(count(*) AS BIGINT) AS n_cust,
      |  min(bal_cents) AS lo_cents,
      |  max(bal_cents) AS hi_cents
      |FROM banded GROUP BY segment, band
      |ORDER BY segment, band""".stripMargin
  ) { (s, dir) =>
    val banded = Tables.customer(s, dir)
      .select(col("c_mktsegment").as("segment"),
        cents(col("c_acctbal")).as("bal_cents"),
        ntile(4).over(Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal"), col("c_custkey"))).as("band"))
    banded.groupBy("segment", "band")
      .agg(count(lit(1)).as("n_cust"),
        min("bal_cents").as("lo_cents"),
        max("bal_cents").as("hi_cents"))
      .orderBy("segment", "band")
  }

  /** Cohort retention matrix — the classic product-analytics shape the
    * registry lacked: customers cohorted by FIRST-order month, then for
    * each (cohort, month-offset) the count of distinct customers active
    * that many months later. Bounded output (first-year cohorts ×
    * offsets 0..6); the per-customer first-order collapse is one
    * groupBy. The activity join is a plain o_custkey equi-join — the
    * firsts frame is PER-CUSTOMER and scales with the corpus, so no
    * broadcast hint: AQE broadcasts it when small and shuffles when
    * not (both sides hash on the same key, so the shuffle
    * co-partitions). */
  val cohortRetention: Q = Q.checked(
    "q_cohort_retention",
    """WITH firsts AS (
      |  SELECT o_custkey,
      |         CAST(min(date_trunc('month', o_orderdate)) AS DATE) AS cohort
      |  FROM orders GROUP BY 1),
      |acts AS (
      |  SELECT DISTINCT o.o_custkey, f.cohort,
      |    (year(o.o_orderdate) * 12 + month(o.o_orderdate))
      |    - (year(f.cohort) * 12 + month(f.cohort)) AS offs
      |  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey)
      |SELECT cohort, CAST(offs AS BIGINT) AS month_offset,
      |  CAST(count(*) AS BIGINT) AS n_active
      |FROM acts
      |WHERE offs <= 6 AND cohort < DATE '1996-01-01'
      |GROUP BY cohort, offs ORDER BY cohort, month_offset""".stripMargin
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val firsts = o.groupBy("o_custkey")
      .agg(date_trunc("month", min(col("o_orderdate"))).cast("date")
        .as("cohort"))
    val acts = o.join(firsts, "o_custkey")
      .select(col("o_custkey"), col("cohort"),
        ((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) -
          (year(col("cohort")) * 12 + month(col("cohort")))).as("offs"))
      .distinct()
    acts.filter(col("offs") <= 6 &&
        col("cohort") < lit("1996-01-01").cast("date"))
      .groupBy(col("cohort"), col("offs").cast("long").as("month_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort", "month_offset")
  }

  /** Inter-order gap statistics per segment: day gaps between each
    * customer's consecutive orders ((o_orderdate, o_orderkey)-ordered
    * lag window per customer — hash-distributed, scale-safe), then
    * exact (count, min, max, sum) day integers per segment — the
    * purchase-cadence screen without a float in sight. */
  val orderGaps: Q = Q.checked(
    "q_order_gaps",
    """WITH gaps AS (
      |  SELECT c_mktsegment AS segment,
      |    date_diff('day',
      |      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS gap
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT segment,
      |  CAST(count(gap) AS BIGINT) AS n_gaps,
      |  CAST(min(gap) AS BIGINT) AS min_gap,
      |  CAST(max(gap) AS BIGINT) AS max_gap,
      |  CAST(sum(gap) AS BIGINT) AS total_gap_days
      |FROM gaps WHERE gap IS NOT NULL
      |GROUP BY segment ORDER BY segment""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(w))).as("gap"))
      .filter(col("gap").isNotNull)
    gaps.groupBy("segment")
      .agg(count(col("gap")).as("n_gaps"),
        min("gap").cast("long").as("min_gap"),
        max("gap").cast("long").as("max_gap"),
        sum("gap").cast("long").as("total_gap_days"))
      .orderBy("segment")
  }

  /** RFM segmentation cells: per segment, each customer banded into
    * terciles of Recency (last order date), Frequency (order count) and
    * Monetary (revenue cents) — NTILE(3) with custkey tie-breaks, all
    * three windows per segment — then the population of every (r,f,m)
    * cell. The marketing-segmentation shape; ≤27 cells per segment. */
  val rfmCells: Q = Q.checked(
    "q_rfm",
    """WITH cust AS (
      |  SELECT c_mktsegment AS segment, c_custkey,
      |    CAST(max(o_orderdate) AS DATE) AS last_d,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |      AS DECIMAL(18,0)) AS BIGINT) AS mon
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |banded AS (
      |  SELECT segment,
      |    ntile(3) OVER (PARTITION BY segment
      |      ORDER BY last_d, c_custkey) AS r_band,
      |    ntile(3) OVER (PARTITION BY segment
      |      ORDER BY freq, c_custkey) AS f_band,
      |    ntile(3) OVER (PARTITION BY segment
      |      ORDER BY mon, c_custkey) AS m_band
      |  FROM cust)
      |SELECT segment, CAST(r_band AS INT) AS r_band,
      |  CAST(f_band AS INT) AS f_band, CAST(m_band AS INT) AS m_band,
      |  CAST(count(*) AS BIGINT) AS n_cust
      |FROM banded GROUP BY segment, r_band, f_band, m_band
      |ORDER BY segment, r_band, f_band, m_band""".stripMargin
  ) { (s, dir) =>
    val cust = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
      .agg(to_date(max(col("o_orderdate"))).as("last_d"),
        count(lit(1)).as("freq"),
        cents(sum(col("o_totalprice").cast("decimal(18,2)"))).as("mon"))
    def band(c: String) = ntile(3).over(Window.partitionBy("segment")
      .orderBy(col(c), col("c_custkey")))
    val banded = cust.select(col("segment"),
      band("last_d").as("r_band"), band("freq").as("f_band"),
      band("mon").as("m_band"))
    banded.groupBy("segment", "r_band", "f_band", "m_band")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("segment", "r_band", "f_band", "m_band")
  }

  /** Windowed event funnel (the ClickHouse-windowFunnel shape): per
    * user, the deepest step of the ordered chain view → click →
    * purchase reached such that each step happens strictly AFTER the
    * previous matched step and within 7 days of the chain's anchor
    * (the user's first view). Semantics are deterministic by
    * construction: each step binds to the EARLIEST qualifying event
    * (min-ts), so there is no greedy/backtrack ambiguity. Output is the
    * depth histogram.
    *
    * Scale shape: each step is a user-grain min-aggregate joined on
    * user_id — three same-key shuffles that co-partition, never a
    * per-user sequence scan or a sort of the raw stream. */
  val windowFunnel: Q = Q.checked(
    "q_window_funnel",
    Tables.EventsCte +
      """,
        |v AS (SELECT user_id, min(ts) AS t1 FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |        AND e.ts <= v.t1 + INTERVAL 7 DAY
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3
        |      FROM ev e
        |      JOIN c ON e.user_id = c.user_id
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |        AND e.ts <= v.t1 + INTERVAL 7 DAY
        |      GROUP BY 1)
        |SELECT CAST(1 + (c.user_id IS NOT NULL)::INT
        |         + (p.user_id IS NOT NULL)::INT AS INT) AS depth,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM v
        |LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |GROUP BY 1 ORDER BY depth""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val week = expr("INTERVAL 7 DAYS")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + week)
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = ev.filter(col("event_type") === "purchase").as("e")
      .join(c, "user_id").join(v, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t1") + week)
      .groupBy("user_id").agg(min("ts").as("t3"))
    v.join(c.select(col("user_id"), lit(1).as("has2")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("has3")), Seq("user_id"), "left")
      .select((lit(1) + coalesce(col("has2"), lit(0)) +
        coalesce(col("has3"), lit(0))).cast("int").as("depth"))
      .groupBy("depth").agg(count(lit(1)).as("n_users"))
      .orderBy("depth")
  }

  /** Concatenate-and-chop sequence-packing audit (the GPT-style data
    * loader shape): per source, docs concatenate in doc_id order into
    * one token stream chopped into 512-token training sequences.
    * Reports docs, tokens, sequence count, boundary-straddling docs (a
    * doc whose span crosses a chop point — attention-mask leakage
    * candidates) and pad tokens in the final sequence. Tokens are the
    * house whitespace convention (q_token_budget); the prefix sum is
    * one source-partitioned window with an explicit ROWS frame over a
    * unique (doc_id) order — deterministic and hash-distributed. The
    * engine side IS [[graft.CuratePipeline.packAudit]] — the same
    * audit runs as a `pack_audit` pipeline report stage. */
  val seqPack: Q = Q.checked(
    "q_seq_pack",
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |w AS (
      |  SELECT source, doc_id, ntok,
      |    sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(ntok) AS BIGINT) AS total_tokens,
      |  CAST((max(cum) + 511) // 512 AS BIGINT) AS n_seqs,
      |  CAST(sum(CASE WHEN (cum - ntok) // 512 <> (cum - 1) // 512
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
      |  CAST((max(cum) + 511) // 512 * 512 - max(cum) AS BIGINT)
      |    AS pad_tokens
      |FROM w GROUP BY source ORDER BY source""".stripMargin
  ) { (s, dir) =>
    graft.CuratePipeline.packAudit(Tables.documents(s, dir),
      "source", "doc_id", "text", 512)
  }

  /** DAU/WAU stickiness per ISO week (both engines truncate weeks to
    * Monday): average daily actives over weekly actives as an exact
    * milli-ratio — 1000·Σdau // (n_days·wau), integer division only.
    * The engagement one-number a metrics pipeline alarms on. One
    * distinct-collapse to (day, user) grain, then day- and week-grain
    * aggregates — bounded by the calendar, never the event stream. */
  val stickiness: Q = Q.checked(
    "q_stickiness",
    Tables.EventsCte +
      """,
        |d AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
        |        user_id FROM ev),
        |daily AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
        |          FROM d GROUP BY 1),
        |wk AS (SELECT CAST(date_trunc('week', day) AS DATE) AS week,
        |         CAST(sum(dau) AS BIGINT) AS sum_dau,
        |         CAST(count(*) AS BIGINT) AS n_days
        |       FROM daily GROUP BY 1),
        |wau AS (SELECT CAST(date_trunc('week', day) AS DATE) AS week,
        |          CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |        FROM d GROUP BY 1)
        |SELECT wk.week, n_days, sum_dau, wau,
        |  1000 * sum_dau // (n_days * wau) AS stickiness_milli
        |FROM wk JOIN wau ON wk.week = wau.week
        |ORDER BY wk.week""".stripMargin
  ) { (s, dir) =>
    val d = Tables.events(s, dir)
      .select(date_trunc("day", col("ts")).cast("date").as("day"),
        col("user_id"))
      .distinct()
    val daily = d.groupBy("day").agg(count(lit(1)).as("dau"))
    val wk = daily
      .groupBy(date_trunc("week", col("day")).cast("date").as("week"))
      .agg(sum("dau").cast("long").as("sum_dau"),
        count(lit(1)).as("n_days"))
    val wau = d
      .groupBy(date_trunc("week", col("day")).cast("date").as("week"))
      .agg(countDistinct("user_id").as("wau"))
    wk.join(wau, "week")
      .select(col("week"), col("n_days"), col("sum_dau"), col("wau"),
        expr("1000 * sum_dau div (n_days * wau)").as("stickiness_milli"))
      .orderBy("week")
  }

  /** Decile lift/gains table — the classifier-evaluation shape: docs
    * ranked by a deterministic quality score (TTR milli), NTILE(10)
    * deciles, and per decile the cumulative positive rate against the
    * base rate as an exact milli-lift (integer division only; label =
    * lang='en' as the weak positive).
    *
    * The ORACLE states plain `ntile(10) OVER (ORDER BY score DESC,
    * doc_id)`. The ENGINE refuses the global window (a corpus-scaled
    * partition-less sort — the anti-pattern at 100 TB) and computes the
    * SAME decile distributively: the score domain is bounded (0..1000
    * milli), so a ≤1001-row histogram prefix gives each score's global
    * offset, a score-partitioned row_number breaks ties by doc_id, and
    * NTILE's floor-distribution formula maps the exact global position
    * to its decile. The hash-compare proves the two formulations
    * identical. */
  val liftCurve: Q = Q.checked(
    "q_lift_curve",
    """WITH d AS (
      |  SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS pos,
      |    CAST(1000 * len(list_distinct(string_split(text, ' ')))
      |      // len(string_split(text, ' ')) AS BIGINT) AS score
      |  FROM documents),
      |banded AS (
      |  SELECT pos, ntile(10) OVER (ORDER BY score DESC, doc_id) AS decile
      |  FROM d),
      |agg AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(pos) AS BIGINT) AS np
      |  FROM banded GROUP BY 1),
      |cum AS (
      |  SELECT decile, n, np,
      |    sum(n) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
      |    sum(np) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnp,
      |    sum(n) OVER () AS tn, sum(np) OVER () AS tnp
      |  FROM agg)
      |SELECT CAST(decile AS INT) AS decile, n, np,
      |  CAST(cn AS BIGINT) AS cum_n, CAST(cnp AS BIGINT) AS cum_pos,
      |  CAST(1000 * cnp * tn // (cn * tnp) AS BIGINT) AS lift_milli
      |FROM cum ORDER BY decile""".stripMargin
  ) { (s, dir) =>
    val d = Tables.documents(s, dir).select(col("doc_id"),
      (col("lang") === "en").cast("long").as("pos"),
      expr("CAST(1000 * size(array_distinct(split(text, ' '))) div " +
        "size(split(text, ' ')) AS BIGINT)").as("score"))
    // per-score tie rank: hash-distributed (bounded rows per score key)
    val rn = row_number().over(
      Window.partitionBy("score").orderBy("doc_id"))
    val ranked = d.withColumn("rn", rn)
    // histogram prefix over the BOUNDED score domain (≤1001 rows): how
    // many docs carry a strictly higher score
    val hist = d.groupBy("score").agg(count(lit(1)).as("cnt"))
    val before = coalesce(sum("cnt").over(Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val pfx = hist.select(col("score"), before.as("before"))
    val tot = d.agg(count(lit(1)).as("tn"), sum("pos").as("tnp"))
    val positioned = ranked.join(broadcast(pfx), "score")
      .withColumn("gpos", col("before") + col("rn"))
      .crossJoin(broadcast(tot))
    // exact NTILE(10) floor distribution from the global position:
    // the first (tn mod 10) deciles hold (tn div 10 + 1) rows each
    val banded = positioned.withColumn("decile",
      expr("""CAST(CASE
        | WHEN gpos <= (tn div 10 + 1) * (tn % 10)
        |   THEN (gpos - 1) div (tn div 10 + 1) + 1
        | ELSE tn % 10 + (gpos - (tn div 10 + 1) * (tn % 10) - 1)
        |   div (tn div 10) + 1
        |END AS INT)""".stripMargin.replace("\n", " ")))
    val agg = banded.groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("pos").as("np"))
    // cumulative frame over the 10-row decile table (parameter-bounded)
    val cw = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.withColumn("cn", sum("n").over(cw))
      .withColumn("cnp", sum("np").over(cw))
      .crossJoin(broadcast(tot.select(col("tn").as("t_n"),
        col("tnp").as("t_np"))))
      .select(col("decile"), col("n"), col("np"),
        col("cn").cast("long").as("cum_n"),
        col("cnp").cast("long").as("cum_pos"),
        expr("CAST(1000 * cnp * t_n div (cn * t_np) AS BIGINT)")
          .as("lift_milli"))
      .orderBy("decile")
  }

  val all: Seq[Q] =
    Seq(hhi, autocorr, runsTest, chiSquare, ntileBands,
      cohortRetention, orderGaps, rfmCells, windowFunnel,
      seqPack, stickiness, liftCurve)
}
