package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 (second batch) trend / lifecycle / audit analytics:
  * customer win-back reactivation, open-order backlog balance, monthly
  * return-rate trend, per-nation trade balance, inter-order gap
  * percentiles, and the embedding sign-bucket skew audit (the LSH
  * hot-bucket screen).
  *
  * Determinism (SURVEY §7.5): money flows through decimal(18,2) cents
  * as BIGINT; ratios ship as BIGINT milli/micro integer divisions
  * (`div`, never `/`); NO decimal at any output boundary; every output
  * carries a total ORDER BY. Scale discipline: per-customer lag windows
  * ride the orders/customer ≈ 25 scale-stable partition; every
  * partition-less cumulative window here runs over a BOUNDED domain —
  * the ≤~84-row calendar-month series (q_backlog) or the ≤256-row sign
  * bucket frame (q_embed_sign_buckets) — never doc/order-grain rows. */
object TrendOps {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * 100).cast("long")

  /** Customer win-back: an order is a REACTIVATION when the same
    * customer's previous order was ≥ 180 days earlier (first orders
    * never qualify — no previous). Per month the reactivated order
    * count, distinct customers won back, and the win-back revenue in
    * cents — the lapsed-customer recovery trend, the retention-ops
    * complement of q_new_vs_returning (which only splits on the FIRST
    * month). The lag window is customer-partitioned (scale-stable
    * frame); the rest is one month-grain hash aggregate. */
  val reactivation: Q = Q.checked(
    "q_reactivation",
    """WITH seq AS (
      |  SELECT o_custkey, o_orderdate, o_totalprice,
      |    lag(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders)
      |SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  CAST(count(*) AS BIGINT) AS n_reactivated,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |  CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |    AS DECIMAL(18,0)) AS BIGINT)) AS BIGINT) AS winback_cents
      |FROM seq
      |WHERE prev IS NOT NULL
      |  AND date_diff('day', CAST(prev AS DATE),
      |    CAST(o_orderdate AS DATE)) >= 180
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("c"),
        lag(col("o_orderdate"), 1).over(w).as("prev"))
      .where(col("prev").isNotNull &&
        datediff(to_date(col("o_orderdate")), to_date(col("prev"))) >= 180)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("month"))
      .agg(count(lit(1)).as("n_reactivated"),
        countDistinct("o_custkey").as("n_customers"),
        sum("c").cast("long").as("winback_cents"))
      .orderBy("month")
  }

  /** Open-order backlog: per month the orders PLACED, the orders
    * COMPLETED (an order completes in the month of its LAST line's
    * shipdate) and the running placed−completed balance — the
    * fulfillment-pressure curve an ops dashboard watches. Both monthly
    * series are hash aggregates; the cumulative window runs over the
    * BOUNDED calendar-month frame (≤ ~84 rows at any SF — the dataset
    * spans fixed years), never order-grain rows. */
  val backlog: Q = Q.checked(
    "q_backlog",
    """WITH placed AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |done AS (
      |  SELECT CAST(date_trunc('month', mx) AS DATE) AS m,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT l_orderkey, max(l_shipdate) AS mx
      |        FROM lineitem GROUP BY 1)
      |  GROUP BY 1),
      |months AS (SELECT m FROM placed UNION SELECT m FROM done)
      |SELECT months.m AS month,
      |  CAST(coalesce(placed.c, 0) AS BIGINT) AS n_placed,
      |  CAST(coalesce(done.c, 0) AS BIGINT) AS n_completed,
      |  CAST(sum(coalesce(placed.c, 0) - coalesce(done.c, 0))
      |    OVER (ORDER BY months.m
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS backlog
      |FROM months
      |LEFT JOIN placed ON months.m = placed.m
      |LEFT JOIN done ON months.m = done.m
      |ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val placed = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(count(lit(1)).as("pc"))
    val done = Tables.lineitem(s, dir)
      .groupBy("l_orderkey").agg(max("l_shipdate").as("mx"))
      .groupBy(date_trunc("month", col("mx")).cast("date").as("m"))
      .agg(count(lit(1)).as("dc"))
    val months = placed.select("m").union(done.select("m")).distinct()
    // the cumulative frame is the calendar-month series — bounded, so a
    // partition-less running sum is parameter-bounded (house rule)
    months
      .join(placed, Seq("m"), "left")
      .join(done, Seq("m"), "left")
      .select(col("m").as("month"),
        coalesce(col("pc"), lit(0L)).as("n_placed"),
        coalesce(col("dc"), lit(0L)).as("n_completed"))
      .withColumn("backlog",
        sum(col("n_placed") - col("n_completed"))
          .over(Window.orderBy("month")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .orderBy("month")
  }

  /** Monthly return-rate trend (ship month): returned-line count, the
    * exact milli-share of lines returned, and the returned revenue in
    * cents — the quality/refund pressure curve. One month-grain hash
    * aggregate over lineitem, no join. */
  val returnRate: Q = Q.checked(
    "q_return_rate",
    """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
      |    AS n_returned,
      |  CAST(1000 * count(*) FILTER (WHERE l_returnflag = 'R')
      |    // count(*) AS BIGINT) AS ret_milli,
      |  CAST(coalesce(sum(CAST(CAST(CAST(l_extendedprice
      |      AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS BIGINT))
      |    FILTER (WHERE l_returnflag = 'R'), 0) AS BIGINT) AS ret_cents
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(date_trunc("month", col("l_shipdate")).cast("date")
          .as("month"),
        (col("l_returnflag") === "R").cast("long").as("r"),
        cents(col("l_extendedprice")).as("c"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_lines"),
        sum("r").as("n_returned"),
        coalesce(sum(when(col("r") === 1L, col("c"))), lit(0L))
          .as("ret_cents"))
      .select(col("month"), col("n_lines"), col("n_returned"),
        expr("CAST(1000 * n_returned div n_lines AS BIGINT)")
          .as("ret_milli"),
        col("ret_cents"))
      .orderBy("month")
  }

  /** Per-nation trade balance: revenue its SUPPLIERS earn
    * (Σ extendedprice·(1−discount) over their lines) vs revenue its
    * CUSTOMERS spend (Σ order totals), and the earn−spend balance —
    * the two independent fact aggregations joined back on the ≤25-row
    * nation dimension. Both facts collapse to nation grain BEFORE the
    * dimension join, so the joins are bounded-small on both sides. */
  val nationBalance: Q = Q.checked(
    "q_nation_balance",
    """WITH earn AS (
      |  SELECT s_nationkey AS nk,
      |    CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(24,6))) * 100) AS BIGINT) AS cents
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1),
      |spend AS (
      |  SELECT c_nationkey AS nk,
      |    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS DECIMAL(18,0)) AS BIGINT)) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1)
      |SELECT n_name AS nation,
      |  CAST(coalesce(earn.cents, 0) AS BIGINT) AS earn_cents,
      |  CAST(coalesce(spend.cents, 0) AS BIGINT) AS spend_cents,
      |  CAST(coalesce(earn.cents, 0) - coalesce(spend.cents, 0)
      |    AS BIGINT) AS balance_cents
      |FROM nation
      |LEFT JOIN earn ON n_nationkey = earn.nk
      |LEFT JOIN spend ON n_nationkey = spend.nk
      |ORDER BY nation""".stripMargin
  ) { (s, dir) =>
    val earn = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nk"))
      // one IEEE multiply snapped to DECIMAL(24,6) per row (identical
      // cross-engine — the TpchOps revTerm recipe), exact decimal sum,
      // then a floor to cents: never a per-row 2dp rounding of a double
      .agg(floor(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(24,6)")) * 100)
        .cast("long").as("earn_cents"))
    val spend = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(sum(cents(col("o_totalprice"))).cast("long").as("spend_cents"))
    Tables.nation(s, dir)
      .join(earn, col("n_nationkey") === earn("nk"), "left")
      .drop(earn("nk"))
      .join(spend, col("n_nationkey") === spend("nk"), "left")
      .select(col("n_name").as("nation"),
        coalesce(col("earn_cents"), lit(0L)).as("earn_cents"),
        coalesce(col("spend_cents"), lit(0L)).as("spend_cents"),
        (coalesce(col("earn_cents"), lit(0L)) -
          coalesce(col("spend_cents"), lit(0L))).as("balance_cents"))
      .orderBy("nation")
  }

  /** Inter-order gap-day percentiles per market segment (nearest-rank
    * p50/p90/p99) — the purchase-cadence distribution q_order_gaps'
    * min/max/sum summary cannot show. Same histogram-percentile recipe
    * as q_doc_len_pctl: the cumulative window runs over the bounded GAP
    * DOMAIN per segment (≤ a few thousand distinct day-counts — the
    * dataset's date span, fixed at any SF), never order-grain rows. */
  val gapPctl: Q = Q.checked(
    "q_gap_pctl",
    """WITH gaps AS (
      |  SELECT c_mktsegment AS segment,
      |    date_diff('day',
      |      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS gap
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |h AS (SELECT segment, CAST(gap AS BIGINT) AS gap,
      |        CAST(count(*) AS BIGINT) AS c
      |      FROM gaps WHERE gap IS NOT NULL GROUP BY 1, 2),
      |w AS (
      |  SELECT segment, gap, c,
      |    sum(c) OVER (PARTITION BY segment ORDER BY gap
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(c) OVER (PARTITION BY segment) AS n
      |  FROM h)
      |SELECT segment, CAST(max(n) AS BIGINT) AS n_gaps,
      |  CAST(min(CASE WHEN 100 * cum >= 50 * n THEN gap END) AS BIGINT)
      |    AS p50,
      |  CAST(min(CASE WHEN 100 * cum >= 90 * n THEN gap END) AS BIGINT)
      |    AS p90,
      |  CAST(min(CASE WHEN 100 * cum >= 99 * n THEN gap END) AS BIGINT)
      |    AS p99
      |FROM w GROUP BY segment ORDER BY segment""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(w))).as("gap"))
      .where(col("gap").isNotNull)
    val h = gaps.groupBy(col("segment"), col("gap").cast("long").as("gap"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy("segment").orderBy("gap")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nW = Window.partitionBy("segment")
    h.withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(nW))
      .groupBy("segment")
      .agg(max("n").cast("long").as("n_gaps"),
        min(when(lit(100) * col("cum") >= lit(50) * col("n"), col("gap")))
          .cast("long").as("p50"),
        min(when(lit(100) * col("cum") >= lit(90) * col("n"), col("gap")))
          .cast("long").as("p90"),
        min(when(lit(100) * col("cum") >= lit(99) * col("n"), col("gap")))
          .cast("long").as("p99"))
      .orderBy("segment")
  }

  /** Embedding sign-bucket skew — the LSH hot-bucket audit: SimHash's
    * first 8 hyperplanes degenerate-specialized to coordinate planes
    * (bucket = Σ 2^i·[e_i > 0], deterministic across engines — no
    * seeded hashing), per bucket the population and exact micro-share.
    * A skewed table (one bucket holding ≫ 1/256 of the corpus) predicts
    * hot-bucket blowup in any sign-based LSH join; the fix (salting /
    * hot-list splitting, dedup/SemDedup.scala) starts from this report.
    * Aggregation is bucket-grain (≤256 rows); the share window rides
    * that bounded frame. */
  val embedSignBuckets: Q = Q.checked(
    "q_embed_sign_buckets",
    """WITH b AS (
      |  SELECT CAST(
      |      (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
      |    + 2 * (CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END)
      |    + 4 * (CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END)
      |    + 8 * (CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END)
      |    + 16 * (CASE WHEN embedding[5] > 0 THEN 1 ELSE 0 END)
      |    + 32 * (CASE WHEN embedding[6] > 0 THEN 1 ELSE 0 END)
      |    + 64 * (CASE WHEN embedding[7] > 0 THEN 1 ELSE 0 END)
      |    + 128 * (CASE WHEN embedding[8] > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS bucket
      |  FROM embeddings),
      |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n
      |      FROM b GROUP BY 1)
      |SELECT bucket, n,
      |  CAST(1000000 * n // sum(n) OVER () AS BIGINT) AS share_micro
      |FROM g ORDER BY bucket""".stripMargin
  ) { (s, dir) =>
    val bucket = (0 until 8).map { i =>
      when(element_at(col("embedding"), i + 1) > lit(0f), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val g = Tables.embeddings(s, dir)
      .select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    // the share window rides the ≤256-row bucket frame — bounded
    g.withColumn("total", sum("n").over(Window.partitionBy()))
      .select(col("bucket"), col("n"),
        expr("CAST(1000000 * n div total AS BIGINT)").as("share_micro"))
      .orderBy("bucket")
  }

  /** Exact-duplicate FAMILY-SIZE histogram — the dedup capacity audit
    * (how much of the corpus is k-way duplicated, and what a keep-one
    * pass reclaims): per family size k the family count, doc count,
    * surplus docs and surplus chars (keeping each family's smallest
    * copy). Same synthetic duplicate feed as q_dedup_exact (docs with
    * id % 10 == 0 re-ingested); where that query reports PER-FAMILY
    * rows, this is the aggregate-of-aggregates summary a curation
    * dashboard plots. Two hash aggregates (family grain, then k
    * grain) — never a window, never a join. */
  val dupFamilyHist: Q = Q.checked(
    "q_dup_family_hist",
    """WITH feed AS (
      |  SELECT doc_id, text, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, n_chars FROM documents
      |  WHERE doc_id % 10 = 0),
      |fam AS (
      |  SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(n_chars) AS BIGINT) AS chars,
      |    CAST(min(n_chars) AS BIGINT) AS keep_chars
      |  FROM feed GROUP BY 1)
      |SELECT k, CAST(count(*) AS BIGINT) AS n_families,
      |  CAST(sum(k) AS BIGINT) AS n_docs,
      |  CAST(sum(k - 1) AS BIGINT) AS surplus_docs,
      |  CAST(sum(chars - keep_chars) AS BIGINT) AS surplus_chars
      |FROM fam GROUP BY k ORDER BY k""".stripMargin
  ) { (s, dir) =>
    val d = Tables.documents(s, dir).select("doc_id", "text", "n_chars")
    val feed = d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
          col("n_chars")))
    feed.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("k"),
        sum("n_chars").cast("long").as("chars"),
        min("n_chars").cast("long").as("keep_chars"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_families"),
        sum("k").cast("long").as("n_docs"),
        sum(col("k") - 1).cast("long").as("surplus_docs"),
        sum(col("chars") - col("keep_chars")).cast("long")
          .as("surplus_chars"))
      .orderBy("k")
  }

  /** Per-dimension embedding moments — the dimension-health audit
    * (dead dimensions, scale outliers, saturation): per dim the count,
    * integer-snapped micro mean, min/max and zero count. Values snap
    * to micro units BEFORE aggregating (float→double widening and the
    * ×1e6 product are bit-identical cross-engine; the exact integer
    * sum makes the mean order-independent — a raw float sum would be
    * partitioning-dependent). posexplode keeps positions; the
    * aggregate is dim-grain (64 rows). */
  val embedDimStats: Q = Q.checked(
    "q_embed_dim_stats",
    """WITH d AS (
      |  SELECT t.i AS dim,
      |    CAST(round(CAST(embedding[CAST(t.i + 1 AS INT)] AS DOUBLE)
      |      * 1000000) AS BIGINT) AS xm
      |  FROM embeddings CROSS JOIN range(64) AS t(i)),
      |s AS (
      |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(xm) AS BIGINT) AS sum_micro,
      |    CAST(min(xm) AS BIGINT) AS min_micro,
      |    CAST(max(xm) AS BIGINT) AS max_micro,
      |    CAST(sum(CASE WHEN xm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_zero
      |  FROM d GROUP BY dim)
      |SELECT CAST(dim AS BIGINT) AS dim, n,
      |  CAST(sum_micro // n AS BIGINT) AS mean_micro,
      |  min_micro, max_micro, n_zero
      |FROM s ORDER BY dim""".stripMargin
  ) { (s, dir) =>
    Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        round(col("x").cast("double") * 1000000).cast("long").as("xm"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum("xm").cast("long").as("sum_micro"),
        min("xm").as("min_micro"),
        max("xm").as("max_micro"),
        sum(when(col("xm") === 0L, 1L).otherwise(0L)).as("n_zero"))
      .select(col("dim"), col("n"),
        expr("CAST(sum_micro div n AS BIGINT)").as("mean_micro"),
        col("min_micro"), col("max_micro"), col("n_zero"))
      .orderBy("dim")
  }

  /** Fulfillment-latency percentiles per order priority (order date →
    * FIRST ship date, nearest-rank p50/p90/p99) — the SLA audit. Same
    * bounded-domain histogram recipe as q_gap_pctl: the cumulative
    * window rides the day-count domain per priority, never order rows.
    * (The synthetic generator ships lines before their order date, so
    * negative latencies appear — the statistic is still exact.) */
  val shipLatency: Q = Q.checked(
    "q_ship_latency",
    """WITH lat AS (
      |  SELECT o_orderpriority AS priority,
      |    date_diff('day', CAST(o_orderdate AS DATE),
      |      CAST(mn AS DATE)) AS days
      |  FROM orders JOIN (SELECT l_orderkey, min(l_shipdate) AS mn
      |                    FROM lineitem GROUP BY 1) f
      |    ON o_orderkey = l_orderkey),
      |h AS (SELECT priority, CAST(days AS BIGINT) AS days,
      |        CAST(count(*) AS BIGINT) AS c
      |      FROM lat GROUP BY 1, 2),
      |w AS (
      |  SELECT priority, days, c,
      |    sum(c) OVER (PARTITION BY priority ORDER BY days
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(c) OVER (PARTITION BY priority) AS n
      |  FROM h)
      |SELECT priority, CAST(max(n) AS BIGINT) AS n_orders,
      |  CAST(min(CASE WHEN 100 * cum >= 50 * n THEN days END) AS BIGINT)
      |    AS p50,
      |  CAST(min(CASE WHEN 100 * cum >= 90 * n THEN days END) AS BIGINT)
      |    AS p90,
      |  CAST(min(CASE WHEN 100 * cum >= 99 * n THEN days END) AS BIGINT)
      |    AS p99
      |FROM w GROUP BY priority ORDER BY priority""".stripMargin
  ) { (s, dir) =>
    val firstShip = Tables.lineitem(s, dir)
      .groupBy("l_orderkey").agg(min("l_shipdate").as("mn"))
    val h = Tables.orders(s, dir)
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(to_date(col("mn")), to_date(col("o_orderdate")))
          .cast("long").as("days"))
      .groupBy("priority", "days").agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy("priority").orderBy("days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(Window.partitionBy("priority")))
      .groupBy("priority")
      .agg(max("n").cast("long").as("n_orders"),
        min(when(lit(100) * col("cum") >= lit(50) * col("n"), col("days")))
          .cast("long").as("p50"),
        min(when(lit(100) * col("cum") >= lit(90) * col("n"), col("days")))
          .cast("long").as("p90"),
        min(when(lit(100) * col("cum") >= lit(99) * col("n"), col("days")))
          .cast("long").as("p99"))
      .orderBy("priority")
  }

  /** Revenue response by discount band (whole percent points, the
    * bounded 0–10 domain): line count, quantity, gross vs net cents —
    * the price-elasticity table. One scan-side hash aggregate; the net
    * term uses the DECIMAL(24,6)-snap + exact-sum + floor recipe
    * (q_nation_balance's lesson). */
  val discountLift: Q = Q.checked(
    "q_discount_lift",
    """SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |    AS DECIMAL(18,0)) AS BIGINT)) AS BIGINT) AS gross_cents,
      |  CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(24,6))) * 100) AS BIGINT) AS net_cents
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(round(col("l_discount") * 100).cast("long").as("disc_pct"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("qty"),
        sum(cents(col("l_extendedprice"))).cast("long").as("gross_cents"),
        floor(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(24,6)")) * 100)
          .cast("long").as("net_cents"))
      .orderBy("disc_pct")
  }

  /** Repeat-purchase CDF per market segment: buyers and the exact
    * milli-shares with ≥2 / ≥5 / ≥10 lifetime orders — the loyalty
    * screen. Customer-grain count, then one segment-grain aggregate. */
  val repeatRate: Q = Q.checked(
    "q_repeat_rate",
    """WITH oc AS (
      |  SELECT c_mktsegment AS segment, o_custkey,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT segment, CAST(count(*) AS BIGINT) AS n_buyers,
      |  CAST(1000 * sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) // count(*)
      |    AS BIGINT) AS rep2_milli,
      |  CAST(1000 * sum(CASE WHEN n >= 5 THEN 1 ELSE 0 END) // count(*)
      |    AS BIGINT) AS rep5_milli,
      |  CAST(1000 * sum(CASE WHEN n >= 10 THEN 1 ELSE 0 END) // count(*)
      |    AS BIGINT) AS rep10_milli
      |FROM oc GROUP BY segment ORDER BY segment""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg(count(lit(1)).as("n"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_buyers"),
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("r2"),
        sum(when(col("n") >= 5, 1L).otherwise(0L)).as("r5"),
        sum(when(col("n") >= 10, 1L).otherwise(0L)).as("r10"))
      .select(col("segment"), col("n_buyers"),
        expr("CAST(1000 * r2 div n_buyers AS BIGINT)").as("rep2_milli"),
        expr("CAST(1000 * r5 div n_buyers AS BIGINT)").as("rep5_milli"),
        expr("CAST(1000 * r10 div n_buyers AS BIGINT)").as("rep10_milli"))
      .orderBy("segment")
  }

  /** Whale concentration per year: revenue share of each year's top-20
    * customers in exact milli units. The oracle states the per-year
    * rank window; the ENGINE computes the same top-20 with the
    * k-bounded [[graft.functions.TopKAgg]] (identical total order:
    * cents DESC, custkey ASC — cents ≤ ~1e9 per customer-year are
    * exact doubles) so the shuffle carries 20 rows per year per map
    * partition, never a per-year sort of the whole customer frame —
    * the fat-partition window this query must NOT plan at 100 TB. */
  val topCustomerShare: Q = Q.checked(
    "q_top_customer_share",
    """WITH cy AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_custkey,
      |    CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS DECIMAL(18,0)) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2),
      |r AS (SELECT yr, cents,
      |        row_number() OVER (PARTITION BY yr
      |          ORDER BY cents DESC, o_custkey) AS rk
      |      FROM cy)
      |SELECT yr, CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(sum(CASE WHEN rk <= 20 THEN cents ELSE 0 END) AS BIGINT)
      |    AS top20_cents,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST(1000 * sum(CASE WHEN rk <= 20 THEN cents ELSE 0 END)
      |    // sum(cents) AS BIGINT) AS top20_milli
      |FROM r GROUP BY yr ORDER BY yr""".stripMargin
  ) { (s, dir) =>
    val top20 = udaf(new graft.functions.TopKAgg(20))
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).cast("long").as("cents"))
      .groupBy("yr")
      .agg(count(lit(1)).as("n_cust"),
        top20(col("cents").cast("double"), col("o_custkey")).as("top"),
        sum("cents").cast("long").as("total_cents"))
      .select(col("yr"), col("n_cust"),
        expr("CAST(aggregate(top, 0L, (acc, t) -> " +
          "acc + CAST(t._1 AS BIGINT)) AS BIGINT)").as("top20_cents"),
        col("total_cents"))
      .select(col("yr"), col("n_cust"), col("top20_cents"),
        col("total_cents"),
        expr("CAST(1000 * top20_cents div total_cents AS BIGINT)")
          .as("top20_milli"))
      .orderBy("yr")
  }

  /** Language × source contingency with both row-share views (share of
    * the language coming from each source, share of the source in each
    * language) in exact milli units — the corpus-mix table a curation
    * rebalance starts from. The share windows ride the lang×source
    * GRAIN frame (≤ |langs|·|sources| rows), never documents. */
  val langSourceMix: Q = Q.checked(
    "q_lang_source_mix",
    """WITH g AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2)
      |SELECT lang, source, n,
      |  CAST(1000 * n // sum(n) OVER (PARTITION BY lang) AS BIGINT)
      |    AS lang_share_milli,
      |  CAST(1000 * n // sum(n) OVER (PARTITION BY source) AS BIGINT)
      |    AS source_share_milli
      |FROM g ORDER BY lang, source""".stripMargin
  ) { (s, dir) =>
    val g = Tables.documents(s, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    g.withColumn("ln", sum("n").over(Window.partitionBy("lang")))
      .withColumn("sn", sum("n").over(Window.partitionBy("source")))
      .select(col("lang"), col("source"), col("n"),
        expr("CAST(1000 * n div ln AS BIGINT)").as("lang_share_milli"),
        expr("CAST(1000 * n div sn AS BIGINT)").as("source_share_milli"))
      .orderBy("lang", "source")
  }

  /** Basket-size mix per year: order count and exact milli-share per
    * lines-per-order band — the order-shape trend. The share window
    * rides the (year × band) grain frame (bands ≤ max lines/order, a
    * generator constant), never orders. */
  val basketSizeMix: Q = Q.checked(
    "q_basket_size_mix",
    """WITH sz AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
      |  FROM lineitem GROUP BY 1),
      |oy AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, n_lines
      |  FROM orders JOIN sz ON o_orderkey = l_orderkey)
      |SELECT yr, n_lines, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(1000 * count(*) // sum(count(*)) OVER (PARTITION BY yr)
      |    AS BIGINT) AS share_milli
      |FROM oy GROUP BY yr, n_lines ORDER BY yr, n_lines""".stripMargin
  ) { (s, dir) =>
    val sz = Tables.lineitem(s, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("n_lines"))
    val g = Tables.orders(s, dir)
      .join(sz, col("o_orderkey") === col("l_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        col("n_lines"))
      .agg(count(lit(1)).as("n_orders"))
    g.withColumn("yt", sum("n_orders").over(Window.partitionBy("yr")))
      .select(col("yr"), col("n_lines"), col("n_orders"),
        expr("CAST(1000 * n_orders div yt AS BIGINT)").as("share_milli"))
      .orderBy("yr", "n_lines")
  }

  /** Supplier-concentration risk: per part the top supplier's revenue
    * share, banded to tenths, then the band histogram — which slice of
    * the catalog is one supplier failure away from an outage. Three
    * hash aggregates (part×supplier → part → band), no window, no
    * top-k machinery (max == top-1). */
  val supplierDependency: Q = Q.checked(
    "q_supplier_dependency",
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * 100 AS DECIMAL(18,0)) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (
      |  SELECT l_partkey, max(cents) AS top_cents,
      |    sum(cents) AS tot_cents, CAST(count(*) AS BIGINT) AS n_supp
      |  FROM ps GROUP BY 1),
      |b AS (
      |  SELECT CAST(10 * top_cents // tot_cents AS BIGINT) AS band,
      |    n_supp
      |  FROM p)
      |SELECT band, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(n_supp) AS BIGINT) AS total_suppliers
      |FROM b GROUP BY band ORDER BY band""".stripMargin
  ) { (s, dir) =>
    // fanned by the grouping PREFIX: the (pk, sk) partial aggregate
    // barely collapses lineitem (pairs are near-unique), so the
    // single-task scan stage otherwise does ALL the per-row cents
    // arithmetic on one core while the exchange ships partials the same
    // size as the raw rows. Hash-partitioning by l_partkey satisfies the
    // (pk, sk) aggregate's ClusteredDistribution (subset clustering), so
    // the fan REPLACES the aggregate's exchange rather than adding one —
    // net exchange count unchanged, map work 32-way. Identity at scale.
    Tables.fanned(s, dir, "lineitem", "l_partkey")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(cents(col("l_extendedprice"))).cast("long").as("cents"))
      .groupBy("l_partkey")
      .agg(max("cents").as("top_cents"), sum("cents").as("tot_cents"),
        count(lit(1)).as("n_supp"))
      .select(expr("CAST(10 * top_cents div tot_cents AS BIGINT)")
        .as("band"), col("n_supp"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_parts"),
        sum("n_supp").cast("long").as("total_suppliers"))
      .orderBy("band")
  }

  /** Brand share shift: each brand's revenue micro-share per ship year
    * and the year-over-year shift — the competitive-drift table. Both
    * windows ride BOUNDED frames: the share over the ≤|brands| rows of
    * one year, the lag over one brand's ≤|years| rows. First-year
    * shift coalesces to 0 (no prior year). */
  val brandShareShift: Q = Q.checked(
    "q_brand_share_shift",
    """WITH by_ AS (
      |  SELECT p_brand AS brand, CAST(year(l_shipdate) AS BIGINT) AS yr,
      |    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * 100 AS DECIMAL(18,0)) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
      |sh AS (
      |  SELECT brand, yr, cents,
      |    CAST(1000000 * cents // sum(cents) OVER (PARTITION BY yr)
      |      AS BIGINT) AS share_micro
      |  FROM by_)
      |SELECT brand, yr, cents, share_micro,
      |  CAST(coalesce(share_micro - lag(share_micro)
      |    OVER (PARTITION BY brand ORDER BY yr), 0) AS BIGINT)
      |    AS shift_micro
      |FROM sh ORDER BY brand, yr""".stripMargin
  ) { (s, dir) =>
    val by = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(cents(col("l_extendedprice"))).cast("long").as("cents"))
    val sh = by
      .withColumn("yt", sum("cents").over(Window.partitionBy("yr")))
      .select(col("brand"), col("yr"), col("cents"),
        expr("CAST(1000000 * cents div yt AS BIGINT)").as("share_micro"))
    sh.withColumn("shift_micro",
        coalesce(col("share_micro") -
          lag("share_micro", 1).over(
            Window.partitionBy("brand").orderBy("yr")), lit(0L))
          .cast("long"))
      .orderBy("brand", "yr")
  }

  /** Character-class mix per language (alpha/digit/whitespace/other
    * milli-shares of all characters) — the OCR-noise / template-spam
    * screen q_text_quality's token ratios cannot see. Class counts by
    * subtraction (chars − chars-with-class-removed): one scan-side
    * aggregate, regexes are the codegen'd built-in. */
  val charClassMix: Q = Q.checked(
    "q_char_class_mix",
    """WITH c AS (
      |  SELECT lang,
      |    CAST(sum(length(text)) AS BIGINT) AS chars,
      |    CAST(sum(length(text) - length(regexp_replace(text,
      |      '[a-zA-Z]', '', 'g'))) AS BIGINT) AS alpha,
      |    CAST(sum(length(text) - length(regexp_replace(text,
      |      '[0-9]', '', 'g'))) AS BIGINT) AS digit,
      |    CAST(sum(length(text) - length(replace(text, ' ', '')))
      |      AS BIGINT) AS space
      |  FROM documents GROUP BY lang)
      |SELECT lang, chars,
      |  CAST(1000 * alpha // chars AS BIGINT) AS alpha_milli,
      |  CAST(1000 * digit // chars AS BIGINT) AS digit_milli,
      |  CAST(1000 * space // chars AS BIGINT) AS space_milli,
      |  CAST(1000 * (chars - alpha - digit - space) // chars AS BIGINT)
      |    AS other_milli
      |FROM c ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val t = col("text")
    Tables.documents(s, dir)
      .groupBy("lang")
      .agg(sum(length(t)).cast("long").as("chars"),
        sum(length(t) - length(regexp_replace(t, "[a-zA-Z]", "")))
          .cast("long").as("alpha"),
        sum(length(t) - length(regexp_replace(t, "[0-9]", "")))
          .cast("long").as("digit"),
        sum(length(t) - length(regexp_replace(t, " ", "")))
          .cast("long").as("space"))
      .select(col("lang"), col("chars"),
        expr("CAST(1000 * alpha div chars AS BIGINT)").as("alpha_milli"),
        expr("CAST(1000 * digit div chars AS BIGINT)").as("digit_milli"),
        expr("CAST(1000 * space div chars AS BIGINT)").as("space_milli"),
        expr("CAST(1000 * (chars - alpha - digit - space) div chars " +
          "AS BIGINT)").as("other_milli"))
      .orderBy("lang")
  }

  /** Return rate per brand — the product-quality ranking
    * (q_return_rate's monthly trend sliced the other way): returned
    * lines, exact milli-rate and returned cents per brand. One
    * fact-side aggregate after the part dimension join (AQE
    * broadcasts the dimension). */
  val returnsByBrand: Q = Q.checked(
    "q_returns_by_brand",
    """SELECT p_brand AS brand,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
      |    AS n_returned,
      |  CAST(1000 * count(*) FILTER (WHERE l_returnflag = 'R')
      |    // count(*) AS BIGINT) AS ret_milli,
      |  CAST(coalesce(sum(CAST(CAST(CAST(l_extendedprice
      |      AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS BIGINT))
      |    FILTER (WHERE l_returnflag = 'R'), 0) AS BIGINT) AS ret_cents
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        (col("l_returnflag") === "R").cast("long").as("r"),
        cents(col("l_extendedprice")).as("c"))
      .groupBy("brand")
      .agg(count(lit(1)).as("n_lines"), sum("r").as("n_returned"),
        coalesce(sum(when(col("r") === 1L, col("c"))), lit(0L))
          .as("ret_cents"))
      .select(col("brand"), col("n_lines"), col("n_returned"),
        expr("CAST(1000 * n_returned div n_lines AS BIGINT)")
          .as("ret_milli"),
        col("ret_cents"))
      .orderBy("brand")
  }

  /** Effective tax burden per SUPPLIER nation (round 12): discounted
    * revenue, tax collected (cents), and the revenue-weighted effective
    * tax rate as a milli integer — the fiscal-exposure view on the only
    * money column the engine had not yet queried (`l_tax`). Money
    * follows the TpchOps determinism recipe: each per-row product is a
    * single left-to-right IEEE double chain snapped ONCE to
    * decimal(24,6), summed fold-order-free as decimals; the rate clears
    * denominators into exact micro-unit BIGINTs (no float division).
    * Scale: supplier and nation broadcast; ONE lineitem-grain shuffle
    * onto ≤ |nations| groups with map-side partials. */
  val taxBurden: Q = Q.checked(
    "q_tax_burden",
    """WITH terms AS (
      |  SELECT n_name,
      |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) AS rev,
      |    CAST(l_extendedprice * (1 - l_discount) * l_tax
      |      AS DECIMAL(24,6)) AS tax_amt
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey)
      |SELECT n_name, count(*) AS n_lines,
      |  CAST(floor(sum(rev) * 100) AS BIGINT) AS revenue_cents,
      |  CAST(floor(sum(tax_amt) * 100) AS BIGINT) AS tax_cents,
      |  CAST(sum(CAST(tax_amt * 1000000 AS BIGINT)) * 1000 //
      |    sum(CAST(rev * 1000000 AS BIGINT)) AS BIGINT) AS tax_rate_milli
      |FROM terms GROUP BY n_name ORDER BY n_name""".stripMargin
  ) { (s, dir) =>
    val d246 = "decimal(24,6)"
    // NOT fanned (measured r16): the ≤|nations| partial aggregate
    // collapses the scan stage's output to ~25 rows, so a fan would ADD
    // a raw-row exchange that no downstream operator reuses (group key
    // n_name ≠ any row-identity fan key) — measured 0.42 s unfanned vs
    // 1.23 s fanned at sf0.1 c8 (0.54 vs 0.79 at c32): the basket_pairs
    // rule, partials smaller than raw rows
    val terms = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(d246).as("rev"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) *
          col("l_tax")).cast(d246).as("tax_amt"))
    // micro units snap PER ROW (decimal(24,6) × 1e6 is an exact
    // integral decimal(32,6) — no precision loss) so the rate divides
    // exact BIGINTs; a sum-then-scale would cross Spark's 38-digit
    // precision cap and silently reduce scale
    terms.groupBy("n_name")
      .agg(count(lit(1)).as("n_lines"),
        floor(sum(col("rev")) * 100).cast("long").as("revenue_cents"),
        floor(sum(col("tax_amt")) * 100).cast("long").as("tax_cents"),
        sum((col("tax_amt") * 1000000).cast("long")).as("__tax_u"),
        sum((col("rev") * 1000000).cast("long")).as("__rev_u"))
      .select(col("n_name"), col("n_lines"), col("revenue_cents"),
        col("tax_cents"),
        expr("__tax_u * 1000 div __rev_u").as("tax_rate_milli"))
      .orderBy("n_name")
  }

  val all: Seq[Q] =
    Seq(reactivation, backlog, returnRate, nationBalance, gapPctl,
      embedSignBuckets, dupFamilyHist, embedDimStats,
      shipLatency, discountLift, repeatRate, topCustomerShare,
      langSourceMix, basketSizeMix, supplierDependency, brandShareShift,
      charClassMix, returnsByBrand, taxBurden)
}
