package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampType}

/** TPC-H completion suite: the benchmark's remaining query SHAPES adapted
  * to this star schema (Q1/Q3/Q5 already live as q_agg_group /
  * q_ship_priority / q_local_supplier). Q2/Q11/Q16/Q20 need the partsupp
  * table, which the driver testdata does not ship — their distinctive
  * plan shapes (correlated min over a dim, group-sum vs global-sum
  * fraction, NOT-IN over a dim, nested IN with quantity threshold) are
  * covered by q_top_supplier, q_market_share, q_not_in_nulls and
  * q_small_qty_revenue respectively, so no optimizer surface is lost.
  *
  * Why these matter beyond checkbox coverage: each exercises a DIFFERENT
  * Catalyst decision under one roof — decorrelation (Q4, Q22), pure
  * scan-agg throughput (Q6, Q14), multi-dim broadcast trees (Q7, Q8, Q9),
  * double aggregation (Q13), agg-vs-agg self comparison (Q15, Q17),
  * having-on-group filter feeding a second join (Q18), OR-of-ANDs
  * residual pushdown (Q19), and window-vs-exists last-event semantics
  * (Q21). They are the queries a reference user migrating a warehouse
  * workload runs on day one.
  *
  * Determinism: every money sum follows SURVEY §7.5 rule 2 — per-row
  * products are single correctly-rounded IEEE doubles (identical
  * cross-engine), snapped to DECIMAL(24,6) before the fold-order-free
  * decimal sum, cast to DOUBLE only in the output projection. Averages
  * are never compared as floats: Q17's `l_quantity < 0.2 * avg(...)` is
  * cleared of denominators into exact integer/decimal arithmetic
  * (`5 * qty * n < sum`), and Q22's positive-balance mean likewise
  * (`bal * n_pos > sum_pos` in DECIMAL(18,2)) — so row MEMBERSHIP can
  * never flip on a float rounding edge between engines.
  */
object TpchOps {

  private val D246 = DecimalType(24, 6)

  private def ts(v: String) = lit(v).cast(TimestampType)

  /** revenue term: extendedprice * (1 - discount), decimal-snapped */
  private def revTerm =
    (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(D246)

  private val revSql =
    "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))"

  /** TPC-H Q4 (order-priority checking, adapted: "late shipment" =
    * any lineitem shipped > 60 days after the order date, standing in
    * for the missing commit/receipt dates): count of 1996 orders per
    * priority having at least one late line. The EXISTS decorrelates to
    * a LEFT SEMI join on o_orderkey — orders-side date filter pushes to
    * the scan, the semi join is the only shuffle, and the 5-row agg is
    * map-side partial. Semi-join semantics make multi-late-line orders
    * count once, exactly like the SQL EXISTS. */
  val latePriority: Q = Q.checked(
    "q_late_priority",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  ) { (s, dir) =>
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00")
        && col("o_orderdate") < ts("1997-01-01 00:00:00"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    ord.join(li, col("l_orderkey") === col("o_orderkey")
        && col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6 (forecasting revenue change): one filtered scan, one
    * 1-row aggregate — the pure scan-throughput query. All three
    * predicates push to the parquet reader (shipdate range + discount
    * band + quantity cap are all plain column comparisons); at 100 TB
    * this is the query where row-group min/max skipping on a
    * shipdate-clustered layout does all the work. Discount bounds are
    * exact parquet doubles compared identically in both engines — no
    * arithmetic happens before the comparison. */
  val forecastRevenue: Q = Q.checked(
    "q_forecast_revenue",
    """SELECT
      |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(24,6)))
      |    AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00")
        && col("l_shipdate") < ts("1997-01-01 00:00:00")
        && col("l_discount") >= 0.03 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice") * col("l_discount")).cast(D246))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q7 (volume shipping): revenue flowing between two nations in
    * either direction, by supplier nation / customer nation / ship year.
    * Both nation sides resolve through BROADCAST dims (supplier and
    * customer each annotate with their nation name map-side); the only
    * real shuffle is lineitem⋈orders, and the nation-pair predicate is
    * applied as soon as both names exist — before the aggregate, never
    * as a cartesian. */
  val volumeShipping: Q = Q.checked(
    "q_volume_shipping",
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum($revSql) AS DOUBLE) AS revenue
      |FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
  ) { (s, dir) =>
    val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, dir)
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin("NATION_1", "NATION_2"))
    val cust = Tables.customer(s, dir)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin("NATION_1", "NATION_2"))
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1995-01-01 00:00:00")
        && col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .select("l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1"
          && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2"
          && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(sum(revTerm).cast(DoubleType).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 (national market share): NATION_3's share of PROMO-part
    * revenue delivered into ASIA customers, per order year. The share is
    * a ratio of two decimal-exact sums — both sides fold to exact
    * decimals, so the single terminal IEEE division is identical
    * cross-engine with no rounding needed. Five dims (part, supplier,
    * customer→nation→region) are hint-free: the SF-scaled dims broadcast
    * under stats/AQE sizing at small SF and shuffle-partition at large SF
    * (a forced hint would pin billions of rows to the driver);
    * lineitem⋈orders is again the one unavoidable shuffle. */
  val marketShare: Q = Q.checked(
    "q_market_share",
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN $revSql
      |    ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
      |    / CAST(sum($revSql) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |  JOIN region ON r_regionkey = n2.n_regionkey
      |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin
  ) { (s, dir) =>
    val promoParts = Tables.part(s, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val supNation = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val asiaCust = Tables.customer(s, dir)
      .join(Tables.nation(s, dir).join(
          Tables.region(s, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1995-01-01 00:00:00")
        && col("o_orderdate") < ts("1997-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", revTerm)
          .otherwise(lit(0).cast(D246))).cast(DoubleType)
        / sum(revTerm).cast(DoubleType)).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 (product-type profit, adapted: p_retailprice * quantity
    * stands in for the missing partsupp supplycost): profit on parts
    * named like "%bolt%" by supplier nation and order year. The profit
    * term is a DIFFERENCE of two decimal-snapped products — each product
    * is one IEEE multiply (identical cross-engine), the subtraction and
    * sum are exact decimal. LIKE-filtered part and supplier→nation join
    * the fact scan hint-free — stats/AQE broadcast them while they fit,
    * shuffle them when (at large SF) they don't. */
  val productProfit: Q = Q.checked(
    "q_product_profit",
    """SELECT n_name AS nation,
      |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
      |    - CAST(p_retailprice * l_quantity AS DECIMAL(24,6)))
      |    AS DOUBLE) AS sum_profit
      |FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin
  ) { (s, dir) =>
    val boltParts = Tables.part(s, dir)
      .filter(col("p_name").like("%bolt%"))
      .select("p_partkey", "p_retailprice")
    val supNation = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(boltParts, col("l_partkey") === col("p_partkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(sum(revTerm - (col("p_retailprice") * col("l_quantity"))
          .cast(D246)).cast(DoubleType).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q10 (returned-item reporting): top 20 customers by revenue
    * lost to returns in one quarter. Nation (bounded) is hinted;
    * customer+nation joins hint-free (SF-scaled — AQE sizes it); the
    * orderdate filter cuts orders to a quarter BEFORE the lineitem join;
    * top-20 plans as TakeOrderedAndProject, never a global sort. */
  val returnedItems: Q = Q.checked(
    "q_returned_items",
    s"""SELECT c_custkey, c_name,
      |  CAST(sum($revSql) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer
      |  JOIN orders ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN nation ON n_nationkey = c_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  ) { (s, dir) =>
    val custNation = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "c_acctbal", "n_name")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00")
        && col("o_orderdate") < ts("1996-04-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(revTerm).cast(DoubleType).as("revenue"))
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13 (customer order-count distribution): how many customers
    * placed exactly k qualifying orders, for every k — the
    * double-aggregation query. First agg: orders per customer via LEFT
    * join (so never-ordered customers land in the k=0 bucket — count of
    * a NULL-keyed column, not count(*)); second agg: customers per k.
    * The second agg's input is at most |customer| rows and the k-grain
    * output is tiny; the LEFT join is the one shuffle. */
  val custDistribution: Q = Q.checked(
    "q_cust_distribution",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey,
      |        CAST(count(o_orderkey) AS BIGINT) AS c_count
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |        AND o_orderpriority <> '5-LOW'
      |      GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir).select("c_custkey")
      .join(Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 (promotion effect): share of one month's revenue that
    * came from PROMO-type parts, as a percentage. Both numerator and
    * denominator fold to exact decimals over the SAME month-filtered
    * join (one pass — the CASE puts the branch inside the aggregate,
    * never a second scan); 100 * exact / exact is two IEEE ops,
    * identical cross-engine. Part joins hint-free (SF-scaled). */
  val promoShare: Q = Q.checked(
    "q_promo_share",
    s"""SELECT
      |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revSql
      |    ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
      |    / CAST(sum($revSql) AS DOUBLE) AS promo_revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-03-01 00:00:00")
        && col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(Tables.part(s, dir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", revTerm)
            .otherwise(lit(0).cast(D246))).cast(DoubleType)
          / sum(revTerm).cast(DoubleType)).as("promo_revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q15 (top supplier): supplier(s) whose quarterly revenue
    * equals the maximum. The comparison stays in EXACT decimal — the
    * per-supplier sums and their max are decimal-folded, equality is
    * exact, and only the published revenue column is cast to double —
    * so "ties with the max by one ulp" cannot differ between engines.
    * The revenue view is supplier-grain (bounded by |supplier|), its max
    * is a 1-row broadcast; the supplier name join is hint-free (the dim
    * is SF-scaled — stats/AQE broadcast it while it fits). */
  val topSupplier: Q = Q.checked(
    "q_top_supplier",
    s"""WITH rev AS (
      |  SELECT l_suppkey, sum($revSql) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON s_suppkey = l_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin
  ) { (s, dir) =>
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00")
        && col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .groupBy("l_suppkey")
      .agg(sum(revTerm).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    rev.join(broadcast(mx), col("total_rev") === col("mx"))
      .join(Tables.supplier(s, dir)
          .select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast(DoubleType).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17 (small-quantity-order revenue): revenue from Brand#23
    * lineitems whose quantity is below 20% of that part's average
    * quantity. The float trap is the threshold: `qty < 0.2 * avg(qty)`
    * compared in IEEE rounding terms would let row membership flip on a
    * rounding edge between engines, so the inequality is cleared of
    * denominators into `5 * qty * n < sum(qty)` — and because the
    * generator's quantities are INTEGRAL doubles, every term (product ≤
    * 2.5e8, sum ≤ 3e7 at sf0.1 — far under 2^53) is an exactly
    * representable integer-valued double: the arithmetic is exact and
    * fold-order-free without any decimal cast, in both engines. Per-part
    * stats are computed over the brand-filtered join output (bounded by
    * that brand's parts) and joined back hint-free (AQE broadcasts the
    * part-grain frame while it fits) — two passes over a slice,
    * zero window. */
  val smallQtyRevenue: Q = Q.checked(
    "q_small_qty_revenue",
    """WITH brand_li AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_brand = 'Brand#23'),
      |per_part AS (
      |  SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n,
      |    sum(l_quantity) AS sum_qty
      |  FROM brand_li GROUP BY l_partkey)
      |SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / 7.0
      |    AS avg_yearly,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM brand_li JOIN per_part ON pk = l_partkey
      |WHERE l_quantity * 5 * n < sum_qty"""
      .stripMargin
  ) { (s, dir) =>
    val brandLi = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#23").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
    val perPart = brandLi.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    brandLi.join(perPart, col("pk") === col("l_partkey"))
      .filter(col("l_quantity") * lit(5) * col("n") < col("sum_qty"))
      .agg(
        (sum(col("l_extendedprice").cast(D246)).cast(DoubleType) / 7.0)
          .as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * exceeds 300, with their customer, top 100 by order value. The
    * HAVING-on-group filter runs at order grain BEFORE any dim join —
    * the agg output (a handful of qualifying orders) then joins orders
    * and customer hint-free. Quantity sums are integral doubles well
    * under 2^53 (see q_small_qty_revenue) — exact and fold-order-free,
    * so the >300 membership test cannot float-flip. */
  val largeOrders: Q = Q.checked(
    "q_large_orders",
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  sum_qty AS total_qty
      |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(l_quantity) > 300) big
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin
  ) { (s, dir) =>
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    big.join(Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir)
          .select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("sum_qty").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 (discounted revenue, disjunctive predicates): revenue
    * from three brand/size/quantity bands OR-ed together. The plan
    * point: all three branches share the p_partkey equi-join, so
    * Catalyst plans ONE hash join (broadcast under AQE sizing at small
    * SF) with the OR-of-ANDs as a residual filter — never a union of
    * three scans, never a nested loop. */
  val disjunctiveRev: Q = Q.checked(
    "q_disjunctive_rev",
    s"""SELECT CAST(sum($revSql) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |    AND l_quantity >= 1 AND l_quantity <= 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity >= 10 AND l_quantity <= 20)
      |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin
  ) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
          && col("l_quantity") >= 1 && col("l_quantity") <= 11)
        || (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
          && col("l_quantity") >= 10 && col("l_quantity") <= 20)
        || (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)
          && col("l_quantity") >= 20 && col("l_quantity") <= 30))
      .agg(sum(revTerm).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q21 (suppliers who kept orders waiting, adapted to the
    * shipped columns): for finished ('F') multi-supplier orders, count
    * per supplier the orders where THEIR latest line was the order's
    * last shipment — the supplier everyone else waited on. Formulated
    * scale-first: collapse to (order, supplier) max-shipdate grain, then
    * the order max + supplier count ride a WINDOW over the ok partition
    * (bounded: suppliers per order is a generator constant, ~4 — never a
    * hot-key frame) instead of the r14 order-grain aggregate joined back,
    * which evaluated the (ok, sk) collapse twice and paid a join
    * exchange for a value the partition already holds. The DuckDB oracle
    * states the same thing with per-order aggregates — no correlated
    * EXISTS chain needed on either side. Ties: two suppliers sharing the
    * last shipdate both "kept the order waiting" (matches Q21's
    * strict-> NOT EXISTS). */
  val waitingSupplier: Q = Q.checked(
    "q_waiting_supplier",
    """WITH os AS (
      |  SELECT l_orderkey AS ok, l_suppkey AS sk, max(l_shipdate) AS m
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY l_orderkey, l_suppkey),
      |o AS (
      |  SELECT ok AS ok2, max(m) AS big_m,
      |    CAST(count(*) AS BIGINT) AS n_supp
      |  FROM os GROUP BY ok)
      |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM os JOIN o ON ok2 = ok
      |  JOIN supplier ON s_suppkey = sk
      |WHERE n_supp >= 2 AND m = big_m
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""
      .stripMargin
  ) { (s, dir) =>
    val fOrders = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val wOk = org.apache.spark.sql.expressions.Window.partitionBy("ok")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(max(col("l_shipdate")).as("m"))
      .withColumn("big_m", max(col("m")).over(wOk))
      .withColumn("n_supp", count(lit(1)).over(wOk))
      .filter(col("n_supp") >= 2 && col("m") === col("big_m"))
      .join(Tables.supplier(s, dir)
          .select("s_suppkey", "s_name"),
        col("sk") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q22 (global sales opportunity, adapted: market segment stands
    * in for the phone country code, and "idle" means no orders SINCE
    * 1999 — in this dataset every above-average customer has ordered at
    * least once, so the literal never-ordered reading would return an
    * evidence-free empty set): per segment, the idle rich — customers
    * with above-average positive balances and no recent orders. The mean
    * test is cleared of denominators (`bal * n_pos > sum_pos` in
    * DECIMAL(18,2) — exact, so membership can't float-flip); the
    * positive-balance stats are ONE 1-row broadcast; no-recent-orders is
    * a LEFT ANTI join against the date-filtered orders (the decorrelated
    * NOT EXISTS, with the date predicate pushed below the anti join). */
  val idleCustomers: Q = Q.checked(
    "q_idle_customers",
    """WITH pos AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pos,
      |    sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    AS totacctbal
      |FROM customer, pos
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_pos
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    val d182 = DecimalType(18, 2)
    val pos = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("n_pos"),
        sum(col("c_acctbal").cast(d182)).as("sum_pos"))
    Tables.customer(s, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .crossJoin(broadcast(pos))
      .filter(col("c_acctbal").cast(d182) * col("n_pos") > col("sum_pos"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ts("1999-01-01 00:00:00"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(d182)).cast(DoubleType)
          .as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  val all: Seq[Q] = Seq(latePriority, forecastRevenue, volumeShipping,
    marketShare, productProfit, returnedItems, custDistribution,
    promoShare, topSupplier, smallQtyRevenue, largeOrders,
    disjunctiveRev, waitingSupplier, idleCustomers)
}
