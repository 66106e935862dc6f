package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, TimestampType}

/** Join surface (SURVEY.md §2.2-C).
  *
  * Scale notes: fact⋈fact joins shuffle on the key and lean on AQE.
  * BOUNDED dims (nation/region, 1-row aggregates) are explicitly
  * `broadcast()`-hinted; SF-SCALED sides (customer, supplier, part and
  * frames derived from them) are hint-free — stats/AQE broadcast them
  * while they fit and fall back to a partitioned join when, at large SF,
  * a forced hint would pin billions of rows to the driver. The as-of
  * join is a single window pass (one shuffle by user_id), never an
  * O(n²) range probe.
  */
object JoinOps {

  /** Fact ⋈ dim equi-join + aggregation per market segment. */
  val joinInner: Q = Q.checked(
    "q_join_inner",
    s"""SELECT c_mktsegment, count(*) AS n_orders,
       |  count(DISTINCT o_custkey) AS n_cust,
       |  ${dsumSql("o_totalprice")} AS sum_price
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_cust"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("c_mktsegment")
  }

  /** Star-schema dim chain with explicit broadcast hints. */
  val joinBroadcast: Q = Q.checked(
    "q_join_broadcast",
    s"""SELECT r_name, n_name, count(*) AS n_cust,
       |  ${dsumSql("c_acctbal")} AS sum_bal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("r_name", "n_name")
  }

  /** LEFT JOIN preserving zero-order customers (null-extension check). */
  val joinLeft: Q = Q.checked(
    "q_join_left",
    s"""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       |  ${dsumSql("o_totalprice")} AS sum_price
       |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
       |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("c_custkey")
  }

  /** Full-outer of two derived order sets — the CDC shape (R5). */
  val joinFull: Q = Q.checked(
    "q_join_full",
    """SELECT coalesce(a.k, b.k) AS o_orderkey,
      |  CASE WHEN a.k IS NULL THEN 'right_only'
      |       WHEN b.k IS NULL THEN 'left_only'
      |       ELSE 'both' END AS presence,
      |  a.aprice, b.bprice
      |FROM (SELECT o_orderkey AS k, o_totalprice AS aprice FROM orders WHERE o_orderkey % 3 = 0) a
      |FULL OUTER JOIN (SELECT o_orderkey AS k, o_totalprice AS bprice FROM orders WHERE o_orderkey % 4 = 0) b
      |ON a.k = b.k
      |ORDER BY o_orderkey""".stripMargin
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val a = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("ak"), col("o_totalprice").as("aprice"))
    val b = o.filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey").as("bk"), col("o_totalprice").as("bprice"))
    a.join(b, col("ak") === col("bk"), "full_outer")
      .select(coalesce(col("ak"), col("bk")).as("o_orderkey"),
        when(col("ak").isNull, "right_only")
          .when(col("bk").isNull, "left_only")
          .otherwise("both").as("presence"),
        col("aprice"), col("bprice"))
      .orderBy("o_orderkey")
  }

  /** Left-semi: customers having at least one big order. */
  val joinSemi: Q = Q.checked(
    "q_join_semi",
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("o_custkey") === col("c_custkey") && col("o_totalprice") > 400000,
        "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Left-anti: customers with no orders at all (delete-detection shape). */
  val joinAnti: Q = Q.checked(
    "q_join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Theta self-join: nation pairs within a region (n1 < n2). */
  val joinTheta: Q = Q.checked(
    "q_join_theta",
    """SELECT n1.n_regionkey AS r_key, n1.n_nationkey AS k1, n2.n_nationkey AS k2,
      |       n1.n_name AS name1, n2.n_name AS name2
      |FROM nation n1 JOIN nation n2
      |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
      |ORDER BY k1, k2""".stripMargin
  ) { (s, dir) =>
    val n = Tables.nation(s, dir)
    val n1 = n.select(col("n_nationkey").as("k1"), col("n_name").as("name1"),
      col("n_regionkey").as("r_key"))
    val n2 = n.select(col("n_nationkey").as("k2"), col("n_name").as("name2"),
      col("n_regionkey").as("rk2"))
    n1.join(n2, col("r_key") === col("rk2") && col("k1") < col("k2"))
      .select("r_key", "k1", "k2", "name1", "name2")
      .orderBy("k1", "k2")
  }

  /** As-of join: per purchase, the most recent prior click by the same
    * user, in (ts, event_id) stream order. Implemented as ONE window pass
    * (the 100 TB-safe plan: a single shuffle by user_id, no range probe);
    * the oracle uses the identical window formulation, not DuckDB's ASOF
    * JOIN, so tie-breaking is provably the same (SURVEY §7.4).
    */
  private val AsOfOracle: String = Tables.EventsCte +
    """,
      |w AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER win AS last_click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER win AS last_click_ts
      |  FROM ev
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
      |       last_click_id, last_click_ts
      |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin

  val joinAsof: Q = Q.checked(
    "q_join_asof", AsOfOracle
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val win = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(win))
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(win))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("purchase_ts"),
        col("last_click_id"),
        col("last_click_ts").cast("timestamp_ntz").as("last_click_ts"))
      .orderBy("purchase_id")
  }

  /** The SAME as-of semantics through the NATIVE operator
    * ([[graft.plans.AsOfJoin]] — custom LogicalPlan + SparkStrategy +
    * partition-wise merge SparkPlan, injected via
    * SparkSessionExtensions): purchases as the probe side, clicks as
    * the reference side, matched on user_id by the last click strictly
    * before the purchase in (ts, event_id) order. Checked against the
    * identical DuckDB oracle as q_join_asof, so the custom operator's
    * semantics — including the tie-break — are oracle-pinned, not just
    * spec-pinned. Plan: each side shuffles ONCE on user_id and merges
    * sorted partition pairs holding one buffered row — no union
    * materialization, no window buffer (AsOfJoin scaladoc). */
  val asofNative: Q = Q.checked(
    "q_asof_native", AsOfOracle
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"))
    graft.plans.AsOfJoin.asof(purchases, clicks,
        key = ("user_id", "r_user_id"), time = ("ts", "r_ts"),
        tie = ("event_id", "r_event_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("purchase_ts"),
        col("r_event_id").as("last_click_id"),
        col("r_ts").cast("timestamp_ntz").as("last_click_ts"))
      .orderBy("purchase_id")
  }

  /** As-of join with a STALENESS TOLERANCE — the feature-store lookup
    * contract: per purchase, the user's most recent prior click, but only
    * when it is at most 30 minutes stale, else NULL (a feature older than
    * its freshness SLA must not leak into training rows). Same single
    * user_id window shuffle as [[joinAsof]]; the tolerance is an exact
    * BIGINT-microsecond comparison applied AFTER the carry-forward, so
    * the match is "latest within tolerance", never "latest overall if in
    * tolerance, else older one". */
  private val AsOfTolOracle: String = Tables.EventsCte +
    """,
      |w AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER win AS lc_id,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER win AS lc_ts
      |  FROM ev
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id AS purchase_id, user_id,
      |  CASE WHEN epoch_us(ts) - epoch_us(lc_ts) <= 1800000000
      |       THEN lc_id END AS click_id,
      |  CASE WHEN epoch_us(ts) - epoch_us(lc_ts) <= 1800000000
      |       THEN epoch_us(ts) - epoch_us(lc_ts) END AS staleness_us
      |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin

  /** The tolerance path of the NATIVE operator, oracle-pinned: same
    * output as q_asof_tolerance but computed by [[graft.plans.AsOfJoin]]
    * with `toleranceUs` — proving the exec's latest-then-SLA rule (a
    * stale latest yields NULL, never an older in-tolerance row) equals
    * the window twin's post-carry-forward comparison. */
  val asofNativeTol: Q = Q.checked(
    "q_asof_native_tol", AsOfTolOracle
  ) { (s, dir) =>
    val TolUs = 1800000000L
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"))
    graft.plans.AsOfJoin.asof(purchases, clicks,
        key = ("user_id", "r_user_id"), time = ("ts", "r_ts"),
        tie = ("event_id", "r_event_id"), toleranceUs = Some(TolUs))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("r_event_id").as("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("r_ts")))
          .as("staleness_us"))
      .orderBy("purchase_id")
  }

  val asofTolerance: Q = Q.checked(
    "q_asof_tolerance",
    Tables.EventsCte +
      """,
        |w AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER win AS lc_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER win AS lc_ts
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id AS purchase_id, user_id,
        |  CASE WHEN epoch_us(ts) - epoch_us(lc_ts) <= 1800000000
        |       THEN lc_id END AS click_id,
        |  CASE WHEN epoch_us(ts) - epoch_us(lc_ts) <= 1800000000
        |       THEN epoch_us(ts) - epoch_us(lc_ts) END AS staleness_us
        |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin
  ) { (s, dir) =>
    val TolUs = 1800000000L // 30 minutes
    val win = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fresh = (unix_micros(col("ts")) - unix_micros(col("lc_ts"))) <= TolUs
    Tables.events(s, dir)
      .withColumn("lc_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(win))
      .withColumn("lc_ts",
        last(when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(win))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        when(fresh, col("lc_id")).as("click_id"),
        when(fresh, unix_micros(col("ts")) - unix_micros(col("lc_ts")))
          .as("staleness_us"))
      .orderBy("purchase_id")
  }

  /** Range (interval) join: pairs of same-user events within 10 minutes.
    * The oracle states it as a theta join; the engine runs the 100 TB-safe
    * plan — bucketize ts into 10-min buckets and equi-join on
    * (user_id, bucket) with one side exploded to its 3 neighbor buckets,
    * so the shuffle is an equi-join and each qualifying pair matches
    * exactly once (|bucket_a − bucket_b| ≤ 1 when |Δts| ≤ 10 min). */
  val joinRange: Q = Q.checked(
    "q_join_range",
    Tables.EventsCte +
      """
        |SELECT a.user_id, a.event_id AS eid_a, b.event_id AS eid_b,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 600000000
        |ORDER BY eid_a, eid_b""".stripMargin
  ) { (s, dir) =>
    val BucketUs = 600000000L // 10 minutes
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val a = ev.select(col("user_id"), col("event_id").as("eid_a"),
        col("us").as("us_a"))
      .withColumn("bucket_a", expr(s"us_a div $BucketUs"))
    val b = ev.select(col("user_id").as("user_b"), col("event_id").as("eid_b"),
        col("us").as("us_b"))
      .withColumn("bucket0", expr(s"us_b div $BucketUs"))
      .withColumn("bucket_b",
        explode(array(col("bucket0") - 1, col("bucket0"), col("bucket0") + 1)))
    a.join(b, col("user_id") === col("user_b")
        && col("bucket_a") === col("bucket_b")
        && col("eid_a") < col("eid_b")
        && abs(col("us_b") - col("us_a")) <= BucketUs)
      .select(col("user_id"), col("eid_a"), col("eid_b"),
        (col("us_b") - col("us_a")).as("gap_us"))
      .orderBy("eid_a", "eid_b")
  }

  /** Correlated scalar subqueries (per-customer order count + max price).
    * The oracle states it as two correlated subqueries; the Spark side is
    * the decorrelated form Catalyst itself rewrites to — ONE aggregate of
    * the inner table + ONE left join, instead of n_customers probes. An
    * empty correlation group yields count=0 / max=NULL→0.0 via coalesce,
    * matching scalar-subquery semantics exactly. */
  val subqueryScalar: Q = Q.checked(
    "q_subquery_scalar",
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
      |    AS n_orders,
      |  (SELECT coalesce(CAST(max(o_totalprice) AS DOUBLE), 0.0)
      |   FROM orders WHERE o_custkey = c_custkey) AS max_price
      |FROM customer ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    val per = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("mx"))
    Tables.customer(s, dir)
      .join(per, col("o_custkey") === col("c_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        coalesce(col("mx"), lit(0.0)).as("max_price"))
      .orderBy("c_custkey")
  }

  /** Shipping-priority revenue (the TPC-H Q3 shape): unshipped revenue
    * of BUILDING-segment orders placed before the cutoff, top 10 by
    * revenue. The benchmark-classic 3-table join exercising the whole
    * plan stack at once: both date filters push to the parquet scans,
    * the filtered customer side (≈1/5 of a dim table) joins hint-free
    * (stats/AQE broadcast it while it fits), the
    * lineitem⋈orders join is the one real shuffle, revenue partials
    * aggregate map-side, and the top-10 plans as TakeOrderedAndProject.
    *
    * Determinism: revenue summed in DECIMAL(24,6) (§7.5 rule 2) — the
    * per-row product is one correctly-rounded IEEE multiply, identical
    * cross-engine, then the decimal sum is order-free. */
  val shipPriority: Q = Q.checked(
    "q_ship_priority",
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue
      |FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
  ) { (s, dir) =>
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") <
        lit("1997-01-01 00:00:00").cast(TimestampType))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >
        lit("1997-01-01 00:00:00").cast(TimestampType))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(24, 6))).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Local-supplier revenue (the TPC-H Q5 shape): revenue from lineitems
    * where the supplier sits in the customer's own nation, by nation,
    * for two regions and a two-year order window — the deepest join tree
    * in the inventory (6 tables, one of them via a second condition on
    * the fact row). Plan shape: region→nation (bounded, hinted) collapse
    * into customer; customer and supplier join the fact scan hint-free
    * (SF-scaled — stats/AQE broadcast while they fit); the single real
    * shuffle is lineitem⋈orders; the same-nation predicate rides the
    * supplier join, so no post-join filter pass exists.
    * Revenue per §7.5 rule 2 (decimal partials). */
  val localSupplier: Q = Q.checked(
    "q_local_supplier",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |  JOIN customer ON c_nationkey = n_nationkey
      |  JOIN orders ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |    AND s_nationkey = c_nationkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
  ) { (s, dir) =>
    val nations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name").isin("ASIA", "EUROPE"))),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(s, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey", "n_name")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >=
          lit("1995-01-01 00:00:00").cast(TimestampType)
        && col("o_orderdate") <
          lit("1997-01-01 00:00:00").cast(TimestampType))
      .select("o_orderkey", "o_custkey")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    // NOT fanned (measured r16): the n_name partial aggregate collapses
    // the broadcast-join chain to ≤|nations| rows inside the scan stage,
    // so a fan adds a raw-row exchange nothing reuses — measured 0.73 s
    // unfanned vs 0.66 s fanned at sf0.1 c8 (inside noise) but 0.67 vs
    // 0.93 s at c32: net loss
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey")
        && col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(24, 6))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** SQL text through a per-invocation temp view, dropped after eager
    * analysis — the JoinScaleOps bloom recipe for queries only SQL can
    * express (correlated EXISTS, NOT IN, LATERAL). */
  private def sqlWith(s: org.apache.spark.sql.SparkSession,
      views: Map[String, org.apache.spark.sql.DataFrame])(
      mk: Map[String, String] => String): org.apache.spark.sql.DataFrame = {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val named = views.keys.map(k => k -> s"g_${k}_$tag").toMap
    views.foreach { case (k, df) => df.createOrReplaceTempView(named(k)) }
    try s.sql(mk(named))
    finally named.values.foreach(s.catalog.dropTempView(_))
  }

  /** Correlated EXISTS / NOT EXISTS through the SQL entry: per segment,
    * customers active in 1995 and customers who never ordered. Catalyst
    * decorrelates both predicates into semi/anti joins — the point of
    * the row is proving the SQL surface plans the same scale-safe
    * shapes the DSL twins (q_join_semi/q_join_anti) use. */
  val existsSubquery: Q = Q.checked(
    "q_exists_subquery",
    """SELECT c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND year(o.o_orderdate) = 1995) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_active_1995,
      |  CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_never_ordered
      |FROM customer c GROUP BY c_mktsegment ORDER BY c_mktsegment"""
      .stripMargin
  ) { (s, dir) =>
    sqlWith(s, Map("customer" -> Tables.customer(s, dir),
        "orders" -> Tables.orders(s, dir))) { v =>
      s"""SELECT c_mktsegment,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM ${v("orders")} o
         |    WHERE o.o_custkey = c.c_custkey
         |      AND year(o.o_orderdate) = 1995) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_active_1995,
         |  CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM ${v("orders")} o
         |    WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_never_ordered
         |FROM ${v("customer")} c
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    }
  }

  /** The NOT IN + NULL trap, pinned cross-engine: a NOT IN subquery
    * whose result set contains a NULL matches NOTHING (three-valued
    * logic — x <> NULL is unknown for every x), while the NOT EXISTS
    * twin and the IS NOT NULL-cleaned NOT IN return the true
    * complement. One row, three counts — the regression pin that keeps
    * an optimizer "simplification" from quietly changing delete-
    * detection semantics (the CDC anti-join is exactly this shape). */
  val notInNulls: Q = Q.checked(
    "q_not_in_nulls",
    """SELECT
      |  (SELECT count(*) FROM customer
      |   WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 7) FROM orders))
      |    AS n_not_in_with_null,
      |  (SELECT count(*) FROM customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM orders
      |     WHERE nullif(o_custkey, 7) = c.c_custkey)) AS n_not_exists,
      |  (SELECT count(*) FROM customer
      |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                           WHERE o_custkey IS NOT NULL))
      |    AS n_not_in_clean""".stripMargin
  ) { (s, dir) =>
    sqlWith(s, Map("customer" -> Tables.customer(s, dir),
        "orders" -> Tables.orders(s, dir))) { v =>
      s"""SELECT
         |  (SELECT count(*) FROM ${v("customer")}
         |   WHERE c_custkey NOT IN
         |     (SELECT nullif(o_custkey, 7) FROM ${v("orders")}))
         |    AS n_not_in_with_null,
         |  (SELECT count(*) FROM ${v("customer")} c
         |   WHERE NOT EXISTS (SELECT 1 FROM ${v("orders")}
         |     WHERE nullif(o_custkey, 7) = c.c_custkey)) AS n_not_exists,
         |  (SELECT count(*) FROM ${v("customer")}
         |   WHERE c_custkey NOT IN (SELECT o_custkey FROM ${v("orders")}
         |                           WHERE o_custkey IS NOT NULL))
         |    AS n_not_in_clean""".stripMargin
    }
  }

  /** LATERAL correlated subquery (SQL:1999): top-2 nations by customer
    * count PER region, the per-row-driven subquery join both engines
    * plan as a lateral join. Semantically the q_topk_per_group shape —
    * the row proves the SQL lateral surface; the dims are tiny, so the
    * correlated agg is bounded per region. */
  val lateralTopk: Q = Q.checked(
    "q_lateral",
    """SELECT r.r_name, l.n_name, l.n_customers
      |FROM region r, LATERAL (
      |  SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_customers
      |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY n_customers DESC, n.n_name LIMIT 2) l
      |ORDER BY r.r_name, l.n_customers DESC, l.n_name""".stripMargin
  ) { (s, dir) =>
    sqlWith(s, Map("region" -> Tables.region(s, dir),
        "nation" -> Tables.nation(s, dir),
        "customer" -> Tables.customer(s, dir))) { v =>
      s"""SELECT r.r_name, l.n_name, l.n_customers
         |FROM ${v("region")} r, LATERAL (
         |  SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_customers
         |  FROM ${v("nation")} n
         |    JOIN ${v("customer")} c ON c.c_nationkey = n.n_nationkey
         |  WHERE n.n_regionkey = r.r_regionkey
         |  GROUP BY n.n_name
         |  ORDER BY n_customers DESC, n.n_name LIMIT 2) l
         |ORDER BY r.r_name, l.n_customers DESC, l.n_name""".stripMargin
    }
  }

  val all: Seq[Q] = Seq(subqueryScalar, joinInner, joinBroadcast, joinLeft, joinFull,
    joinSemi, joinAnti, joinTheta, joinAsof, asofNative, asofNativeTol,
    asofTolerance, joinRange, shipPriority, localSupplier, existsSubquery, notInNulls,
    lateralTopk)
}
