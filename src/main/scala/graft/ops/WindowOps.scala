package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function surface (SURVEY.md §2.2-E) plus the two window-shaped
  * CDC consumer patterns (§2.2-I q_cdc_latest / q_cdc_scd2).
  *
  * Every window is a single hash-shuffle by its partition key followed by an
  * in-partition sort — the 100 TB-safe shape (no self-join, no range probe).
  * Window ORDER BYs are total within each partition (event_id / o_orderkey
  * are unique — FIXTURES.md measured), so rank/lag/frames are deterministic
  * and the DuckDB oracle can reproduce them bit-for-bit.
  *
  * Rank/row-number outputs are cast to BIGINT: Spark's rank() is INT while
  * DuckDB's is BIGINT, and the driver compares schemas.
  */
object WindowOps {
  private val D = DecimalType(18, 2)

  /** rank / dense_rank / row_number per order-priority band, top-5 rows
    * per band — bounded output (O(bands·5)), never the whole table. */
  val winRank: Q = Q.checked(
    "q_win_rank",
    """WITH w AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    rank()       OVER win AS rnk,
      |    dense_rank() OVER win AS drnk,
      |    row_number() OVER win AS rn
      |  FROM orders
      |  WINDOW win AS (PARTITION BY o_orderpriority
      |                 ORDER BY o_totalprice DESC, o_orderkey))
      |SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk, rn
      |FROM w WHERE rn <= 5
      |ORDER BY o_orderpriority, rn""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rnk", rank().over(win).cast(LongType))
      .withColumn("drnk", dense_rank().over(win).cast(LongType))
      .withColumn("rn", row_number().over(win).cast(LongType))
      .filter(col("rn") <= 5)
      .orderBy("o_orderpriority", "rn")
  }

  /** lag / lead over the per-user event stream in (ts, event_id) order.
    * Values pass through untouched (no arithmetic) so doubles stay exact. */
  val winLag: Q = Q.checked(
    "q_win_lag",
    Tables.EventsCte +
      """,
        |w AS (
        |  SELECT event_id, user_id, value,
        |    lag(value)       OVER win AS prev_value,
        |    lead(value)      OVER win AS next_value,
        |    lag(event_id, 2) OVER win AS prev2_id
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, value, prev_value, next_value, prev2_id
        |FROM w ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_value", lag("value", 1).over(win))
      .withColumn("next_value", lead("value", 1).over(win))
      .withColumn("prev2_id", lag("event_id", 2).over(win))
      .select("event_id", "user_id", "value", "prev_value", "next_value",
        "prev2_id")
      .orderBy("event_id")
  }

  /** Running money sum per customer, ROWS UNBOUNDED PRECEDING..CURRENT —
    * summed over DECIMAL(18,2) so the cumulation is exact and
    * association-order-free (SURVEY §7.4). */
  val winFrameRows: Q = Q.checked(
    "q_win_frame_rows",
    """WITH w AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER win AS DOUBLE) AS run_sum,
      |    row_number() OVER win AS rn
      |  FROM orders
      |  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT o_orderkey, o_custkey, run_sum, rn FROM w ORDER BY o_orderkey""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("run_sum",
        sum(col("o_totalprice").cast(D))
          .over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType))
      .withColumn("rn", row_number().over(win).cast(LongType))
      .select("o_orderkey", "o_custkey", "run_sum", "rn")
      .orderBy("o_orderkey")
  }

  /** RANGE frame on a numeric key: per customer, how many of their orders
    * fall in the trailing 7-day window (inclusive of same-day peers —
    * RANGE semantics, identical in both engines). */
  val winFrameRange: Q = Q.checked(
    "q_win_frame_range",
    """WITH d AS (
      |  SELECT o_orderkey, o_custkey,
      |    date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_num
      |  FROM orders),
      |w AS (
      |  SELECT o_orderkey, o_custkey, day_num,
      |    count(*) OVER (PARTITION BY o_custkey ORDER BY day_num
      |                   RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS n_7d
      |  FROM d)
      |SELECT o_orderkey, o_custkey, day_num, n_7d FROM w ORDER BY o_orderkey""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("o_custkey").orderBy(col("day_num"))
      .rangeBetween(-7, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("day_num",
        datediff(col("o_orderdate").cast(DateType),
          lit("1990-01-01").cast(DateType)).cast(LongType))
      .withColumn("n_7d", count(lit(1)).over(win))
      .select("o_orderkey", "o_custkey", "day_num", "n_7d")
      .orderBy("o_orderkey")
  }

  /** Top-3 orders per customer — the row_number≤k pattern; output is
    * O(3·customers), bounded. */
  val topkPerGroup: Q = Q.checked(
    "q_topk_per_group",
    """WITH w AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_custkey, rn, o_orderkey, o_totalprice
      |FROM w WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(win).cast(LongType))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** Collapse a change feed to the latest record per key — the most common
    * consumer of a CDC stream [SURVEY §2.2-I]. One shuffle by user_id. */
  val cdcLatest: Q = Q.checked(
    "q_cdc_latest",
    Tables.EventsCte +
      """,
        |w AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ev)
        |SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM w WHERE rn = 1 ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp_ntz").as("ts"), col("event_type"),
        col("value"))
      .orderBy("user_id")
  }

  /** SCD-type-2 history: per user, each event versioned with
    * [effective_from, effective_to) via lead(); open interval = current. */
  val cdcScd2: Q = Q.checked(
    "q_cdc_scd2",
    Tables.EventsCte +
      """,
        |w AS (
        |  SELECT user_id, event_id, value,
        |    ts AS effective_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS effective_to
        |  FROM ev)
        |SELECT user_id, event_id, value,
        |  CAST(effective_from AS TIMESTAMP) AS effective_from,
        |  CAST(effective_to AS TIMESTAMP) AS effective_to,
        |  CASE WHEN effective_to IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM w ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("effective_to", lead("ts", 1).over(win))
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").cast("timestamp_ntz").as("effective_from"),
        col("effective_to").cast("timestamp_ntz").as("effective_to"),
        when(col("effective_to").isNull, 1).otherwise(0).as("is_current"))
      .orderBy("event_id")
  }

  /** Point-in-time (time-travel) lookup over the SCD2 history: each
    * user's ACTIVE row as of a fixed cutoff — the validity-interval probe
    * behind "train only on features known at time T" (feature-store
    * point-in-time correctness) and "reproduce the report as of T"
    * (regulatory replay). Same single user_id window as [[cdcScd2]] plus
    * a half-open interval filter; at scale the cutoff predicate prunes
    * partitions when history is stored partitioned by validity date. */
  val timeTravel: Q = Q.checked(
    "q_time_travel",
    Tables.EventsCte +
      """,
        |w AS (
        |  SELECT user_id, event_id, value,
        |    ts AS effective_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS effective_to
        |  FROM ev)
        |SELECT user_id, event_id, value,
        |  CAST(effective_from AS TIMESTAMP) AS effective_from
        |FROM w
        |WHERE effective_from <= TIMESTAMP '2024-01-15 12:00:00'
        |  AND (effective_to IS NULL
        |       OR effective_to > TIMESTAMP '2024-01-15 12:00:00')
        |ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    val cutoff = lit("2024-01-15 12:00:00").cast(TimestampType)
    val win = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("effective_to", lead("ts", 1).over(win))
      .filter(col("ts") <= cutoff
        && (col("effective_to").isNull || col("effective_to") > cutoff))
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").cast("timestamp_ntz").as("effective_from"))
      .orderBy("user_id")
  }

  /** Distribution window functions: ntile / percent_rank / cume_dist.
    * percent_rank and cume_dist are single IEEE divisions of exact ints —
    * bit-identical cross-engine, no rounding needed. */
  val winNtile: Q = Q.checked(
    "q_win_ntile",
    """WITH w AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    ntile(4)       OVER win AS quartile,
      |    percent_rank() OVER win AS prank,
      |    cume_dist()    OVER win AS cdist,
      |    row_number()   OVER win AS rn
      |  FROM orders
      |  WINDOW win AS (PARTITION BY o_orderpriority
      |                 ORDER BY o_totalprice, o_orderkey))
      |SELECT o_orderpriority, o_orderkey, CAST(quartile AS BIGINT) AS quartile,
      |       prank, cdist
      |FROM w WHERE rn % 500 = 0
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(win).cast(LongType))
      .withColumn("prank", percent_rank().over(win))
      .withColumn("cdist", cume_dist().over(win))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") % 500 === 0)
      .select("o_orderpriority", "o_orderkey", "quartile", "prank", "cdist")
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Navigation window functions: first/last/nth value over an explicit
    * running frame. The frame must be pinned (ROWS UNBOUNDED PRECEDING …
    * CURRENT ROW) on BOTH engines: last_value over the default frame is
    * the current row, a classic cross-engine trap either way — pinning
    * makes the intent unambiguous. Deterministic: the (o_totalprice,
    * o_orderkey) sort is total. */
  val winFirstLast: Q = Q.checked(
    "q_win_first_last",
    """WITH w AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    first_value(o_orderkey) OVER win AS cheapest_key,
      |    last_value(o_orderkey)  OVER win AS running_key,
      |    nth_value(o_orderkey, 3) OVER win AS third_key,
      |    row_number() OVER win AS rn
      |  FROM orders
      |  WINDOW win AS (PARTITION BY o_orderpriority
      |                 ORDER BY o_totalprice, o_orderkey
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT o_orderpriority, o_orderkey, cheapest_key, running_key,
      |       third_key
      |FROM w WHERE rn % 500 = 0
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("cheapest_key", first(col("o_orderkey")).over(win))
      .withColumn("running_key", last(col("o_orderkey")).over(win))
      .withColumn("third_key", nth_value(col("o_orderkey"), 3).over(win))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") % 500 === 0)
      .select("o_orderpriority", "o_orderkey", "cheapest_key", "running_key",
        "third_key")
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Last-observation-carried-forward over an event stream: at every
    * event, the user's most recent purchase amount (IGNORE NULLS over a
    * running frame — `last(_, ignoreNulls)` in Spark, `last_value(...
    * IGNORE NULLS)` in the oracle). Row-grain LOCF is the sensor/price
    * carry-forward primitive; q_gapfill is its day-grain calendar twin.
    * One user_id shuffle; total (ts, event_id) frame order.
    *
    * Output is exact integer CENTS (BIGINT), not DECIMAL: the decimal
    * snap happens once per input value (value → DECIMAL(18,2) → ×100 →
    * BIGINT, identical one-op chains on both engines), and the window
    * then carries an integral long — so the checker only ever hashes an
    * int64 column, same recipe as every other money output in the repo. */
  val winLocf: Q = Q.checked(
    "q_locf",
    Tables.EventsCte +
      """
        |SELECT user_id, event_id,
        |  coalesce(last_value(CASE WHEN event_type = 'purchase'
        |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    -1) AS last_purchase_cents
        |FROM ev ORDER BY user_id, event_id""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "purchase",
          (col("value").cast(DecimalType(18, 2)) * lit(100))
            .cast(LongType)).as("pv"))
      .select(col("user_id"), col("event_id"),
        coalesce(last(col("pv"), ignoreNulls = true).over(w),
          lit(-1L)).as("last_purchase_cents"))
      .orderBy("user_id", "event_id")
  }

  /** Trailing-1-hour sliding aggregate at every event (count + exact
    * money sum): a RANGE frame over time, not rows — ties at the same
    * microsecond are frame PEERS on both engines (a ROWS frame would
    * order them arbitrarily), which is why the Spark side orders by
    * `unix_micros` with a numeric rangeBetween: identical peer semantics
    * to the oracle's `RANGE INTERVAL '1 hour' PRECEDING`. */
  val winTimeRange: Q = Q.checked(
    "q_win_time_range",
    Tables.EventsCte +
      """
        |SELECT user_id, event_id,
        |  count(*) OVER win AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER win AS DOUBLE)
        |    AS sum_1h
        |FROM ev
        |WINDOW win AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType).as("sum_1h"))
      .orderBy("user_id", "event_id")
  }

  /** nth_value over a full-partition frame: per customer with ≥3
    * orders, the first / third / last order key — the "milestone order"
    * digest (onboarding analyses read exactly this shape). One
    * user-keyed window shuffle; the per-customer digest collapses via
    * the same exchange; bounded top-50 output. */
  val winNth: Q = Q.checked(
    "q_win_nth",
    """WITH w AS (
      |  SELECT o_custkey, o_orderkey,
      |    nth_value(o_orderkey, 3) OVER win AS third_order,
      |    first_value(o_orderkey) OVER win AS first_order,
      |    last_value(o_orderkey) OVER win AS last_order,
      |    count(*) OVER (PARTITION BY o_custkey) AS n
      |  FROM orders
      |  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |SELECT o_custkey, CAST(max(n) AS BIGINT) AS n_orders,
      |  max(first_order) AS first_order, max(third_order) AS third_order,
      |  max(last_order) AS last_order
      |FROM w WHERE n >= 3 GROUP BY o_custkey
      |ORDER BY o_custkey LIMIT 50""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        nth_value(col("o_orderkey"), 3).over(win).as("third_order"),
        first(col("o_orderkey")).over(win).as("first_order"),
        last(col("o_orderkey")).over(win).as("last_order"),
        count(lit(1)).over(Window.partitionBy("o_custkey")).as("n"))
      .filter(col("n") >= 3)
      .groupBy("o_custkey")
      .agg(max(col("n")).cast(LongType).as("n_orders"),
        max(col("first_order")).as("first_order"),
        max(col("third_order")).as("third_order"),
        max(col("last_order")).as("last_order"))
      .orderBy("o_custkey").limit(50)
  }

  val all: Seq[Q] = Seq(winRank, winLag, winFrameRows, winFrameRange,
    topkPerGroup, cdcLatest, cdcScd2, timeTravel, winNtile, winFirstLast,
    winLocf, winTimeRange, winNth)
}
