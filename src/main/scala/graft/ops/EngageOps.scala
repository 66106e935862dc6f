package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-11 engagement-lifecycle analytics over the events stream:
  * view→purchase conversion lag and traffic burstiness — the two
  * product-analytics measures the existing funnel/retention/stickiness
  * suite does not cover (q_window_funnel counts step DEPTHS reached,
  * q_conversion_lag measures the TIME the committed step took;
  * q_autocorr_daily measures persistence, q_burstiness dispersion).
  *
  * Determinism (SURVEY §7.5): all lag arithmetic in exact MICROSECONDS
  * (`unix_micros` / DuckDB `epoch_us`) with integer `div` — never a
  * double in the middle; the one terminal double (Fano factor) is a
  * single division of two exact BIGINTs (IEEE round-to-nearest is
  * identical cross-engine for identical integer inputs); total ORDER BY.
  *
  * Scale shape: both queries collapse the corpus to a bounded frame in
  * ONE pass before anything quadratic-looking happens — conversion lag
  * to user grain (two user-keyed min-aggregates co-partitioned by the
  * same key), burstiness to (type × day) grain (≤ |types|·|days| rows,
  * map-side combined). */
object EngageOps {

  /** Days-to-convert distribution: for every user, the FIRST view and
    * the FIRST purchase at-or-after it; the lag binned by whole days
    * with exact minute totals per bin. The first-touch latency report
    * behind activation dashboards — and the time-axis complement of
    * q_window_funnel's step-depth counts. Plan: one user-grain
    * min-CASE aggregate (first view), one semi-join-shaped min over the
    * purchases after it (same user key — AQE broadcasts the small
    * firsts side or co-partitions), then a ≤ lag-domain-sized band
    * aggregate. No window over the raw corpus. */
  val conversionLag: Q = Q.checked(
    "q_conversion_lag",
    Tables.EventsCte +
      """,
        |firsts AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
        |  FROM ev GROUP BY user_id),
        |conv AS (
        |  SELECT f.user_id,
        |    min(epoch_us(e.ts) - epoch_us(f.first_view)) AS lag_us
        |  FROM firsts f
        |  JOIN ev e ON e.user_id = f.user_id
        |    AND e.event_type = 'purchase' AND e.ts >= f.first_view
        |  WHERE f.first_view IS NOT NULL
        |  GROUP BY f.user_id)
        |SELECT CAST(lag_us // 86400000000 AS BIGINT) AS lag_days,
        |  count(*) AS n_users,
        |  CAST(sum(lag_us // 60000000) AS BIGINT) AS total_lag_min,
        |  CAST(min(lag_us // 60000000) AS BIGINT) AS min_lag_min,
        |  CAST(max(lag_us // 60000000) AS BIGINT) AS max_lag_min
        |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val firsts = ev
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts")))
        .as("first_view"))
      .filter(col("first_view").isNotNull)
    val conv = ev.filter(col("event_type") === "purchase")
      .join(firsts, "user_id")
      .filter(col("ts") >= col("first_view"))
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts")) - unix_micros(col("first_view")))
        .as("lag_us"))
    conv
      .groupBy(expr("lag_us div 86400000000").as("lag_days"))
      .agg(count(lit(1)).as("n_users"),
        sum(expr("lag_us div 60000000")).cast(LongType)
          .as("total_lag_min"),
        min(expr("lag_us div 60000000")).cast(LongType).as("min_lag_min"),
        max(expr("lag_us div 60000000")).cast(LongType).as("max_lag_min"))
      .orderBy("lag_days")
  }

  /** Traffic burstiness per event type: the Fano factor (variance-to-
    * mean ratio) of DAILY event counts — >1 over-dispersed/bursty
    * (incident-shaped), <1 under-dispersed/regular (rate-limited or
    * synthetic). Exact integer ingredients (n·Σc²−(Σc)² over n·Σc with
    * the denominators cleared — the chi-square/q_hhi recipe) plus ONE
    * terminal double division. Plan: corpus → (type, day) counts in one
    * map-side-combined aggregate, then a ≤|types|-row rollup. */
  val burstiness: Q = Q.checked(
    "q_burstiness",
    Tables.EventsCte +
      """,
        |daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM ev GROUP BY 1, 2)
        |SELECT event_type,
        |  count(*) AS n_days,
        |  CAST(sum(c) AS BIGINT) AS total_events,
        |  CAST(min(c) AS BIGINT) AS min_day,
        |  CAST(max(c) AS BIGINT) AS max_day,
        |  CAST(count(*) * sum(c*c) - sum(c) * sum(c) AS BIGINT) AS var_num,
        |  CAST(count(*) * sum(c) AS BIGINT) AS fano_den,
        |  CAST(CAST(count(*) * sum(c*c) - sum(c) * sum(c) AS BIGINT)
        |       AS DOUBLE) / CAST(count(*) * sum(c) AS BIGINT) AS fano
        |FROM daily GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
    daily
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("c")).cast(LongType).as("total_events"),
        min(col("c")).cast(LongType).as("min_day"),
        max(col("c")).cast(LongType).as("max_day"),
        (count(lit(1)) * sum(col("c") * col("c")) -
          sum(col("c")) * sum(col("c"))).cast(LongType).as("var_num"),
        (count(lit(1)) * sum(col("c"))).cast(LongType).as("fano_den"))
      .withColumn("fano",
        col("var_num").cast("double") / col("fano_den"))
      .orderBy("event_type")
  }

  /** Pairwise event-type CO-ENGAGEMENT: for each unordered type pair,
    * how many users did both, each side's reach, and the cleared-
    * denominator Jaccard (users-doing-both / users-doing-either, in
    * exact milli-units via integer `div` — decimal '/' rounds and its
    * cross-engine rounding flips at boundaries). The "do clickers also
    * purchase" audience-overlap matrix the funnel/retention suite
    * never asks.
    *
    * Scale: the corpus collapses to DISTINCT (user, type) FIRST — user
    * grain, bounded by |users|·|types| — then the pair build is a
    * self-equi-join on user_id (one shuffle, ≤C(|types|,2) rows out
    * per user, |types| is a domain constant) and two ≤|types|-row
    * reach joins. Never a window, never user×user. */
  val crossEngagement: Q = Q.checked(
    "q_cross_engagement",
    Tables.EventsCte +
      """,
        |ut AS (SELECT DISTINCT user_id AS u, event_type AS t FROM ev),
        |tot AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM ut
        |        GROUP BY t),
        |pairs AS (
        |  SELECT a.t AS t_a, b.t AS t_b, CAST(count(*) AS BIGINT)
        |    AS n_both
        |  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
        |  GROUP BY a.t, b.t)
        |SELECT t_a, t_b, n_both, ta.n AS n_a, tb.n AS n_b,
        |  n_both * 1000 // (ta.n + tb.n - n_both) AS jaccard_milli
        |FROM pairs JOIN tot ta ON ta.t = t_a JOIN tot tb ON tb.t = t_b
        |ORDER BY t_a, t_b""".stripMargin
  ) { (s, dir) =>
    val ut = Tables.events(s, dir)
      .select(col("user_id").as("u"), col("event_type").as("t"))
      .distinct()
    val tot = ut.groupBy("t").agg(count(lit(1)).as("n"))
    val pairs = ut.alias("a")
      .join(ut.alias("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("t_a"), col("b.t").as("t_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(tot.select(col("t").as("t_a"), col("n").as("n_a")), "t_a")
      .join(tot.select(col("t").as("t_b"), col("n").as("n_b")), "t_b")
      .select(col("t_a"), col("t_b"), col("n_both"), col("n_a"),
        col("n_b"),
        expr("n_both * 1000L div (n_a + n_b - n_both)")
          .as("jaccard_milli"))
      .orderBy("t_a", "t_b")
  }

  val all: Seq[Q] = Seq(conversionLag, burstiness, crossEngagement)
}
