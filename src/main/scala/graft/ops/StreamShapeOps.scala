package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming-shaped batch queries (SURVEY.md §2.2-J ✓ rows): tumbling /
  * sliding windows and sessionization, written with exactly the constructs
  * the streaming pipeline reuses (`window()`, gaps-and-islands) so the
  * Structured Streaming suite can assert batch↔stream parity against them
  * (graft.streaming / StreamingSpec).
  *
  * Spark's `window()` buckets are epoch-aligned, as is DuckDB's
  * `time_bucket` — starts agree by construction.
  */
object StreamShapeOps {
  private val D = DecimalType(18, 2)

  /** 1-day tumbling window × event_type: count + exact money sum. */
  val tumbling: Q = Q.checked(
    "q_tumbling",
    Tables.EventsCte +
      """
        |SELECT time_bucket(INTERVAL '1 day', ts) AS win_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM ev GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast(DoubleType).as("sum_v"))
      .select(col("w.start").cast("timestamp_ntz").as("win_start"),
        col("event_type"), col("n"), col("sum_v"))
      .orderBy("win_start", "event_type")
  }

  /** 2-day window sliding by 1 day — every event lands in exactly two
    * windows; the oracle reproduces that with a 2-way shifted union. */
  val sliding: Q = Q.checked(
    "q_sliding",
    Tables.EventsCte +
      """,
        |pairs AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS win_start, value FROM ev
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '1 day', ts) - INTERVAL '1 day', value FROM ev)
        |SELECT win_start, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM pairs GROUP BY win_start ORDER BY win_start""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast(DoubleType).as("sum_v"))
      .select(col("w.start").cast("timestamp_ntz").as("win_start"),
        col("n"), col("sum_v"))
      .orderBy("win_start")
  }

  /** THE gaps-and-islands session definition (30-minute gap, total
    * (ts, event_id) order), shared by q_session_batch and
    * q_peak_concurrency — one definition on each engine, so the gap rule
    * and the tiebreaker can never drift between the two queries. */
  private val SessionSqlCtes: String =
    """flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER win IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER win) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM ev
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS session_id
      |  FROM flagged)""".stripMargin

  /** Spark twin of [[SessionSqlCtes]]: events + a session_id column. */
  private def withSessionIds(events: org.apache.spark.sql.DataFrame) = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val usec = unix_micros(col("ts"))
    val newSession = when(lag(col("ts"), 1).over(byUser).isNull
        || usec - unix_micros(lag(col("ts"), 1).over(byUser)) > 1800000000L, 1)
      .otherwise(0)
    events
      .withColumn("new_session", newSession)
      .withColumn("session_id",
        sum(col("new_session"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Batch sessionization (gaps-and-islands): a new session starts when the
    * per-user gap exceeds 30 minutes. Two window passes over one shuffle by
    * user_id, then a per-user rollup; span arithmetic stays in exact
    * BIGINT microseconds. */
  val sessionBatch: Q = Q.checked(
    "q_session_batch",
    Tables.EventsCte + ",\n" + SessionSqlCtes +
      """,
        |per_session AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |    epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
        |  FROM sessions GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST(sum(span_us) AS BIGINT) AS total_span_us,
        |  CAST(sum(span_us) AS DOUBLE) / count(*) / 1000000.0 AS avg_span_sec
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    withSessionIds(Tables.events(s, dir))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("span_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        sum(col("span_us")).as("total_span_us"),
        // two IEEE divisions, no rounding: correctly-rounded ops are
        // bit-identical cross-engine, while round() at a decimal tie is not
        (sum(col("span_us")).cast(DoubleType) / count(lit(1)) / 1000000.0)
          .as("avg_span_sec"))
      .orderBy("user_id")
  }

  /** Ordered conversion funnel view→click→purchase: users whose FIRST
    * click follows their first view, and first purchase follows that
    * click. One shuffle on user_id, conditional-min aggregation (map-side
    * partials), then a single global reduce — the plan shape that holds
    * at any user count. Null stage times fall out of the comparisons
    * (NULL > x is never counted) identically on both engines. */
  val funnel: Q = Q.checked(
    "q_funnel",
    Tables.EventsCte +
      """,
        |f AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM ev GROUP BY user_id)
        |SELECT
        |  CAST(count_if(t_view IS NOT NULL) AS BIGINT) AS n_view,
        |  CAST(count_if(t_click > t_view) AS BIGINT) AS n_click_after_view,
        |  CAST(count_if(t_click > t_view AND t_purchase > t_click) AS BIGINT)
        |    AS n_full_funnel
        |FROM f""".stripMargin
  ) { (s, dir) =>
    def firstOf(t: String) =
      min(when(col("event_type") === t, col("ts"))).as(s"t_$t")
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
      .agg(
        count(when(col("t_view").isNotNull, 1)).as("n_view"),
        count(when(col("t_click") > col("t_view"), 1))
          .as("n_click_after_view"),
        count(when(col("t_click") > col("t_view")
          && col("t_purchase") > col("t_click"), 1)).as("n_full_funnel"))
  }

  /** Weekly cohort retention: cohort = a user's first active week (days
    * since 2024-01-01 div 7 — integer division, no float week math);
    * each (cohort, k) row counts users still active k weeks later.
    * distinct(user, week) → min per user → one self-join back, all at
    * user grain: the standard retention triangle with no window over the
    * raw event stream. */
  val retention: Q = Q.checked(
    "q_retention",
    Tables.EventsCte +
      """,
        |u AS (SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
        |      AS BIGINT) AS wk
        |  FROM ev),
        |c AS (SELECT user_id, min(wk) AS cohort FROM u GROUP BY user_id)
        |SELECT cohort, u.wk - cohort AS k, count(*) AS n_users
        |FROM u JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val userWeeks = Tables.events(s, dir)
      .select(col("user_id"),
        expr("datediff(CAST(ts AS DATE), DATE'2024-01-01') div 7")
          .cast(LongType).as("wk"))
      .distinct()
    val cohorts = userWeeks.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    userWeeks.join(cohorts, "user_id")
      .groupBy(col("cohort"), (col("wk") - col("cohort")).as("k"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "k")
  }

  /** Multi-grain time rollup: hour/day/month × event_type counts in ONE
    * pass — GROUPING SETS over precomputed date_trunc columns plan a
    * single Expand + one shuffle, where the naive shape (the oracle's
    * UNION ALL of three aggregations, value-identical) scans the table
    * three times. ts is never null, so the surviving trunc column
    * identifies the grain without `grouping()` bookkeeping. */
  val timeRollup: Q = Q.checked(
    "q_time_rollup",
    Tables.EventsCte +
      """
        |SELECT grain, g_ts, event_type, count(*) AS n FROM (
        |  SELECT 'hour' AS grain, date_trunc('hour', ts) AS g_ts, event_type
        |  FROM ev
        |  UNION ALL
        |  SELECT 'day', date_trunc('day', ts), event_type FROM ev
        |  UNION ALL
        |  SELECT 'month', date_trunc('month', ts), event_type FROM ev)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  ) { (s, dir) =>
    val grains = Seq("hour" -> "h", "day" -> "d", "month" -> "m")
    val pre = Tables.events(s, dir).select(
      col("event_type") +: grains.map { case (g, c) =>
        date_trunc(g, col("ts")).as(c) }: _*)
    pre
      .groupingSets(
        grains.map { case (_, c) => Seq(col(c), col("event_type")) },
        col("h"), col("d"), col("m"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        when(col("h").isNotNull, "hour").when(col("d").isNotNull, "day")
          .otherwise("month").as("grain"),
        coalesce(col("h"), col("d"), col("m")).as("g_ts"),
        col("event_type"), col("n"))
      .orderBy("grain", "g_ts", "event_type")
  }

  /** Month-over-month revenue growth in basis points — the BI trend
    * primitive every reporting layer needs. Revenue is summed in exact
    * integer CENTS (one decimal snap per order, the q_locf recipe), the
    * month series is one bounded aggregate (≈80 rows here; always
    * calendar-bounded), and lag/growth run over that aggregate, never the
    * fact table. growth_bp = (Δ·10000) div prev in integer floor
    * division — deterministic, no float ratio. First month: NULL. */
  val growthMom: Q = Q.checked(
    "q_growth_mom",
    """WITH m AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1)
      |SELECT month, rev_cents,
      |  ((rev_cents - lag(rev_cents) OVER (ORDER BY month)) * 10000)
      |    // lag(rev_cents) OVER (ORDER BY month) AS growth_bp
      |FROM m ORDER BY month""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast(DateType)
        .as("month"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast(LongType)).as("rev_cents"))
      .withColumn("growth_bp",
        expr("((rev_cents - lag(rev_cents) OVER (ORDER BY month)) * 10000)" +
          " div lag(rev_cents) OVER (ORDER BY month)"))
      .orderBy("month")
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * count (state → next state) pairs plus an integer-scaled row
    * probability (p_milli = n·1000 div row total — floor division, the
    * q_tfidf determinism recipe). One shuffle on user_id for the lead()
    * window, then a 25-key aggregation; the row-total window runs over
    * the 25-row aggregate, not the stream. The per-user sequence order
    * (ts, event_id) is total, so next_type is deterministic. */
  val transitions: Q = Q.checked(
    "q_transitions",
    Tables.EventsCte +
      """,
        |nxt AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM ev),
        |pairs AS (
        |  SELECT event_type, next_type, count(*) AS n
        |  FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |  CAST((n * 1000) // (sum(n) OVER (PARTITION BY event_type))
        |    AS BIGINT) AS p_milli
        |FROM pairs ORDER BY event_type, next_type""".stripMargin
  ) { (s, dir) =>
    val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("event_type"), lead(col("event_type"), 1).over(seq)
        .as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
    pairs
      .withColumn("p_milli", expr(
        "(n * 1000) div (sum(n) OVER (PARTITION BY event_type))"))
      .orderBy("event_type", "next_type")
  }

  /** Peak concurrent sessions per day — the sweep-line classic, written
    * to survive 100 TB: sessions (q_session_batch's gaps-and-islands)
    * become ±1 boundary deltas, deltas are NETTED per timestamp (so no
    * tie-ordering exists to disagree on), the running sum is computed
    * WITHIN each day partition, and cross-day state is a carry frame of
    * one net integer per day — the only global window runs over ~30 day
    * rows, never the event stream. A naive global ORDER BY ts running
    * sum would single-partition the whole table; this shape never does.
    * Session ends are exclusive at end+1µs, so a 1-event session still
    * occupies its instant and back-to-back sessions at the same
    * microsecond count as overlapping for that instant. All integers.
    *
    * Sessions spanning midnight: a day's peak is at least its carry-in
    * (concurrency holds from 00:00 until the first in-day boundary), so
    * the day term is greatest(0, max_run), not max_run — an all-endings
    * day must not under-report. A day with NO session boundary at all is
    * omitted (emitting carry-only days needs a calendar join; with a
    * 30-minute session gap such days cannot hold an open session anyway). */
  val peakConcurrency: Q = Q.checked(
    "q_peak_concurrency",
    Tables.EventsCte + ",\n" + SessionSqlCtes +
      """,
        |spans AS (SELECT user_id, session_id,
        |            min(ts) AS s_start, max(ts) AS s_end
        |          FROM sessions GROUP BY 1, 2),
        |deltas AS (
        |  SELECT s_start AS ts, 1 AS d FROM spans
        |  UNION ALL
        |  SELECT s_end + INTERVAL 1 MICROSECOND, -1 FROM spans),
        |net AS (SELECT ts, CAST(sum(d) AS BIGINT) AS d FROM deltas
        |        GROUP BY ts),
        |run AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, d,
        |    sum(d) OVER (PARTITION BY date_trunc('day', ts) ORDER BY ts)
        |      AS run_in_day
        |  FROM net),
        |daily AS (SELECT day, max(run_in_day) AS max_run,
        |            CAST(sum(d) AS BIGINT) AS day_net
        |          FROM run GROUP BY day)
        |SELECT day,
        |  CAST(coalesce(sum(day_net) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |       + greatest(0, max_run) AS BIGINT) AS max_conc
        |FROM daily ORDER BY day""".stripMargin
  ) { (s, dir) =>
    val spans = withSessionIds(Tables.events(s, dir))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    // ±1 deltas via ONE generate, not a self-union: a union of two
    // selects over `spans` would recompute the whole sessionization
    // subtree (and rescan events) twice — plan-audited, round 4
    val deltas = spans.select(explode(array(
        struct(col("s_start").as("ts"), lit(1).as("d")),
        struct((col("s_end") + expr("INTERVAL 1 MICROSECOND")).as("ts"),
          lit(-1).as("d")))).as("x"))
      .select(col("x.ts").as("ts"), col("x.d").as("d"))
    val net = deltas.groupBy("ts").agg(sum(col("d")).as("d"))
    val inDay = Window.partitionBy(date_trunc("day", col("ts"))).orderBy("ts")
    val daily = net
      .select(date_trunc("day", col("ts")).cast(DateType).as("day"),
        col("d"), sum(col("d")).over(inDay).as("run_in_day"))
      .groupBy("day")
      .agg(max(col("run_in_day")).as("max_run"), sum(col("d")).as("day_net"))
    val carry = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .select(col("day"),
        (coalesce(sum(col("day_net")).over(carry), lit(0L)) +
          greatest(lit(0L), col("max_run")))
          .cast(LongType).as("max_conc"))
      .orderBy("day")
  }

  /** Last-touch purchase attribution: each purchase credits the
    * event_type of the user's immediately-preceding event when it landed
    * within 30 minutes, else 'direct' — the marketing-analytics sibling
    * of q_transitions (same lag machinery, conversion-centric question).
    * One user_id window shuffle, then a tiny channel rollup; the 30-min
    * recency test is exact BIGINT microseconds.
    *
    * Determinism: the (ts, event_id) window order is total; purchases
    * preceded by a same-timestamp event resolve by event_id — no
    * arbitrary winners. */
  val attribution: Q = Q.checked(
    "q_attribution",
    Tables.EventsCte +
      """,
        |lagd AS (
        |  SELECT event_type, ts, user_id,
        |    lag(event_type) OVER win AS prev_type,
        |    lag(ts) OVER win AS prev_ts
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |attr AS (
        |  SELECT CASE WHEN prev_ts IS NULL
        |                OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 'direct' ELSE prev_type END AS channel
        |  FROM lagd WHERE event_type = 'purchase')
        |SELECT channel, count(*) AS n_purchases
        |FROM attr GROUP BY channel ORDER BY channel""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("event_type"), col("ts"), col("user_id"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(win))
      .withColumn("prev_ts", lag(col("ts"), 1).over(win))
      .filter(col("event_type") === "purchase")
      .select(when(col("prev_ts").isNull
          || unix_micros(col("ts")) - unix_micros(col("prev_ts"))
            > 1800000000L, "direct")
        .otherwise(col("prev_type")).as("channel"))
      .groupBy("channel").agg(count(lit(1)).as("n_purchases"))
      .orderBy("channel")
  }

  /** Trailing-7-day distinct active users per day — the DAU/WAU shape.
    * Exact rolling distinct is not windowable (distinct doesn't
    * decompose), so: distinct (day, user) first (the only corpus-sized
    * shuffle), then each survivor fans out to the ≤7 window-end days it
    * covers (map-only explode of a 7-element sequence), then a second
    * distinct+count at (window_day, user) grain. Work is O(active-pairs
    * × 7), independent of raw event volume — the 100 TB path; windows
    * whose end day has no events are not emitted (both engines
    * identically).
    *
    * Dates derive from UTC µs timestamps — both engines truncate the
    * same values. */
  val rollingDistinct: Q = Q.checked(
    "q_rolling_distinct",
    Tables.EventsCte +
      """,
        |du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM ev),
        |days AS (SELECT DISTINCT day FROM du),
        |fan AS (SELECT du.day + CAST(o.o AS INTEGER) AS win_end, du.user_id
        |        FROM du, (SELECT unnest(range(0, 7)) AS o) o)
        |SELECT f.win_end, count(DISTINCT f.user_id) AS n_users
        |FROM fan f JOIN days d ON f.win_end = d.day
        |GROUP BY f.win_end ORDER BY f.win_end""".stripMargin
  ) { (s, dir) =>
    val du = Tables.events(s, dir)
      .select(col("ts").cast(DateType).as("day"), col("user_id"))
      .distinct()
    val days = du.select(col("day").as("d")).distinct()
    val fan = du
      .select(explode(expr("sequence(0, 6)")).as("o"), col("day"),
        col("user_id"))
      .select(date_add(col("day"), col("o")).as("win_end"), col("user_id"))
    fan.join(broadcast(days), col("win_end") === col("d"))
      .groupBy("win_end")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("win_end")
  }

  /** Time-weighted average value per user — the metrics/IoT aggregate
    * where a reading holds until the next one: Σ valueᵢ·Δtᵢ / Σ Δtᵢ over
    * consecutive-event intervals (the last event carries no duration;
    * single-event users have no intervals and are excluded identically
    * on both engines).
    *
    * Determinism: the whole numerator stays in exact BIGINT
    * cent-microseconds — v100 = floor(value·100 + 0.5) (2-dp money never
    * ties) times Δt µs, summed order-free — because a DECIMAL numerator
    * would drift: DuckDB's decimal→double conversion divides after an
    * int128→double cast (two roundings) while the JVM converts in one,
    * disagreeing at the last ulp (measured). int64→double is correctly
    * rounded on both engines, so the final fixed tree
    * num/100/span is bit-identical. One user_id window shuffle,
    * aggregation at user grain. */
  val timeWeighted: Q = Q.checked(
    "q_time_weighted",
    Tables.EventsCte +
      """,
        |iv AS (
        |  SELECT user_id,
        |    CAST(floor(value * 100 + 5.0e-1) AS BIGINT) AS v100,
        |    epoch_us(lead(ts) OVER win) - epoch_us(ts) AS dt
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id,
        |  CAST(sum(v100 * dt) AS DOUBLE) / 100
        |    / CAST(sum(dt) AS DOUBLE) AS twa,
        |  CAST(sum(dt) AS BIGINT) AS span_us
        |FROM iv WHERE dt IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"),
        floor(col("value") * 100 + lit(0.5)).cast(LongType).as("v100"),
        col("ts"), col("event_id"))
      .withColumn("dt",
        unix_micros(lead(col("ts"), 1).over(win)) - unix_micros(col("ts")))
      .filter(col("dt").isNotNull)
      .groupBy("user_id")
      .agg((sum(col("v100") * col("dt")).cast(DoubleType) / lit(100)
          / sum(col("dt")).cast(DoubleType)).as("twa"),
        sum(col("dt")).cast(LongType).as("span_us"))
      .orderBy("user_id")
  }

  /** Interval self-join: ordered event pairs per user within a 5-minute
    * horizon, counted by type pair — the batch twin of the stream-stream
    * interval join ([[graft.streaming.StreamOps]]'s watermark-bounded
    * state): identical semantics, so a batch backfill and the live
    * stream agree. The join is user-keyed (one shuffle) with the time
    * bound as a range predicate; per-user event counts bound the pair
    * fan-out, and the total (ts, event_id) order makes the "ordered"
    * predicate deterministic for same-timestamp events.
    */
  val intervalSelfJoin: Q = Q.checked(
    "q_interval_join",
    Tables.EventsCte +
      """
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_pairs
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id
        | AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
        |GROUP BY type_a, type_b ORDER BY type_a, type_b""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select("user_id", "ts", "event_id", "event_type")
    val a = ev.select(col("user_id"), col("ts").as("ts_a"),
      col("event_id").as("id_a"), col("event_type").as("type_a"))
    val b = ev.select(col("user_id").as("uid_b"), col("ts").as("ts_b"),
      col("event_id").as("id_b"), col("event_type").as("type_b"))
    a.join(b, col("user_id") === col("uid_b")
        && (col("ts_a") < col("ts_b")
          || (col("ts_a") === col("ts_b") && col("id_a") < col("id_b")))
        && unix_micros(col("ts_b")) - unix_micros(col("ts_a"))
          <= 300000000L)
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("type_a", "type_b")
  }

  /** Temporal dedup — the batch twin of streaming
    * `dropDuplicatesWithinWatermark`: an event is dropped when the
    * PREVIOUS event with the same (user_id, event_type) lies within 6
    * hours, keeping the first of each burst (retry storms, double-fires,
    * at-least-once replays). One shuffle on user_id for the lag window;
    * the gap compare is exact integer microseconds (unix_micros /
    * epoch_us — no float time arithmetic to diverge on). The per-key
    * order (ts, event_id) is total, so prev_us is deterministic. At
    * 100 TB this is the shape that works: hash-partition by user, sort
    * within partition — never a global order. */
  val eventDedupWindow: Q = Q.checked(
    "q_event_dedup_window",
    Tables.EventsCte +
      """,
        |lagged AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |      AS gap_us
        |  FROM ev)
        |SELECT event_id, user_id, event_type
        |FROM lagged
        |WHERE gap_us IS NULL OR gap_us >= 21600000000
        |ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    val key = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(key))
          .as("gap_us"))
      .filter(col("gap_us").isNull || col("gap_us") >= 21600000000L)
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** Day-of-week seasonality profile per event type: counts + integer
    * milli share — the weekly-rhythm fingerprint behind capacity
    * planning and anomaly baselines. One (dow × type) hash aggregate
    * (≤ 7·|types| keys, map-side collapsed); totals re-aggregate from
    * the tiny profile frame. Dialect pin: Spark dayofweek is 1=Sunday,
    * DuckDB's is 0=Sunday — the Spark side shifts by one so both
    * engines emit the 0-6 convention. */
  val seasonality: Q = Q.checked(
    "q_seasonality",
    Tables.EventsCte +
      """,
        |dcounts AS (
        |  SELECT dayofweek(ts) AS dow, event_type AS et, count(*) AS n
        |  FROM ev GROUP BY 1, 2),
        |t AS (SELECT et, CAST(sum(n) AS BIGINT) AS tot FROM dcounts
        |      GROUP BY 1)
        |SELECT dcounts.et AS event_type, CAST(dow AS BIGINT) AS dow,
        |  CAST(n AS BIGINT) AS n,
        |  1000 * CAST(n AS BIGINT) // t.tot AS share_milli
        |FROM dcounts JOIN t ON dcounts.et = t.et
        |ORDER BY event_type, dow""".stripMargin
  ) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy((dayofweek(col("ts")) - 1).cast(LongType).as("dow"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val t = d.groupBy("event_type").agg(sum(col("n")).cast(LongType).as("tot"))
    d.join(broadcast(t), "event_type")
      .select(col("event_type"), col("dow"), col("n").cast(LongType).as("n"),
        expr("1000 * CAST(n AS BIGINT) div tot").as("share_milli"))
      .orderBy("event_type", "dow")
  }

  /** Lag-1 autocorrelation of the daily event count — "does yesterday
    * predict today", the one-number seasonality/trend screen a metrics
    * pipeline alarms on. The corpus collapses to calendar-day grain
    * FIRST (bounded by the time span, not the data — the documented
    * calendar-frame exception), so the lag window and the closed-form
    * Pearson over exact BIGINT moments run on a tiny frame; the only
    * IEEE ops are the chisq-recipe double casts + one division. */
  val autocorrDaily: Q = Q.checked(
    "q_autocorr_daily",
    Tables.EventsCte +
      """,
        |daily AS (
        |  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY 1),
        |lagged AS (
        |  SELECT n, lag(n) OVER (ORDER BY day) AS pn FROM daily),
        |p AS (SELECT n, pn FROM lagged WHERE pn IS NOT NULL),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS sx, CAST(sum(pn) AS BIGINT) AS sy,
        |    CAST(sum(n*pn) AS BIGINT) AS sxy,
        |    CAST(sum(n*n) AS BIGINT) AS sxx, CAST(sum(pn*pn) AS BIGINT) AS syy
        |  FROM p)
        |SELECT k,
        |  CAST(CAST(floor((CAST(k AS DOUBLE)*CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(k AS DOUBLE)*CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |     * sqrt(CAST(k AS DOUBLE)*CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
        |    * 1e6 + 5.0e-1) AS BIGINT) AS DOUBLE) / 1e6 AS autocorr_lag1
        |FROM m""".stripMargin
  ) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).cast(LongType).as("n"))
    // calendar-day frame: bounded by the time span, never the corpus
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val p = daily.withColumn("pn", lag(col("n"), 1).over(w))
      .filter(col("pn").isNotNull)
    def d(c: String) = col(c).cast(DoubleType)
    p.agg(count(lit(1)).as("k"),
        sum(col("n")).as("sx"), sum(col("pn")).as("sy"),
        sum(col("n") * col("pn")).as("sxy"),
        sum(col("n") * col("n")).as("sxx"),
        sum(col("pn") * col("pn")).as("syy"))
      .select(col("k"),
        (floor((d("k") * d("sxy") - d("sx") * d("sy"))
          / (sqrt(d("k") * d("sxx") - d("sx") * d("sx"))
            * sqrt(d("k") * d("syy") - d("sy") * d("sy")))
          * lit(1e6) + lit(0.5)).cast(LongType).cast(DoubleType) / lit(1e6))
          .as("autocorr_lag1"))
  }

  /** CUSUM changepoint per event type: the day where the cumulative
    * daily-count sum deviates most from the uniform-rate line — the
    * classic "when did behavior shift" screen over a metric stream. The
    * statistic is kept EXACT by clearing denominators: with k days,
    * total S and prefix S_i at day i, the deviation is
    * |k·S_i − i·S| (the CUSUM distance ×k — same argmax, pure BIGINT),
    * argmax ties broken by the EARLIEST day. Reported per type with the
    * day, the scaled statistic, and the day count.
    *
    * Scale: the corpus collapses to (type, day) counts FIRST (the
    * bounded calendar-grain collapse), so the prefix-sum and argmax
    * windows run over ≤ span-days rows per type — never the events. */
  val changepoint: Q = Q.checked(
    "q_changepoint",
    Tables.EventsCte +
      """,
        |daily AS (
        |  SELECT event_type AS et, date_trunc('day', ts) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |pre AS (
        |  SELECT et, day, c,
        |    CAST(sum(c) OVER (PARTITION BY et ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS s_i,
        |    CAST(row_number() OVER (PARTITION BY et ORDER BY day) AS BIGINT)
        |      AS i,
        |    CAST(sum(c) OVER (PARTITION BY et) AS BIGINT) AS s,
        |    CAST(count(*) OVER (PARTITION BY et) AS BIGINT) AS k
        |  FROM daily),
        |stat AS (
        |  SELECT et, day, k, abs(k * s_i - i * s) AS d,
        |    row_number() OVER (PARTITION BY et
        |      ORDER BY abs(k * s_i - i * s) DESC, day) AS rk
        |  FROM pre)
        |SELECT et AS event_type, CAST(day AS DATE) AS cp_day,
        |  d AS cusum_k, k AS n_days
        |FROM stat WHERE rk = 1 ORDER BY event_type""".stripMargin
  ) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).cast(LongType).as("c"))
    val byType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val ordered = byType.orderBy("day")
    val pre = daily
      .withColumn("s_i", sum(col("c")).over(ordered.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("i", row_number().over(ordered).cast(LongType))
      .withColumn("s", sum(col("c")).over(byType))
      .withColumn("k", count(lit(1)).over(byType))
      .withColumn("d", abs(col("k") * col("s_i") - col("i") * col("s")))
    pre.withColumn("rk", row_number().over(
        byType.orderBy(col("d").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").cast(DateType).as("cp_day"),
        col("d").as("cusum_k"), col("k").as("n_days"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(tumbling, sliding, sessionBatch, funnel, retention,
    timeRollup, growthMom, transitions, peakConcurrency, attribution,
    rollingDistinct, timeWeighted, intervalSelfJoin, eventDedupWindow,
    seasonality, autocorrDaily, changepoint)
}
