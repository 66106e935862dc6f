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

  /** Batch sessionization (gaps-and-islands): a new session starts when the
    * per-user gap exceeds 30 minutes. Two window passes over one shuffle by
    * user_id, then a per-user rollup; span arithmetic stays in exact
    * BIGINT microseconds. */
  val sessionBatch: Q = Q.checked(
    "q_session_batch",
    Tables.EventsCte +
      """,
        |flagged AS (
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
        |  FROM flagged),
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
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val usec = unix_micros(col("ts"))
    val newSession = when(lag(col("ts"), 1).over(byUser).isNull
        || usec - unix_micros(lag(col("ts"), 1).over(byUser)) > 1800000000L, 1)
      .otherwise(0)
    Tables.events(s, dir)
      .withColumn("new_session", newSession)
      .withColumn("session_id",
        sum(col("new_session"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
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

  val all: Seq[Q] = Seq(tumbling, sliding, sessionBatch)
}
