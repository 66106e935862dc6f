package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Streaming transforms (SURVEY.md §2.2-J impl rows). Each is written to
  * run identically over a batch or streaming DataFrame, so StreamingSpec
  * can assert batch↔stream parity against the §2.2-J oracle queries.
  */
object StreamOps {

  /** 1-day tumbling count+sum per event_type — the same logical agg as
    * q_tumbling (StreamShapeOps), minus the oracle-only ordering/casts. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_v"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"),
        col("sum_v"))

  /** Watermarked tumbling agg: rows later than `delay` behind the max
    * event time are dropped from their (already closed) window. */
  def tumblingWithWatermark(events: DataFrame, delay: String): DataFrame =
    tumblingCounts(events.withWatermark("ts", delay))

  /** Streaming dedup by event_id within a watermark. */
  def dedupWithinWatermark(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Native session windows (gap-merged): per user, one row per session.
    * Batch twin of the q_session_batch gaps-and-islands formulation; in
    * streaming, call on a watermarked frame (append mode emits a session
    * once the watermark passes its close). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary stateful op: running per-user totals via
    * mapGroupsWithState (batch oracle: groupBy(user_id).count/sum). */
  def runningTotals(events: DataFrame)(implicit spark: SparkSession): Dataset[UserTotal] = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserTotal](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          var (n, t) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; t += v }
          state.update((n, t))
          UserTotal(uid, n, t)
      }
  }
}
