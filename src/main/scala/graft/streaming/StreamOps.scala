package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
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

  final case class Milestone(user_id: Long, milestone: Long)

  /** flatMapGroupsWithState (0..n outputs per group per trigger): emit a
    * row each time a user's cumulative event count crosses a multiple of
    * `every`. Batch oracle: floor(count/every) milestones per user. */
  def milestones(events: DataFrame, every: Int)
                (implicit spark: SparkSession): Dataset[Milestone] = {
    import spark.implicits._
    events.selectExpr("user_id").as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, Milestone](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + rows.size
          state.update(after)
          ((before / every + 1) to (after / every))
            .map(m => Milestone(uid, m * every)).iterator
      }
  }

  final case class UserMax(user_id: Long, max_value: Double)

  /** transformWithState (Spark 4 StatefulProcessor API, RocksDB-backed
    * state): running per-user maximum, one update row per key per batch. */
  class RunningMaxProcessor
      extends StatefulProcessor[Long, (Long, Double), UserMax] {
    @transient private var maxState: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      maxState = getHandle.getValueState[Double]("max",
        Encoders.scalaDouble, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                                 timerValues: TimerValues): Iterator[UserMax] = {
      val prior =
        if (maxState.exists()) maxState.get() else Double.NegativeInfinity
      val mx = rows.foldLeft(prior)((a, r) => math.max(a, r._2))
      maxState.update(mx)
      Iterator.single(UserMax(key, mx))
    }
  }

  /** Requires spark.sql.streaming.stateStore.providerClass =
    * RocksDBStateStoreProvider (transformWithState's state-v2 backend). */
  def runningMax(events: DataFrame)
                (implicit spark: SparkSession): Dataset[UserMax] = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningMaxProcessor,
        TimeMode.None(), OutputMode.Update())
  }

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
