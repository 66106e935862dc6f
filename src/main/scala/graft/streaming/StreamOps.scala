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

  /** Stream-stream interval join: click events matched to the view (by
    * the same user) that happened at most `within` BEFORE them. Both
    * sides carry watermarks, so Spark bounds the join state — buffered
    * rows age out once the opposite side's watermark passes the interval
    * (without the time bound the state grows forever; with it, state
    * size ≈ rate × interval, the 100 TB-safe shape). Append mode: a pair
    * is emitted once it can no longer change. The same code runs on
    * batch frames (watermark is a no-op there), which is how
    * StreamingSpec asserts parity. */
  def clicksAfterViews(views: DataFrame, clicks: DataFrame,
                       within: String = "1 hour",
                       delay: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("ts", delay)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", delay)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    c.join(v, col("c_user") === col("v_user") &&
      col("view_ts") <= col("click_ts") &&
      col("view_ts") >= col("click_ts") - expr(s"INTERVAL $within"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** LEFT OUTER stream-stream interval join: every view paired with the
    * clicks it produced within `within` — or emitted ONCE with NULL
    * click columns after the click-side watermark proves no match can
    * arrive. The unmatched-row emission is what the inner join cannot
    * express ("which views never converted" — the funnel-drop feed),
    * and the watermark is what makes it legal in append mode: a NULL
    * pair is final only once click event time has provably passed
    * view_ts + within. State stays bounded exactly as in
    * [[clicksAfterViews]] (rate × interval); the same code runs on
    * batch frames, where the outer join needs no watermark at all. */
  def viewsWithClicks(views: DataFrame, clicks: DataFrame,
                      within: String = "1 hour",
                      delay: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("ts", delay)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", delay)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    v.join(c, col("c_user") === col("v_user") &&
      col("click_ts") >= col("view_ts") &&
      col("click_ts") <= col("view_ts") + expr(s"INTERVAL $within"),
      "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Stream-static enrichment: a streaming feed joined to a static dim
    * frame — the dim side is re-read per micro-batch (picks up slowly
    * changing dims) and broadcast when small; no streaming state at all. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

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

  final case class Transition(event_type: String, next_type: String)

  /** Per-user first-order transition pairs as a stream — the stateful
    * twin of q_transitions' lead() window: state = the user's last event
    * position + type, each trigger sorts ITS OWN rows into (ts, event_id)
    * order and emits one (prev → curr) pair per consecutive step,
    * starting from the carried state. A row at or behind the carried
    * position (late data straddling a trigger boundary) is DROPPED, not
    * silently appended out of order — the stored position is the
    * enforcement point, so the sequence each pair is drawn from is
    * guaranteed monotone even under a disordered feed (the late row's
    * own transition is lost; a full repair needs a watermark +
    * event-time sort upstream). Downstream, the same
    * groupBy(pair).count() as the batch query completes the matrix. */
  def transitionPairs(events: DataFrame)
                     (implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    events.selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id",
        "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[(Long, Long, String)]) =>
          val ordered = rows.toSeq.sortBy(r => (r._2, r._3))
          var prev = state.getOption
          val out = Seq.newBuilder[Transition]
          ordered.foreach { r =>
            val pos = (r._2, r._3)
            if (!prev.exists(p => Ordering[(Long, Long)]
                .gteq((p._1, p._2), pos))) {
              prev.foreach(p => out += Transition(p._3, r._4))
              prev = Some((r._2, r._3, r._4))
            }
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  final case class Kept(event_id: Long, user_id: Long, event_type: String)

  /** Kept-chain throttle as a STREAM — the stateful twin of the batch
    * q_throttle_chain: state = the last survivor's event-time µs per
    * (user, type); each trigger sorts ITS OWN rows into (ts, event_id)
    * order and admits a row only ≥ `gapUs` after the last survivor.
    * Like [[transitionPairs]], a row at or behind the carried position
    * (late data straddling a trigger boundary) is dropped — the chain's
    * greedy decision is already made, and replaying it out of order
    * would admit events a correct sequential run rejected. Equality
    * with the batch operator holds when triggers deliver events in
    * event-time order across batches (StreamingSpec feeds exactly
    * that); under disorder the late row's admission decision is lost
    * and the stream's chain may diverge from the batch chain — the
    * gap invariant on what IS emitted still holds. */
  def throttleChain(events: DataFrame, gapUs: Long)
                   (implicit spark: SparkSession): Dataset[Kept] = {
    import spark.implicits._
    events.selectExpr("event_id", "user_id", "event_type",
        "unix_micros(ts) AS us")
      .as[(Long, Long, String, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Long, Kept](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[Long]) =>
          val ordered = rows.toSeq.sortBy(r => (r._4, r._1))
          var lastKept = state.getOption.getOrElse(Long.MinValue)
          val out = Seq.newBuilder[Kept]
          ordered.foreach { case (id, u, t, us) =>
            if (us > lastKept || lastKept == Long.MinValue) {
              if (lastKept == Long.MinValue || us - lastKept >= gapUs) {
                out += Kept(id, u, t); lastKept = us
              }
            } // at-or-behind the carried position: drop (late data)
          }
          if (lastKept != Long.MinValue) state.update(lastKept)
          out.result().iterator
      }
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
