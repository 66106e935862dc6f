package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join ([[graft.plans.AsOfJoin]] — custom LogicalPlan +
  * SparkStrategy + partition-wise merge SparkPlan): semantics against the
  * window twin and a hand-checked model, the physical plan shape (no
  * window, no union, merge exec present), partitioning invariance, the
  * tolerance contract, and the loud API guards. Oracle-grade value
  * correctness is the driver's q_asof_native row (same DuckDB oracle as
  * q_join_asof).
  */
class AsOfJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def mkLeft(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("k", "t", "id")
  private def mkRight(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("rk", "rt", "rid")

  test("hand-checked model: strictly-before match, ties on (t, id), outer nulls") {
    val left = mkLeft(Seq(
      (1L, 100L, 10L), // matches right (1,90,1)
      (1L, 100L, 11L), // same instant, later id — still (1,90,1): right at t=100 has id 12 > 11? no row
      (1L, 200L, 13L), // matches (1,150,2)
      (2L, 50L, 14L),  // right for k=2 starts later → null
      (3L, 10L, 15L))) // no right rows for k=3 → null
    val right = mkRight(Seq(
      (1L, 90L, 1L), (1L, 150L, 2L), (1L, 300L, 3L),
      (2L, 60L, 4L)))
    val out = AsOfJoin.asof(left, right,
        key = ("k", "rk"), time = ("t", "rt"), tie = ("id", "rid"))
      .select("k", "t", "id", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out === Set(
      (1L, 100L, 10L, 1L), (1L, 100L, 11L, 1L), (1L, 200L, 13L, 2L),
      (2L, 50L, 14L, -1L), (3L, 10L, 15L, -1L)))
  }

  test("same-instant tie: a right row at (t, id') matches iff id' < id") {
    val left = mkLeft(Seq((1L, 100L, 5L), (1L, 100L, 2L)))
    val right = mkRight(Seq((1L, 100L, 3L)))
    val out = AsOfJoin.asof(left, right,
        key = ("k", "rk"), time = ("t", "rt"), tie = ("id", "rid"))
      .select("id", "rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out === Map(5L -> 3L, 2L -> -1L))
  }

  test("tolerance: a stale match yields NULL, not an older in-tolerance row") {
    val left = mkLeft(Seq((1L, 1000L, 1L)))
    val right = mkRight(Seq((1L, 100L, 2L), (1L, 900L, 3L)))
    // latest match is rt=900 (staleness 100); with tol=50 it is stale →
    // NULL — the engine must NOT fall back to rt=100
    val strict = AsOfJoin.asof(mkLeft(Seq((1L, 1000L, 1L))), right,
        key = ("k", "rk"), time = ("t", "rt"), tie = ("id", "rid"),
        toleranceUs = Some(50L))
      .select("rid").collect()
    assert(strict.head.isNullAt(0))
    val loose = AsOfJoin.asof(left, right,
        key = ("k", "rk"), time = ("t", "rt"), tie = ("id", "rid"),
        toleranceUs = Some(100L))
      .select("rid").collect()
    assert(loose.head.getLong(0) === 3L)
  }

  test("q_asof_native == the q_join_asof window twin, row for row") {
    val native = ops.JoinOps.asofNative.fn(spark, Sf).collect()
    val window = ops.JoinOps.joinAsof.fn(spark, Sf).collect()
    assert(native.length === window.length && native.length > 0)
    native.zip(window).foreach { case (a, b) => assert(a === b) }
  }

  test("plan: AsOfJoinExec present; no WindowExec, no Union, one exchange per side") {
    val df = ops.JoinOps.asofNative.fn(spark, Sf)
    df.collect()
    // AQE's toString prints Final AND Initial plans — count on the
    // final section only
    val s = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(s.contains("AsOfJoin"), s"native exec missing:\n$s")
    assert(!s.contains("WindowExec") && !s.contains("Window "),
      s"window leaked into the native plan:\n$s")
    assert(!s.contains("Union"), s"union leaked into the native plan:\n$s")
    val exchanges = s.linesIterator.count(_.contains("+- Exchange"))
    assert(exchanges <= 3, // one per side (+1 for the output orderBy)
      s"too many exchanges ($exchanges):\n$s")
  }

  test("partitioning invariance: pre-shuffled inputs give identical results") {
    val ev = Tables.events(spark, Sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"))
    def run(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame) =
      AsOfJoin.asof(l, r, ("user_id", "r_user_id"), ("ts", "r_ts"),
          ("event_id", "r_event_id"))
        .select("event_id", "r_event_id")
        .collect().map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val base = run(purchases, clicks)
    val shuffled = run(purchases.repartition(7, col("event_id")),
      clicks.repartition(3))
    assert(base === shuffled && base.nonEmpty)
  }

  test("API guards: overlapping attributes and non-orderable types fail loudly") {
    val ev = Tables.events(spark, Sf)
    val overlapped = intercept[IllegalArgumentException] {
      AsOfJoin.asof(ev, ev, ("user_id", "user_id"), ("ts", "ts"),
        ("event_id", "event_id"))
    }
    assert(overlapped.getMessage.contains("alias one side"))
    val badType = intercept[IllegalArgumentException] {
      AsOfJoin.asof(
        ev.select(col("event_type"), col("ts"), col("event_id")),
        ev.select(col("event_type").as("r_et"), col("ts").as("r_ts"),
          col("event_id").as("r_id")),
        ("event_type", "r_et"), ("ts", "r_ts"), ("event_id", "r_id"))
    }
    assert(badType.getMessage.contains("must be BIGINT or TIMESTAMP"))
  }

  test("asymmetric sides under AQE: tiny left vs large right stays co-partitioned") {
    // AQE coalesces shuffle reads; a custom binary node must land in ONE
    // coalesce group or zipPartitions throws on unequal partition counts.
    // 5 probe rows vs the full click table is the worst asymmetry the
    // coalescer could split.
    val ev = Tables.events(spark, Sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"))
    val probes = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").limit(5)
    val out = AsOfJoin.asof(probes, clicks,
      ("user_id", "r_user_id"), ("ts", "r_ts"),
      ("event_id", "r_event_id"))
    assert(out.count() === 5)
    // values spot-check against the window twin restricted to the probes
    val ids = out.select("event_id").collect().map(_.getLong(0)).toSet
    val twin = ops.JoinOps.joinAsof.fn(spark, Sf)
      .filter(col("purchase_id").isin(ids.toSeq: _*))
      .select(col("purchase_id"),
        coalesce(col("last_click_id"), lit(-1L)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.select(col("event_id"),
        coalesce(col("r_event_id"), lit(-1L)).as("c")).collect()
      .foreach(r => assert(twin(r.getLong(0)) === r.getLong(1)))
  }

  test("empty right side: every left row null-extends") {
    val left = mkLeft(Seq((1L, 1L, 1L), (2L, 2L, 2L)))
    val right = mkRight(Seq.empty)
    val out = AsOfJoin.asof(left, right,
        key = ("k", "rk"), time = ("t", "rt"), tie = ("id", "rid"))
      .select("rid").collect()
    assert(out.length === 2 && out.forall(_.isNullAt(0)))
  }
}
