package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression pins for the late-round-7 oracle queries whose
  * scale guarantees aren't already asserted elsewhere (TpchSpec covers
  * four TPC-H members; AsOfJoinSpec covers the native operator). Each
  * assertion is a claim the scaladoc makes — breaking the plan must
  * break the build, not wait for a 100 TB incident.
  */
class LateQueryPlanSpec extends AnyFunSuite with SparkFixture {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q_volume_shipping / q_market_share / q_product_profit: dims broadcast, ONE fact shuffle") {
    Seq(ops.TpchOps.volumeShipping, ops.TpchOps.marketShare,
      ops.TpchOps.productProfit).foreach { q =>
      val plan = q.fn(spark, Sf).queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"${q.name}: dims must broadcast:\n$plan")
      // the fact side may shuffle for lineitem⋈orders + the final agg +
      // output sort; what must NOT happen is a shuffle per dim join
      val exchanges = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning"))
      assert(exchanges <= 4,
        s"${q.name}: $exchanges hash exchanges — a dim join shuffled the fact:\n$plan")
    }
  }

  test("q_large_orders: HAVING filters at order grain before any dim join") {
    val plan = formatted(ops.TpchOps.largeOrders.fn(spark, Sf))
    // the quantity-sum filter must sit directly on the first aggregate,
    // not after the customer join
    val aggIdx = plan.indexOf("HashAggregate")
    val joinIdx = plan.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0)
    assert(plan.contains("TakeOrderedAndProject"),
      "top-100 degenerated to a global sort")
  }

  test("q_waiting_supplier: one (ok,sk) collapse, ok-PARTITIONED window, single lineitem scan, TakeOrdered") {
    val plan = ops.TpchOps.waitingSupplier.fn(spark, Sf)
      .queryExecution.sparkPlan.toString
    // r15: the per-order max/count ride a window over the ok partition
    // (bounded — suppliers per order is a generator constant), replacing
    // the r14 order-grain aggregate joined back, which evaluated the
    // (ok, sk) collapse twice. The window must be PARTITIONED (a
    // partition-less window here would be the single-task cliff) and
    // lineitem must be scanned exactly once.
    assert(plan.contains("windowspecdefinition(ok#"),
      s"waiting-supplier's window must partition by ok:\n$plan")
    assert(!plan.contains("windowspecdefinition(,")
      && !plan.contains("windowspecdefinition( "),
      s"partition-less window:\n$plan")
    assert(plan.linesIterator
      .count(_.contains("lineitem.parquet")) == 1,
      s"lineitem scanned more than once:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q_ks_test: corpus collapses to cents grain BEFORE the bounded cumulative window") {
    val df = ops.StatOps.ksTest.fn(spark, Sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // the window input must be the (cents, c1, c2) aggregate, never the
    // raw event rows: in the optimized plan the Window sits above the
    // grain-collapsing Aggregate
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("Aggregate")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < aggIdx,
      s"window does not sit above the cents-grain aggregate:\n$plan")
    assert(formatted(df).contains("TakeOrderedAndProject"),
      "argmax degenerated to a global sort")
  }

  test("q_basket_pairs: ONE pair-generation shuffle, supports broadcast back, TakeOrdered") {
    val df = ops.GraphOps.basketPairs.fn(spark, Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"per-item supports must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-15 degenerated to a global sort")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_reorder_streak: engine path is the one-shuffle window twin; " +
      "the recursive twin reads the materialized ranked relation") {
    // r16: the ENGINE path is the gaps-and-islands window formulation —
    // every window must partition by ck (one o_custkey exchange, no
    // recursion, no partition-less window), and no join remains
    val df = ops.RecursiveOps.reorderStreak.fn(spark, Sf)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"window twin must ride ck-partitioned windows:\n${df.queryExecution.sparkPlan}")
    assert(df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "window twin must not join")
    // the RECURSIVE twin (spec cross-check) still materializes `ranked`
    // BEFORE the SQL runs — a window inside the recursive plan would be
    // re-evaluated once per iteration
    val rec = ops.RecursiveOps.streakRecursive(spark, Sf)
    val plan = rec.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition"),
      s"a window leaked inside the recursion (re-evaluated per step):\n$plan")
  }
}
