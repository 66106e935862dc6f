package graft

import graft.ops.JoinScaleOps
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-join techniques: the invariant under test is that salting and
  * bloom pre-pruning change the PLAN but never the result, plus the bloom
  * SQL surface's no-false-negative contract. */
class JoinScaleSpec extends AnyFunSuite with SparkFixture
    with AdaptiveSparkPlanHelper {

  private def plainRevenue(extraFilter: String): Seq[(Long, Double)] = {
    val li = Tables.lineitem(spark, Sf)
    val ord = Tables.orders(spark, Sf).where(extraFilter)
    Seq(li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(24,6)")).cast("double"))
      .collect()(0)).map(r => (r.getLong(0), r.getDouble(1)))
  }

  test("q_join_skew equals the plain (unsalted) join, row for row") {
    val li = Tables.lineitem(spark, Sf)
    val ord = Tables.orders(spark, Sf)
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(24,6)")).cast("double").as("revenue"))
    val salted = JoinScaleOps.joinSkew.fn(spark, Sf)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q_join_skew spreads each order key across salt buckets on the fact side") {
    // the salt column must actually take many values for one join key's
    // worth of fact rows — otherwise it isn't splitting a hot key
    val distinctSalts = Tables.lineitem(spark, Sf)
      .select(pmod(xxhash64(col("l_partkey"), col("l_suppkey"),
        col("l_linenumber")), lit(8)).as("salt"))
      .distinct().count()
    assert(distinctSalts === 8L)
  }

  test("q_join_bloom equals the plain join (bloom false positives are re-filtered)") {
    val Seq((n, rev)) = plainRevenue("o_orderpriority = '1-URGENT'")
    val r = JoinScaleOps.joinBloom.fn(spark, Sf).collect()(0)
    assert(r.getLong(0) === n)
    assert(r.getDouble(1) === rev)
  }

  test("q_join_skew plans the hinted shuffled hash join (no sorts on unique salted keys)") {
    val df = JoinScaleOps.joinSkew.fn(spark, Sf)
    df.collect()
    val nodes = collect(df.queryExecution.executedPlan) { case n => n.nodeName }
    assert(nodes.exists(_.contains("ShuffledHashJoin")),
      s"expected ShuffledHashJoin from the hint, got: ${nodes.distinct}")
    assert(!nodes.exists(_.contains("SortMergeJoin")),
      "sort-merge crept back into the salted join")
  }

  test("q_join_bloom pushes the bloom probe into the fact-side filter") {
    val df = JoinScaleOps.joinBloom.fn(spark, Sf)
    df.collect()
    val exec = df.queryExecution.executedPlan
    val filters = collect(exec) {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition.toString
    }
    assert(filters.exists(_.contains("might_contain")),
      s"no bloom probe in any Filter, plan:\n$exec")
    assert(collect(exec) { case n => n.nodeName }
      .exists(_.contains("BroadcastHashJoin")),
      "the exact dim join should broadcast the filtered dim")
  }

  test("bloom_agg/bloom_contains: no false negatives, and real pruning on misses") {
    Tables.orders(spark, Sf).createOrReplaceTempView("js_orders")
    Tables.lineitem(spark, Sf).createOrReplaceTempView("js_lineitem")
    // every true member must pass the filter (bloom contract)
    val missed = spark.sql(
      """WITH dim AS (SELECT o_orderkey FROM js_orders
        |             WHERE o_orderpriority = '1-URGENT')
        |SELECT count(*) FROM js_lineitem l JOIN dim d
        |  ON l.l_orderkey = d.o_orderkey
        |WHERE NOT bloom_contains(
        |  (SELECT bloom_agg(o_orderkey) FROM dim), l.l_orderkey)""".stripMargin)
      .collect()(0).getLong(0)
    assert(missed === 0L, "bloom filter dropped a true match")
    // and the prefilter must actually prune: passed rows well under total
    val total = spark.table("js_lineitem").count()
    val passed = spark.sql(
      """WITH dim AS (SELECT o_orderkey FROM js_orders
        |             WHERE o_orderpriority = '1-URGENT')
        |SELECT count(*) FROM js_lineitem
        |WHERE bloom_contains(
        |  (SELECT bloom_agg(o_orderkey) FROM dim), l_orderkey)""".stripMargin)
      .collect()(0).getLong(0)
    assert(passed < total / 2,
      s"bloom prefilter pruned nothing: $passed of $total rows passed")
  }

  test("winsorize broadcast guard: limit=0 forces the shuffle fallback, values identical") {
    val li = Tables.lineitem(spark, Sf)
    val hinted = ops.StatOps.winsorized(li) // under the default limit
    val fallback = ops.StatOps.winsorized(li, broadcastKeyLimit = 0L)
    // past the key-count threshold OUR broadcast hint must be gone; at
    // test scale the planner still auto-broadcasts the tiny frames (that
    // is the designed behavior), so observe the fallback shape with
    // auto-broadcast off — without the hint it must plan a shuffle join
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = ops.StatOps.winsorized(li, broadcastKeyLimit = 0L)
        .queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"limit=0 still broadcast the bounds frame:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"fallback did not plan a shuffle join:\n$plan")
      // and the hint survives auto-broadcast-off when under the limit
      val hintedPlan = ops.StatOps.winsorized(li)
        .queryExecution.sparkPlan.toString
      assert(hintedPlan.contains("BroadcastHashJoin"),
        s"under-limit path lost the broadcast hint:\n$hintedPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert(hinted.exceptAll(fallback).isEmpty &&
      fallback.exceptAll(hinted).isEmpty,
      "guarded paths disagree on values")
  }
}
