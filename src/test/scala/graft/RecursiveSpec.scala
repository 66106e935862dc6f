package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WITH RECURSIVE surface (ops/RecursiveOps.scala): the recursion result
  * must equal the independent gaps-and-islands WINDOW formulation of the
  * same streak semantics — two completely different execution strategies
  * (iterate-until-empty vs two windows) agreeing on every histogram
  * bucket. Also pins the engine constraint the scaladoc claims: UNION
  * (distinct) recursion is rejected loudly, so the DAG-walk discipline
  * is mandatory, not stylistic.
  */
class RecursiveSpec extends AnyFunSuite with SparkFixture {

  test("q_reorder_streak == gaps-and-islands window formulation") {
    // r16: the ENGINE path is now the window twin; the WITH RECURSIVE
    // strategy (streakRecursive) is run here as the independent
    // cross-check, so both strategies stay exercised and pinned equal.
    val rec = ops.RecursiveOps.streakRecursive(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eng = ops.RecursiveOps.reorderStreak.fn(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(eng === rec)

    // islands: a new island starts where the gap to the previous order
    // exceeds 180 days; island id = running count of starts; streak len
    // = island size; per-customer max, then histogram.
    val byCk = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val win = Tables.orders(spark, Sf)
      .select("o_custkey", "o_orderdate", "o_orderkey")
      .withColumn("prev_d", lag("o_orderdate", 1).over(byCk))
      .withColumn("starts",
        when(col("prev_d").isNull ||
          col("o_orderdate") > col("prev_d") + expr("INTERVAL 180 DAYS"),
          1).otherwise(0))
      .withColumn("island", sum("starts").over(
        byCk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("o_custkey", "island").agg(count(lit(1)).as("len"))
      // the recursion caps streaks at 8 (depth = a query constant, not a
      // data property) — the window twin applies the identical cap
      .groupBy("o_custkey").agg(least(max("len"), lit(8L)).as("max_len"))
      .groupBy("max_len").agg(count(lit(1)).as("n_customers"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(rec === win)
    assert(rec.nonEmpty && rec.values.sum > 0)
  }

  test("UNION-distinct recursion is rejected loudly (DAG-walk is mandatory)") {
    val e = intercept[Exception] {
      spark.sql("WITH RECURSIVE r(n) AS (SELECT 1 UNION " +
        "SELECT CASE WHEN n >= 3 THEN 1 ELSE n + 1 END FROM r) " +
        "SELECT sum(n) FROM r").collect()
    }
    assert(e.getMessage.contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"))
  }

  test("runaway recursion hits the level limit loudly, never spins") {
    val e = intercept[Exception] {
      spark.sql("WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL " +
        "SELECT n + 1 FROM r) SELECT count(*) FROM r").collect()
    }
    assert(e.getMessage.toLowerCase.contains("recursion"),
      s"expected a recursion-limit error, got: ${e.getMessage.take(200)}")
  }
}
