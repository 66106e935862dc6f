package graft

import org.scalatest.funsuite.AnyFunSuite

/** TPC-H completion suite (ops/TpchOps.scala): plan-shape assertions for
  * the scale-critical queries plus a formulation-equivalence law for the
  * one query whose Spark program is deliberately NOT the textbook SQL
  * shape (q_waiting_supplier: two key-grain collapses instead of a
  * correlated EXISTS chain). Value correctness is the driver's DuckDB
  * oracle; these tests pin the PLANS and the reformulation.
  */
class TpchSpec extends AnyFunSuite with SparkFixture {

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_forecast_revenue: all three predicates push to the parquet scan") {
    val plan = formatted(ops.TpchOps.forecastRevenue.fn(spark, Sf))
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate"), s"shipdate not pushed: $pushed")
    assert(pushed.contains("l_discount"), s"discount not pushed: $pushed")
    assert(pushed.contains("l_quantity"), s"quantity not pushed: $pushed")
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("l_partkey") && !read.contains("l_returnflag"),
      s"unprojected columns reached the scan: $read")
  }

  test("q_late_priority: EXISTS becomes one LEFT SEMI join, no row multiplication") {
    val plan = ops.TpchOps.latePriority.fn(spark, Sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("LeftSemi"),
      s"late-line EXISTS must plan as a semi join:\n$plan")
  }

  test("q_disjunctive_rev: OR-of-ANDs is ONE broadcast join, not a union of scans") {
    val df = ops.TpchOps.disjunctiveRev.fn(spark, Sf)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"part dim must broadcast:\n$plan")
    assert(!plan.contains("Union"),
      s"disjunctive predicate degenerated to a union of scans:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"disjunctive predicate must stay a hash join:\n$plan")
  }

  test("q_returned_items: top-20 plans TakeOrderedAndProject, never a global sort") {
    val plan = formatted(ops.TpchOps.returnedItems.fn(spark, Sf))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 degenerated to a global sort")
  }

  test("q_waiting_supplier: key-grain formulation == correlated EXISTS SQL") {
    // The DSL avoids the textbook correlated EXISTS / NOT EXISTS chain
    // (whose decorrelation shuffles the fact table thrice) in favor of
    // two key-grain collapses. This law proves the reformulation: a
    // supplier "kept order o waiting" iff (a) o is finished, (b) another
    // supplier has a line in o, (c) no line of o by ANY supplier shipped
    // strictly after this supplier's latest line.
    val li = Tables.lineitem(spark, Sf)
    val ord = Tables.orders(spark, Sf)
    li.createOrReplaceTempView("li_w")
    ord.createOrReplaceTempView("ord_w")
    try {
      val sql = spark.sql(
        """SELECT s.sk AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
          |FROM (SELECT l_orderkey AS ok, l_suppkey AS sk,
          |        max(l_shipdate) AS m
          |      FROM li_w JOIN ord_w ON o_orderkey = l_orderkey
          |      WHERE o_orderstatus = 'F'
          |      GROUP BY l_orderkey, l_suppkey) s
          |WHERE EXISTS (SELECT 1 FROM li_w l2
          |    WHERE l2.l_orderkey = s.ok AND l2.l_suppkey <> s.sk)
          |  AND NOT EXISTS (SELECT 1 FROM li_w l3
          |    WHERE l3.l_orderkey = s.ok AND l3.l_shipdate > s.m)
          |GROUP BY s.sk""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sup = Tables.supplier(spark, Sf)
        .select("s_suppkey", "s_name").collect()
        .map(r => r.getString(1) -> r.getLong(0)).toMap
      // DSL result is (s_name, numwait) top-20; compare on the overlap —
      // every DSL row must carry exactly the SQL count for that supplier
      val dsl = ops.TpchOps.waitingSupplier.fn(spark, Sf).collect()
      assert(dsl.nonEmpty)
      dsl.foreach { r =>
        val key = sup(r.getString(0))
        assert(sql.getOrElse(key, 0L) === r.getLong(1),
          s"supplier ${r.getString(0)}: DSL ${r.getLong(1)} != SQL ${sql.get(key)}")
      }
    } finally {
      spark.catalog.dropTempView("li_w")
      spark.catalog.dropTempView("ord_w")
    }
  }

  test("q_top_supplier: every returned supplier carries the exact maximum") {
    val rows = ops.TpchOps.topSupplier.fn(spark, Sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length === 1, "tie rows must share the identical max revenue")
  }
}
