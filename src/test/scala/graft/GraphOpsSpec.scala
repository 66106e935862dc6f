package graft

import graft.ops.{GraphOps, StreamShapeOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the iterative-graph and sequence-analytics queries. */
class GraphOpsSpec extends AnyFunSuite with SparkFixture {

  test("q_pagerank: ranks positive, both node kinds surface, repartition-invariant") {
    val out = GraphOps.pagerank.fn(spark, Sf).collect()
    assert(out.length === 20)
    out.foreach(r => assert(r.getLong(2) > 150000L,
      s"node ${r.getLong(0)}: rank must exceed the damping floor"))
    // high-degree suppliers (10 suppliers × 200 parts at sf0.001) must
    // dominate the top slots over any single part
    assert(out.take(5).forall(_.getString(1) == "supplier"))
    // integer arithmetic ⇒ identical result under a different layout
    val again = GraphOps.pagerank.fn(spark, Sf).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }

  test("q_transitions: pair count conserves (events minus one per user); p_milli rows sum to ~1000") {
    val ev = Tables.events(spark, Sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val out = StreamShapeOps.transitions.fn(spark, Sf).collect()
    assert(out.map(_.getLong(2)).sum === expected)
    // each source state's probabilities sum to 1000 within floor slack
    out.groupBy(_.getString(0)).foreach { case (st, rs) =>
      val s = rs.map(_.getLong(3)).sum
      assert(s > 1000 - rs.length && s <= 1000, s"$st p_milli sum $s")
    }
  }
}
