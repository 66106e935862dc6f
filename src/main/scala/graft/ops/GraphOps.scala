package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iterative graph analytics beyond connectivity
  * ([[graft.dedup.Components]] covers components): damped PageRank over
  * the part↔supplier co-occurrence graph — "which parts/suppliers anchor
  * the supply network" is the weighted-importance twin of the dedup
  * pipeline's cluster step, and the canonical shape for any
  * link-analysis pass over a 100 TB edge list.
  *
  * Scale design: each iteration is ONE shuffle join of the edge list
  * against current ranks plus a groupBy(sum) — no collect, no driver
  * graph. The edge list and degree frame are materialized once
  * (`localCheckpoint`, the Components recipe) because every round joins
  * them; rank lineage is truncated per round so k iterations cost k plan
  * nodes, not 2^k. Iteration count is fixed (3), the honest contract for
  * an oracle query (a convergence loop is data-dependent; the driver
  * needs a deterministic result — and the SQL oracle unrolls the same 3
  * rounds as chained CTEs).
  *
  * Determinism (SURVEY §7.5): ranks live in exact BIGINT micro-units;
  * the damping step is floor division ((r·17) div 20 = 0.85·r, then div
  * degree) and the neighbor reduce is an integer sum — associative,
  * commutative, partition-order-free. No float touches the pipeline.
  */
object GraphOps {

  private val Iters = 3

  private def iterSql(prev: String, out: String): String =
    s"""$out AS (
       |  SELECT e.dst AS node,
       |    CAST(150000 + sum(((r.r * 17) // 20) // d.deg) AS BIGINT) AS r
       |  FROM edges e JOIN $prev r ON e.src = r.node
       |    JOIN deg d ON e.src = d.src
       |  GROUP BY e.dst)""".stripMargin

  val pagerank: Q = Q.checked(
    "q_pagerank",
    s"""WITH e0 AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       |edges AS (
       |  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM e0
       |  UNION ALL
       |  SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM e0),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
       |${iterSql("r0", "r1")},
       |${iterSql("r1", "r2")},
       |${iterSql("r2", "r3")}
       |SELECT node,
       |  CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
       |  r AS rank_micro
       |FROM r3 ORDER BY rank_micro DESC, node LIMIT 20""".stripMargin
  ) { (s, dir) =>
    val e0 = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey").distinct()
    val edges = e0
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .unionByName(e0.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst")))
      // (measured: pre-repartitioning edges by src to co-partition the
      // per-round joins does NOT pay here — AQE coalesces the round's
      // rank-frame partitioning so the join re-exchanges anyway, and the
      // upfront repartition nearly tripled total shuffle for flat wall
      // time. At real scale the equivalent win comes from bucket-storing
      // the edge list, not an in-plan repartition.)
      //
      // LAZY checkpoints: the returned frame is already LogicalRDD-backed
      // (plan truncation — the loop stays O(rounds), not O(2^rounds)),
      // but no job runs until an action, so plan-only consumers
      // (PlanSpec's UDF scan, graft.Explain) don't execute 5 Spark jobs
      // just to read the plan; persistence still happens on first run.
      .localCheckpoint(false)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    var r = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to Iters) {
      r = edges.join(r, edges("src") === r("node"))
        .join(deg, "src")
        .groupBy(col("dst"))
        .agg((lit(150000L) + sum(expr("((r * 17) div 20) div deg")))
          .cast(LongType).as("r"))
        .select(col("dst").as("node"), col("r"))
        .localCheckpoint(false)
    }
    r.select(col("node"),
        when(col("node") % 2 === 0, "part").otherwise("supplier").as("kind"),
        col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("node"))
      .limit(20)
  }

  val all: Seq[Q] = Seq(pagerank)
}
