package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
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
    // (measured: pre-repartitioning edges by src to co-partition the
    // per-round joins does NOT pay here — AQE coalesces the round's
    // rank-frame partitioning so the join re-exchanges anyway, and the
    // upfront repartition nearly tripled total shuffle for flat wall
    // time. At real scale the equivalent win comes from bucket-storing
    // the edge list, not an in-plan repartition.)
    //
    // Both edge directions come out of ONE pass over the distinct pair
    // list via explode — the earlier union-of-two-branches shape read
    // the pair frame twice, which forced a second (eager) checkpoint
    // just to stop concurrent stages racing on the unmaterialized
    // distinct. One branch ⇒ one materialization ⇒ one checkpoint.
    //
    // The SOURCE degree is a window count over the src partition — ONE
    // src-shuffle of the edge list stamps dsrc onto every edge, with no
    // degree aggregates, no broadcast-exchange jobs, and nothing for the
    // driver to coordinate between stages (the earlier broadcast-join
    // shape spent ~1.2 s of wall on four async degree/join stages). The
    // rank frame stays a bare (node, r) pair; the damped division
    // happens edge-side; each round is ONE join + one partial-aggregated
    // groupBy (r4's shape paid a node-sized deg re-join per round).
    // NOT fanned (re-measured r16): the map work before the distinct is
    // O(rows) — project two ints, no fan-out — so a pre-shuffle of the
    // raw (partkey, suppkey) rows costs more than the single-task
    // partial-distinct saves (the q_basket_pairs rule; the r15 driver
    // bench recorded the fanned shape at 2 s vs 1 s unfanned, scaling
    // ratio 1.0 — the fan bought no parallelism because the distinct's
    // own exchange already spreads the reduce side)
    val edgesD = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .select(explode(array(
        struct((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")),
        struct((col("l_suppkey") * 2 + 1).as("src"),
          (col("l_partkey") * 2).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .withColumn("dsrc",
        count(lit(1)).over(Window.partitionBy("src")))
      // LAZY checkpoint: still truncates lineage for the loop, but
      // plan-only consumers (PlanSpec's global sweeps, graft.Explain)
      // never run the edge-build job just to read a plan. Lazy is
      // race-free in THIS shape because every stage that scans edgesD is
      // sequential — round-1's agg materializes it, each later round's
      // join depends on the previous round's rank shuffle (the r4 eager
      // requirement came from concurrent ASYNC broadcast jobs racing on
      // an unmaterialized frame; that shape is gone).
      .localCheckpoint(eager = false)
    // ROUND 1 NEEDS NO JOIN: the initial rank is the constant 1000000,
    // so each edge's round-1 contribution ((1000000·17) div 20) div dsrc
    // is a per-edge constant — one aggregate over the edge list replaces
    // the first edge ⋈ ranks join outright. Rounds 2..k reference edgesD
    // (checkpointed) once and the previous rank frame once — linear
    // lineage, pure plan, AQE broadcasts the node-sized rank side from
    // its shuffle's runtime stats.
    var r = edgesD.groupBy(col("dst"))
      .agg((lit(150000L) +
        sum(expr("((1000000 * 17) div 20) div dsrc"))).cast(LongType).as("r"))
      .select(col("dst").as("node"), col("r"))
    // The rank side is SHUFFLE-HASH hinted, not broadcast: edgesD is
    // already hash-partitioned on src (the degree window's partitioning
    // survives the checkpoint) and r comes out of groupBy(dst) hash-
    // partitioned on the join key, so the SHJ plans with ZERO exchanges
    // and no per-round async broadcast job — and unlike a broadcast
    // hint it stays safe when the node frame is data-scaled at 100 TB
    // (each task builds one rank PARTITION, not the whole frame).
    for (_ <- 2 to Iters) {
      r = edgesD.join(r.withColumnRenamed("node", "cnode")
            .hint("shuffle_hash"),
          col("src") === col("cnode"))
        .groupBy(col("dst"))
        .agg((lit(150000L) +
          sum(expr("((r * 17) div 20) div dsrc"))).cast(LongType).as("r"))
        .select(col("dst").as("node"), col("r"))
    }
    r.select(col("node"),
        when(col("node") % 2 === 0, "part").otherwise("supplier").as("kind"),
        col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("node"))
      .limit(20)
  }

  /** Per-brand triangle census over the part price-proximity graph:
    * parts are adjacent when they share a brand and their retail prices
    * sit within ±0.50 — a sparse, data-derived similarity graph (the
    * supplier co-supply graph is complete in this testdata, so it cannot
    * exercise triangle machinery).
    *
    * Scale design: the edge builder is a brand-blocked self-join (never
    * all-pairs — brands bound the block), and counting uses degree
    * orientation: every edge points from the (degree, id)-smaller
    * endpoint to the larger, so each triangle is enumerated exactly once
    * AND the oriented out-degree is O(√m) (Schank & Wagner's classic
    * bound), which caps the e1⋈e2 wedge fan-out — the difference between
    * a feasible and an explosive plan on a 100 TB edge list. All three
    * triangle joins are hash equi-joins on 8-byte node ids.
    *
    * Determinism: pure integer counts; the price-band predicate is a
    * single IEEE subtraction both engines compute identically (§7.5
    * rule 4); orientation's (deg, id) order is total because ids are
    * unique. */
  val triangles: Q = Q.checked(
    "q_triangle",
    """WITH e AS (
      |  SELECT a.p_partkey AS u, b.p_partkey AS v, a.p_brand AS brand
      |  FROM part a JOIN part b
      |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |   AND abs(a.p_retailprice - b.p_retailprice) <= 0.5),
      |deg AS (SELECT n, count(*) AS deg FROM (
      |          SELECT u AS n FROM e UNION ALL SELECT v FROM e)
      |        GROUP BY n),
      |o AS (
      |  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v
      |           END AS a,
      |         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u
      |           END AS b,
      |         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN dv.deg
      |           ELSE du.deg END AS db,
      |         brand
      |  FROM e JOIN deg du ON e.u = du.n JOIN deg dv ON e.v = dv.n),
      |tri AS (
      |  SELECT e1.brand, count(*) AS n_tri
      |  FROM o e1 JOIN o e2
      |    ON e1.a = e2.a AND (e1.db, e1.b) < (e2.db, e2.b)
      |    JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b
      |  GROUP BY e1.brand),
      |eb AS (SELECT brand, count(*) AS n_edges FROM e GROUP BY brand)
      |SELECT eb.brand, eb.n_edges, coalesce(tri.n_tri, 0) AS n_tri
      |FROM eb LEFT JOIN tri ON eb.brand = tri.brand
      |ORDER BY eb.brand""".stripMargin
  ) { (s, dir) =>
    val p = Tables.part(s, dir)
      .select("p_partkey", "p_brand", "p_retailprice")
    val a = p.select(col("p_partkey").as("u"), col("p_brand").as("brand"),
      col("p_retailprice").as("pu"))
    val b = p.select(col("p_partkey").as("v"), col("p_brand").as("brand_b"),
      col("p_retailprice").as("pv"))
    val e = a.join(b, col("brand") === col("brand_b") && col("u") < col("v")
        && abs(col("pu") - col("pv")) <= 0.5)
      .select("u", "v", "brand")
      // edge list + degrees feed three joins each — materialize once
      // (the PageRank/Components recipe)
      .localCheckpoint(false)
    val deg = e.select(col("u").as("n"))
      .unionByName(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // the oriented edge carries its endpoint's degree: a wedge's two
    // far vertices must be ordered by the SAME (deg, id) total order the
    // orientation uses — ordering them by raw id would look up closing
    // edges that are stored the other way around and silently undercount
    // (review-caught: sf0.1 Brand#1 lost 2,400 of 6,986 triangles)
    val lt = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val o = e
      .join(deg.select(col("n").as("nu"), col("deg").as("du")),
        col("u") === col("nu"))
      .join(deg.select(col("n").as("nv"), col("deg").as("dv")),
        col("v") === col("nv"))
      .select(
        when(lt, col("u")).otherwise(col("v")).as("a"),
        when(lt, col("v")).otherwise(col("u")).as("b"),
        when(lt, col("dv")).otherwise(col("du")).as("db"),
        col("brand"))
      .localCheckpoint(false)
    val e1 = o.select(col("a").as("a1"), col("b").as("b1"),
      col("db").as("db1"), col("brand"))
    val e2 = o.select(col("a").as("a2"), col("b").as("b2"),
      col("db").as("db2"))
    val e3 = o.select(col("a").as("a3"), col("b").as("b3"))
    val tri = e1
      .join(e2, col("a1") === col("a2")
        && struct(col("db1"), col("b1")) < struct(col("db2"), col("b2")))
      .join(e3, col("a3") === col("b1") && col("b3") === col("b2"))
      .groupBy("brand").agg(count(lit(1)).as("n_tri"))
    val eb = e.groupBy("brand").agg(count(lit(1)).as("n_edges"))
    eb.join(tri.withColumnRenamed("brand", "brand_t"),
        col("brand") === col("brand_t"), "left")
      .select(col("brand"), col("n_edges"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy("brand")
  }

  /** Bounded-depth reachability (BFS, 2 hops) from a fixed part over the
    * price-proximity graph q_triangle builds — the unrolled equivalent of
    * a WITH RECURSIVE traversal, which is how iterative graph expansion
    * runs on Spark: one frontier ⋈ edges join per hop, with the visited
    * set subtracted so every node reports its MINIMUM hop count. The
    * frontier frame is hop-bounded (≤ the neighborhood size), so each hop
    * is a broadcast probe of the edge list at scale, never an edge
    * shuffle; depth is fixed (the oracle unrolls the same two hops as
    * CTEs).
    *
    * Determinism: pure integer node ids and hop counts; the edge
    * predicate is the same single-IEEE-subtraction band as q_triangle. */
  val reach: Q = Q.checked(
    "q_reach",
    """WITH e0 AS (
      |  SELECT a.p_partkey AS u, b.p_partkey AS v
      |  FROM part a JOIN part b
      |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |   AND abs(a.p_retailprice - b.p_retailprice) <= 5.0),
      |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |h1 AS (SELECT DISTINCT v AS node FROM e WHERE u = 460),
      |h2 AS (
      |  SELECT DISTINCT e.v AS node
      |  FROM e JOIN h1 ON e.u = h1.node
      |  WHERE e.v <> 460 AND e.v NOT IN (SELECT node FROM h1))
      |SELECT node, hops FROM (
      |  SELECT node, CAST(1 AS BIGINT) AS hops FROM h1
      |  UNION ALL
      |  SELECT node, 2 FROM h2)
      |ORDER BY hops, node""".stripMargin
  ) { (s, dir) =>
    val Source = 460L
    val p0 = Tables.part(s, dir)
      .select("p_partkey", "p_brand", "p_retailprice")
    // SEEDED-BFS PRUNING: every edge stays inside one brand (the edge
    // predicate requires brand equality), so the whole k-hop ball around
    // the source lives in the source's brand — restrict the edge build
    // to it BEFORE the self-join via a broadcast semi-join (one 1-row
    // frame, no collect). This divides the blocked self-join's work by
    // the brand count (~25×) and is exactly the pruning a 100 TB seeded
    // traversal needs: build frontier-relevant edges, not the graph.
    val srcBrand = p0.filter(col("p_partkey") === Source)
      .select(col("p_brand").as("sb"))
    val p = p0.join(broadcast(srcBrand), col("p_brand") === col("sb"))
      .drop("sb")
    val a = p.select(col("p_partkey").as("u"), col("p_brand").as("brand"),
      col("p_retailprice").as("pu"))
    val b = p.select(col("p_partkey").as("v"), col("p_brand").as("brand_b"),
      col("p_retailprice").as("pv"))
    val e0 = a.join(b, col("brand") === col("brand_b")
        && col("u") < col("v") && abs(col("pu") - col("pv")) <= 5.0)
      .select("u", "v")
    val e = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false) // probed once per hop
    val h1 = e.filter(col("u") === Source).select(col("v").as("node"))
      .distinct()
    val h2 = e.join(h1.withColumnRenamed("node", "f"), col("u") === col("f"))
      .select(col("v").as("node")).distinct()
      .filter(col("node") =!= Source)
      .join(h1, Seq("node"), "left_anti")
    h1.withColumn("hops", lit(1L))
      .unionByName(h2.withColumn("hops", lit(2L)))
      .orderBy("hops", "node")
  }

  /** Market-basket association mining over the part co-order graph:
    * support / confidence / lift for the 15 strongest part pairs — the
    * retail "customers who bought A also bought B" primitive, and a
    * co-occurrence-edge weighting the dedup/graph pillar doesn't
    * otherwise exercise.
    *
    * Exactness: support counts are plain BIGINTs; lift and confidence
    * are single IEEE divisions of exact integers (n_ab·N / n_a·n_b ≤
    * ~10^13 — far inside exact double range), identical cross-engine.
    * Ranking is by the exact pair count with (p_a, p_b) tie-break — no
    * float ever decides membership.
    *
    * Scale: itemsets collapse to the per-order sorted DISTINCT item SET
    * in one map-side-combined aggregate (the only corpus-grain
    * shuffle); pair generation is a per-row HOF over that set — never a
    * join, never a cartesian: pairs per order ~ C(items,2) with items
    * ~4 (a generator constant, so per-order fan-out does not grow with
    * SF) — and per-item supports re-derive from the same order-grain
    * frame by explode, joined back hint-free (stats/AQE broadcast them
    * while they fit; part-grain outgrows the driver at large SF). The
    * top-15 plans as TakeOrdered. At 100 TB the (a,b) pair space is
    * bounded by |parts|², and the hot path (pair counting) is one
    * map-side-combined hash aggregation. */
  val basketPairs: Q = Q.checked(
    "q_basket_pairs",
    """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |               FROM lineitem),
      |n_orders AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM items),
      |supp AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_p FROM items
      |         GROUP BY pk),
      |pairs AS (SELECT a.pk AS p_a, b.pk AS p_b,
      |            CAST(count(*) AS BIGINT) AS n_ab
      |          FROM items a JOIN items b
      |            ON a.ok = b.ok AND a.pk < b.pk
      |          GROUP BY a.pk, b.pk)
      |SELECT p_a, p_b, n_ab, sa.n_p AS n_a, sb.n_p AS n_b,
      |  CAST(n_ab AS DOUBLE) / CAST(sa.n_p AS DOUBLE) AS conf_a_b,
      |  CAST(n_ab * n AS DOUBLE) / (CAST(sa.n_p AS DOUBLE) * CAST(sb.n_p AS DOUBLE))
      |    AS lift
      |FROM pairs JOIN supp sa ON sa.pk = p_a
      |  JOIN supp sb ON sb.pk = p_b, n_orders
      |ORDER BY n_ab DESC, p_a, p_b LIMIT 15""".stripMargin
  ) { (s, dir) =>
    // ONE corpus-grain pass, not five: the r14 shape built a DISTINCT
    // (ok, pk) frame and self-joined it on ok — the initial plan scanned
    // lineitem five times (pair sides, two support lookups, the order
    // count) with a corpus-grain distinct exchange under each, and the
    // pair join moved both item sides through an ok-keyed join (at small
    // SF that even BROADCASTS the corpus-grain items frame). The order's
    // distinct item set is instead collected in a single aggregate
    // (collect_set subsumes DISTINCT, combines map-side), and everything
    // downstream re-derives from that order-grain frame map-side: the
    // a<b pairs via an index HOF over the sorted set (each pair emitted
    // exactly once — no join, no second corpus exchange), the per-item
    // supports via explode, the order count via count(*). Per-order
    // fan-out is C(items, 2) exactly as the join produced.
    // NOT fanned (measured): a doc-style fan by ok shuffles the RAW
    // (ok, pk) rows (23 MB) where the scan-fused collect_set partial
    // ships pre-collapsed sets (17 MB) — unlike the text ops, the
    // map work here is O(rows), not O(rows × fan-out), so the extra
    // bytes cost more than the single-task partial saves (bench:
    // 1.30 s unfanned vs 2.24 s fanned at sf0.1; the r15 driver run
    // confirmed the fanned shape at 3 s vs 2 s)
    val byOrder = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok")
      .agg(sort_array(collect_set(col("pk"))).as("pks"))
    val nOrders = byOrder.agg(count(lit(1)).as("n"))
    val supp = byOrder.select(explode(col("pks")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_p"))
    byOrder
      .select(explode(expr(
        """flatten(transform(pks,
          |  (x, i) -> transform(slice(pks, i + 2, size(pks)),
          |            y -> named_struct('p_a', x, 'p_b', y))))""".stripMargin))
        .as("pr"))
      .select(col("pr.p_a").as("p_a"), col("pr.p_b").as("p_b"))
      .groupBy("p_a", "p_b").agg(count(lit(1)).as("n_ab"))
      .join(supp.select(col("pk").as("pk_a"),
        col("n_p").as("n_a")), col("p_a") === col("pk_a"))
      .join(supp.select(col("pk").as("pk_b"),
        col("n_p").as("n_b")), col("p_b") === col("pk_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("p_a"), col("p_b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast(DoubleType) / col("n_a").cast(DoubleType))
          .as("conf_a_b"),
        ((col("n_ab") * col("n")).cast(DoubleType)
          / (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)))
          .as("lift"))
      .orderBy(col("n_ab").desc, col("p_a"), col("p_b"))
      .limit(15)
  }

  /** Bounded-hop weighted single-source shortest path (Bellman-Ford
    * relaxation) over the q_reach brand-banded part graph — the min-COST
    * twin of q_reach's min-HOP traversal, and the relaxation pattern
    * (carry a monotone aggregate along edges, group-min per node each
    * round) that hop counting never exercises.
    *
    * Determinism: edge weight is pure integer arithmetic on node ids
    * (`1 + (u+v) % 7`) — no float ever enters a path cost, so the
    * group-min is fold-order-free and bit-identical cross-engine. The
    * band predicate reuses q_reach's single-IEEE-subtraction test.
    *
    * Scale: the SAME seeded pruning as q_reach — every edge stays inside
    * one brand, so the ≤K-hop ball around the source lives in the
    * source's brand and the edge build is semi-joined down ~25× BEFORE
    * the banded self-join. Depth is a QUERY CONSTANT (K=4): each round
    * is one equi-join of the bounded distance frame against the
    * checkpointed brand-local edge list plus one group-min — never a
    * frontier that scales with the corpus, and never a data-dependent
    * driver round count (the q_reorder_streak recursion discipline). The
    * oracle unrolls the same four relaxation rounds as plain CTEs. */
  val shortestPath: Q = Q.checked(
    "q_shortest_path", {
      def relax(prev: String, out: String): String =
        s"""$out AS (
           |  SELECT node, min(cost) AS cost FROM (
           |    SELECT node, cost FROM $prev
           |    UNION ALL
           |    SELECT e.v AS node, p.cost + e.w AS cost
           |    FROM $prev p JOIN e ON e.u = p.node)
           |  GROUP BY node)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT CAST(a.p_partkey AS BIGINT) AS u,
         |         CAST(b.p_partkey AS BIGINT) AS v
         |  FROM part a JOIN part b
         |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
         |   AND abs(a.p_retailprice - b.p_retailprice) <= 5.0),
         |ew AS (SELECT u, v, 1 + (u + v) % 7 AS w FROM e0),
         |e AS (SELECT u, v, w FROM ew UNION ALL SELECT v, u, w FROM ew),
         |d1 AS (SELECT v AS node, CAST(min(w) AS BIGINT) AS cost
         |       FROM e WHERE u = 460 GROUP BY v),
         |${relax("d1", "d2")},
         |${relax("d2", "d3")},
         |${relax("d3", "d4")}
         |SELECT node, cost FROM d4 WHERE node <> 460
         |ORDER BY node""".stripMargin
    }
  ) { (s, dir) =>
    val Source = 460L
    val K = 4
    val p0 = Tables.part(s, dir)
      .select("p_partkey", "p_brand", "p_retailprice")
    val srcBrand = p0.filter(col("p_partkey") === Source)
      .select(col("p_brand").as("sb"))
    val p = p0.join(broadcast(srcBrand), col("p_brand") === col("sb"))
      .drop("sb")
    val a = p.select(col("p_partkey").cast(LongType).as("u"),
      col("p_brand").as("brand"), col("p_retailprice").as("pu"))
    val b = p.select(col("p_partkey").cast(LongType).as("v"),
      col("p_brand").as("brand_b"), col("p_retailprice").as("pv"))
    val ew = a.join(b, col("brand") === col("brand_b")
        && col("u") < col("v") && abs(col("pu") - col("pv")) <= 5.0)
      .select(col("u"), col("v"), (lit(1L) + (col("u") + col("v")) % 7).as("w"))
    val e = ew.unionByName(ew.select(col("v").as("u"), col("u").as("v"),
        col("w")))
      .localCheckpoint(false) // probed once per relaxation round
    var d = e.filter(col("u") === Source)
      .groupBy(col("v").as("node")).agg(min(col("w")).as("cost"))
    for (_ <- 2 to K) {
      val step = d.join(e.withColumnRenamed("u", "du"),
          col("node") === col("du"))
        .select(col("v").as("node"), (col("cost") + col("w")).as("cost"))
      d = d.unionByName(step).groupBy("node").agg(min("cost").as("cost"))
    }
    d.filter(col("node") =!= Source).orderBy("node")
  }

  val all: Seq[Q] = Seq(pagerank, triangles, reach, basketPairs, shortestPath)
}
