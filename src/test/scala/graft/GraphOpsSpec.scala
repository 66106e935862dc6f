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

  test("q_shortest_path: equals a sequential bounded Bellman-Ford") {
    val Source = 460L
    val K = 4
    // sf0.01, not Sf: the query's source node (460, shared with q_reach)
    // only exists from sf0.01 up — the brand ball is still ~80 parts
    val dir = "/root/testdata/sf0.01"
    // rebuild the brand-banded graph sequentially from the raw table
    val parts = Tables.part(spark, dir)
      .select("p_partkey", "p_brand", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val srcBrand = parts.find(_._1 == Source).get._2
    val ball = parts.filter(_._2 == srcBrand)
    val edges = for {
      (u, _, pu) <- ball; (v, _, pv) <- ball
      if u != v && math.abs(pu - pv) <= 5.0
    } yield (u, v, 1L + (u + v) % 7)
    // K rounds of relaxation from the source
    var dist = Map.empty[Long, Long]
    edges.filter(_._1 == Source).foreach { case (_, v, w) =>
      dist = dist.updated(v, math.min(dist.getOrElse(v, Long.MaxValue), w))
    }
    for (_ <- 2 to K) {
      var next = dist
      for ((u, v, w) <- edges; du <- dist.get(u)) {
        val c = du + w
        if (c < next.getOrElse(v, Long.MaxValue)) next = next.updated(v, c)
      }
      dist = next
    }
    val expect = dist.removed(Source).toSeq.sortBy(_._1)
    val got = ops.GraphOps.shortestPath.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expect)
    // every cost is a real path cost: at least one edge weight (≥1) and
    // no node costs more than K × the max weight along any K-hop path
    got.foreach { case (_, c) => assert(c >= 1L && c <= K * 7L) }
  }

  test("q_peak_concurrency: equals a brute-force single-threaded sweep") {
    val evs = Tables.events(spark, Sf)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2)))
    // sessions: 30-min gap islands per user, in (ts, event_id) order
    val spans = evs.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(identity).map(_._1)
      val out = scala.collection.mutable.ListBuffer[(Long, Long)]()
      var (s0, prev) = (sorted.head, sorted.head)
      sorted.tail.foreach { t =>
        if (t - prev > 1800000000L) { out += ((s0, prev)); s0 = t }
        prev = t
      }
      out += ((s0, prev))
      out
    }.toSeq
    // brute sweep: net deltas per µs instant, walk in time order
    val deltas = spans.flatMap { case (a, b) => Seq((a, 1), (b + 1, -1)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val dayOf = (us: Long) => us / 86400000000L
    val expect = scala.collection.mutable.Map[Long, Long]()
    var cur = 0L
    deltas.foreach { case (t, d) =>
      val k = dayOf(t)
      // concurrency holds at the carry-in from midnight until the first
      // in-day delta — an all-endings day peaks at its carry, and the
      // query must not under-report it
      if (!expect.contains(k)) expect(k) = cur
      cur += d
      expect(k) = math.max(expect(k), cur)
    }
    // carry-only days never appear in the query output; compare on the
    // days the query emits
    val got = StreamShapeOps.peakConcurrency.fn(spark, Sf).collect()
      .map(r => dayOf(r.getDate(0).toLocalDate.toEpochDay * 86400000000L)
        -> r.getLong(1)).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (day, conc) =>
      // the brute walk tracks concurrency AFTER each delta; within a day
      // the max over prefix points matches the query's day-max exactly
      assert(conc === expect(day), s"day $day")
    }
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
