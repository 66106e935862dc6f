package graft

import graft.ops.{GraphOps, LmOps, SimJoinOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-4 exact-algorithm checks: prefix filtering and degree
  * orientation are OPTIMIZATIONS — each must reproduce its brute-force
  * twin bit-for-bit, not approximately. */
class SimJoinTriSpec extends AnyFunSuite with SparkFixture {

  test("q_simjoin_prefix equals brute-force all-pairs Jaccard") {
    // brute force: every doc pair, exact 3-shingle Jaccard, tau = 3/5
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
      .map { case (id, w) =>
        id -> w.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      }
      .filter(_._2.nonEmpty)
    val brute = (for {
      (da, sa) <- docs; (db, sb) <- docs if da < db
      i = (sa & sb).size; u = sa.size + sb.size - i
      if 5 * i >= 3 * u
    } yield (da, db, i.toLong, u.toLong)).sortBy(p => (p._1, p._2))
    val got = SimJoinOps.simjoinPrefix.fn(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === brute.toSeq,
      "prefix filter must not change the exact join result")
    assert(got.nonEmpty, "testdata plants near-dups; empty means broken")
  }

  // sf0.01 as well as sf0.001: the degree/id-order disagreement that the
  // original wedge ordering silently missed (review-caught undercount)
  // does not occur at sf0.001 — the larger graph is the regression net
  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
  test(s"q_triangle equals brute-force unoriented triangle count ($sf)") {
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byBrand = parts.groupBy(_._2)
    val expect = byBrand.map { case (brand, ps) =>
      val edges = (for {
        a <- ps; b <- ps
        if a._1 < b._1 && math.abs(a._3 - b._3) <= 0.5
      } yield (a._1, b._1)).toSet
      val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        .withDefaultValue(Set.empty[Long])
      // brute triangles: u<v<w with all three edges present (id order —
      // orientation-free ground truth). NOTE: summed over a Seq — a
      // for-comprehension over the edge SET would collapse the yielded
      // 1s into {1} and report min(count, 1) (its own review-caught bug)
      val tris = edges.toSeq.map { case (u, v) =>
        adj(v).count(w => adj(u).contains(w))
      }.sum
      brand -> (edges.size.toLong, tris.toLong)
    }
    val got = GraphOps.triangles.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect.filter(_._2._1 > 0),
      "degree orientation must count each triangle exactly once")
    assert(got.values.map(_._2).sum > 0, "testdata plants >=1 triangle")
  }

  test("q_lm_score surprisal matches a driver-side unigram model") {
    val texts = Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val gf = texts.values.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val total = gf.values.sum
    def l10(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e10 + 0.5).toLong
    val expect = texts.map { case (id, toks) =>
      val nll10 = toks.size * l10(total) - toks.map(t => l10(gf(t))).sum
      id -> nll10
    }
    val got = LmOps.lmScore.fn(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    got.foreach { case (id, nll10) =>
      assert(nll10 === expect(id), s"doc $id nll10 drift")
    }
    // top-20 really is the global top-20 by per-token surprisal
    val top = expect.toSeq
      .map { case (id, n) => (n.toDouble / 1e10 / texts(id).size, id) }
      .sortBy { case (s, id) => (-s, id) }.take(20).map(_._2)
    assert(got.map(_._1).toSeq === top)
  }
}
