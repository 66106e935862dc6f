package graft

import graft.dedup.SemDedup
import graft.sim.Ivf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup (cluster-then-dedup) ground truth: the within-cluster dup
  * rule must equal a sequential brute-force reference computed over the
  * SAME cluster assignment (the assignment itself is IvfSpec territory),
  * results must be layout-invariant, and the report must conserve
  * counts. */
class SemDedupSpec extends AnyFunSuite with SparkFixture {

  private val Tau = 350000L

  private def e = Tables.embeddings(spark, Sf)

  /** Sequential reference verdict map id -> is_dup, mirroring the engine's
    * exact arithmetic: left-to-right double fold (the VectorExprs loop
    * order), cosine snapped to integer micro-units BEFORE the compare. */
  private def referenceVerdicts(
      rows: Seq[(Long, Long, Array[Float])]): Map[Long, Boolean] = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos6(a: Array[Float], b: Array[Float]): Long =
      math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        * 1e6 + 0.5).toLong
    rows.groupBy(_._2).values.flatMap { cluster =>
      val sorted = cluster.sortBy(_._1)
      sorted.map { case (id, _, emb) =>
        id -> sorted.exists { case (other, _, oemb) =>
          other < id && cos6(oemb, emb) >= Tau
        }
      }
    }.toMap
  }

  test("verdicts equal the sequential within-cluster reference") {
    val verdicts = SemDedup.verdicts(e, "vec_id", "embedding", "label",
        tauMicro = Tau, iters = 2)
      .select("vec_id", "list_id", "is_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(verdicts.length === e.count())

    val cents = Ivf.centroidsIter(e, "embedding", "label", iters = 2)
    val assigned = Ivf.assign(e, cents, "vec_id", "embedding")
      .select("vec_id", "list_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
    val want = referenceVerdicts(assigned.toSeq)

    val clusterOf = assigned.map(t => t._1 -> t._2).toMap
    verdicts.foreach { case (id, lid, isDup) =>
      assert(lid === clusterOf(id), s"cluster mismatch for $id")
      assert(isDup === want(id), s"verdict mismatch for $id")
    }
    // the threshold is non-vacuous on this corpus: both verdicts occur
    assert(want.values.exists(identity) && want.values.exists(!_),
      "fixture degenerate: all-dup or no-dup corpus")
  }

  test("verdicts are invariant under repartitioning") {
    val base = SemDedup.verdicts(e, "vec_id", "embedding", "label", Tau)
      .select("vec_id", "is_dup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val shuffled = SemDedup.verdicts(e.repartition(7), "vec_id",
        "embedding", "label", Tau)
      .select("vec_id", "is_dup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(base === shuffled)
  }

  test("report conserves counts and kept+dups = vecs per cluster") {
    val rep = SemDedup.report(e, "vec_id", "embedding", "label", Tau)
      .collect()
    assert(rep.map(_.getLong(1)).sum === e.count())
    rep.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1),
        s"cluster ${r.getLong(0)} does not conserve")
    }
    // list_ids ordered and distinct
    val ids = rep.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted.distinct))
  }

  test("hot-list split path yields a finer quantizer but still conserves") {
    val rep = SemDedup.report(e, "vec_id", "embedding", "label", Tau,
      iters = 2, maxListSize = 40)
    val n = rep.agg(sum("n_vecs")).collect()(0).getLong(0)
    assert(n === e.count())
  }

  test("incremental verdicts equal the sequential ingest rule; kept delta is closed vs corpus") {
    val corpus = e.filter(col("vec_id") % 5 =!= 0)
    val delta = e.filter(col("vec_id") % 5 === 0)
    val got = SemDedup.incrementalVerdicts(corpus, delta, "vec_id",
        "embedding", "label", Tau, iters = 2)
      .select("vec_id", "list_id", "is_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length === delta.count())

    // sequential reference under the SAME frozen corpus-trained quantizer
    val cents = Ivf.centroidsIter(corpus, "embedding", "label", iters = 2)
    def assigned(df: org.apache.spark.sql.DataFrame) =
      Ivf.assign(df, cents, "vec_id", "embedding")
        .select("vec_id", "list_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val ca = assigned(corpus)
    val da = assigned(delta)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos6(a: Array[Float], b: Array[Float]): Long =
      math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        * 1e6 + 0.5).toLong
    val want = da.map { case (id, lid, emb) =>
      val vsCorpus = ca.exists { case (_, clid, cemb) =>
        clid == lid && cos6(cemb, emb) >= Tau }
      val vsDelta = da.exists { case (oid, olid, oemb) =>
        olid == lid && oid < id && cos6(oemb, emb) >= Tau }
      id -> (vsCorpus || vsDelta)
    }.toMap
    got.foreach { case (id, _, isDup) =>
      assert(isDup === want(id), s"incremental verdict mismatch for $id")
    }
    assert(want.values.exists(identity), "fixture degenerate: no delta dup")

    // closure law: no KEPT delta vector lies within tau of a corpus
    // cluster-mate (kept means genuinely novel vs the standing corpus)
    val daById = da.map(t => t._1 -> t).toMap
    got.filter(!_._3).foreach { case (id, lid, _) =>
      val (_, _, emb) = daById(id)
      ca.foreach { case (cid, clid, cemb) =>
        assert(!(clid == lid && cos6(cemb, emb) >= Tau),
          s"kept delta $id is within tau of corpus $cid")
      }
    }
  }
}
