package graft

import graft.ops.{LmOps, TextSimOps, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-6 corpus-delta operators —
  * incremental dedup, cross-slice n-gram novelty, embedding-norm audit
  * (cross-engine value equality is the driver's DuckDB gate; these pin
  * the semantics the oracle can't see). */
class CorpusDeltaSpec extends AnyFunSuite with SparkFixture {

  test("q_dedup_incr: equals the full self-join restricted to delta-corpus pairs") {
    // the incremental path must lose NOTHING against the batch-global
    // near-dup pass: q_dedup_ngram's full prefix-blocked self-join,
    // filtered to pairs with exactly one member in the mod-5 delta, is
    // the ground truth (same prefix blocking, same trigram shingles)
    val full = TextSimOps.dedupNgram.fn(spark, Sf)
      .select("doc_a", "doc_b", "n_int", "n_union").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = full.flatMap { case (a, b, ni, nu) =>
      (a % 5 == 0, b % 5 == 0) match {
        case (true, false) => Some(((a, b), (ni, nu)))
        case (false, true) => Some(((b, a), (ni, nu)))
        case _             => None // batch-internal or corpus-internal pair
      }
    }.toMap
    val got = TextSimOps.dedupIncr.fn(spark, Sf).collect().map { r =>
      ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    }.toMap
    assert(got.keySet === expected.keySet,
      s"incremental pass missed/invented pairs: got=${got.keySet} want=${expected.keySet}")
    got.foreach { case (k, (ni, nu, jm, dup)) =>
      assert((ni, nu) === expected(k), s"pair $k shingle counts drifted")
      assert(jm === ni * 1000 / nu, s"pair $k jaccard_milli not exact floor div")
      assert(dup === (if (jm >= 500) 1 else 0), s"pair $k is_dup flag")
    }
    // delta side is exactly the mod-5 slice; corpus side never is
    got.keys.foreach { case (d, c) =>
      assert(d % 5 == 0 && c % 5 != 0, s"pair ($d,$c) violates the split")
    }
  }

  test("q_ngram_novelty: exact integer ratio; novel counts sum to single-source bigrams") {
    val out = LmOps.ngramNovelty.fn(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf)
    assert(out.length === docs.select("source").distinct.count())
    out.foreach { r =>
      val (nBi, nNov, milli) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nNov <= nBi && nBi > 0, s"source ${r.getString(0)}")
      assert(milli === nNov * 1000 / nBi, s"source ${r.getString(0)} ratio")
    }
    // conservation: Σ n_novel = # bigrams appearing in exactly one source
    val singles = docs
      .select(col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
          .stripMargin)).as("bigram"))
      .distinct()
      .groupBy("bigram").agg(countDistinct("source").as("ns"))
      .filter(col("ns") === 1).count()
    assert(out.map(_.getLong(2)).sum === singles, "novel-bigram conservation")
  }

  test("q_embed_norm: audit is consistent and covers every vector") {
    val out = VectorOps.embedNorm.fn(spark, Sf).collect()
    val total = Tables.embeddings(spark, Sf).count()
    assert(out.map(_.getLong(1)).sum === total, "every vector audited once")
    out.foreach { r =>
      val (mn, mx, avg) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn <= avg + 1e-4 && avg <= mx + 1e-4,
        s"label ${r.get(0)}: avg outside [min,max]")
      assert(mn > 0, s"label ${r.get(0)}: zero/negative norm in store")
    }
  }
}
