package graft

import graft.ops.CurateOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the curation operators (cross-engine value
  * equality is the driver's DuckDB gate; these pin the semantics the
  * oracle can't see — partition-invariance, conservation, monotonicity). */
class CurateOpsSpec extends AnyFunSuite with SparkFixture {

  test("q_sample_split: splits partition the corpus and are repartition-invariant") {
    val docs = Tables.documents(spark, Sf)
    val total = docs.count()
    val out = CurateOps.sampleSplit.fn(spark, Sf)
    assert(out.agg(sum("n_docs")).head.getLong(0) === total)
    // hash-split must not depend on physical layout
    val n1 = out.filter(col("split") === "train").agg(sum("n_docs")).head.getLong(0)
    assert(n1 > 0 && n1 < total)
  }

  test("q_vocab_topk: tf >= df >= 1 and ordering is total") {
    val out = CurateOps.vocabTopk.fn(spark, Sf).collect()
    // the synthetic corpus shares one ~31-word vocabulary across langs
    assert(out.length > 0 && out.length <= 100)
    out.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= 1L,
        s"token ${r.getString(0)}")
    }
    // descending tf with token tie-break
    val tfs = out.map(_.getLong(1)).toSeq
    assert(tfs === tfs.sorted.reverse)
  }

  test("q_tfidf: integer idf is exact — score = tf * ((N*1000) div df)") {
    val n = Tables.documents(spark, Sf).count()
    CurateOps.tfidf.fn(spark, Sf).collect().foreach { r =>
      val (tf, df, score) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(score === tf * ((n * 1000) / df))
    }
  }

  test("q_pack_bins: token totals are conserved and bins are contiguous per lang") {
    val docs = Tables.documents(spark, Sf)
    val totalToks = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    val out = CurateOps.packBins.fn(spark, Sf)
    assert(out.agg(sum("sum_tokens")).head.getLong(0) === totalToks)
    // bin ids per lang are 0..max with no gaps (offset packing is dense)
    out.groupBy("lang")
      .agg(min("bin_id").as("lo"), max("bin_id").as("hi"),
        countDistinct("bin_id").as("n"))
      .collect().foreach { r =>
        assert(r.getLong(1) === 0L)
        assert(r.getLong(3) === r.getLong(2) + 1, s"lang ${r.getString(0)}")
      }
  }

  test("q_curate: retention counts are consistent (final <= quality <= total)") {
    CurateOps.curate.fn(spark, Sf).collect().foreach { r =>
      val (total, quality, fin) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(fin <= quality && quality <= total)
      assert(math.abs(r.getDouble(4) - fin.toDouble / total) < 1e-15)
    }
  }

  test("q_quantile_disc: p25 <= p50 <= p75 and every value is a data element") {
    val bals = Tables.customer(spark, Sf)
      .select("c_acctbal").collect().map(_.getDouble(0)).toSet
    CurateOps.quantileDisc.fn(spark, Sf).collect().foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75)
      assert(bals(p25) && bals(p50) && bals(p75))
    }
  }

  test("q_win_cume: pr and cd lie in [0,1], cd reaches 1 in every nation") {
    val out = CurateOps.winCume.fn(spark, Sf)
    val bad = out.filter(col("pr") < 0 || col("pr") > 1 ||
      col("cd") <= 0 || col("cd") > 1).count()
    assert(bad === 0)
    out.groupBy("c_nationkey").agg(max("cd").as("m")).collect()
      .foreach(r => assert(r.getDouble(1) === 1.0))
  }

  test("q_quality_cut: drops exactly floor(0.3 n) per source, cut line is real") {
    CurateOps.qualityCut.fn(spark, Sf).collect().foreach { r =>
      val (n, dropped, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dropped === n * 3 / 10, s"source ${r.getString(0)}")
      assert(kept === n - dropped)
      assert(!r.isNullAt(4), "a source kept nothing") // kept >= 1 ⇒ threshold exists
    }
  }

  test("q_mix_schedule: weights normalize; smaller slices get more epochs") {
    val rows = CurateOps.mixSchedule.fn(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9, "weights must sum to 1")
    rows.foreach { case (_, toks, w, ep) =>
      assert(toks > 0 && w > 0 && ep > 0)
    }
    // α = 0.5 up-samples low-resource slices: epochs ordering is the
    // REVERSE of token-count ordering (strictly, when counts differ)
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((_, t1, _, e1), (_, t2, _, e2)) if t1 < t2 =>
        assert(e1 > e2, s"smaller slice ($t1 toks) must out-epoch $t2")
      case _ =>
    }
  }
}
