package graft

import graft.cdc.{CdcConfig, CdcMerge, IncrementalAgg}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

// top-level for encoders
final case class IaRow(k: Long, grp: String, v: Double)

/** Incremental aggregate maintenance: the maintained view must equal a
  * fresh recompute EXACTLY (schema and values) after any sequence of
  * inserts, updates (including group moves), and deletes. */
class IncrementalAggSpec extends AnyFunSuite with SparkFixture {

  private val cfg = CdcConfig(keyCols = Seq("k"), valueCols = Seq("grp", "v"))
  private val spec = IncrementalAgg.Spec(groupCols = Seq("grp"), sumCols = Seq("v"))

  private def feedOf(prev: DataFrame, curr: DataFrame): DataFrame =
    CdcMerge.classifyHashed(
      CdcMerge.withHashes(prev, cfg, useXxhash64 = true),
      CdcMerge.withHashes(curr, cfg, useXxhash64 = true),
      cfg, withPriors = true)

  private def assertSame(maintained: DataFrame, recomputed: DataFrame): Unit = {
    assert(maintained.schema === recomputed.schema,
      "maintained state schema drifted from the recompute")
    assert(maintained.exceptAll(recomputed).isEmpty
      && recomputed.exceptAll(maintained).isEmpty,
      "maintained state != recompute")
  }

  test("maintained view equals recompute across inserts, updates, group moves, deletes") {
    import spark.implicits._
    val v0 = (1L to 100L).map(k => IaRow(k, s"g${k % 5}", k * 1.25)).toDF()
    // batch 1: delete k%10==0; update k%7==0 (v += 10); k%14==0 ALSO moves
    // group; insert 101..110
    val v1 = ((1L to 100L)
      .filterNot(_ % 10 == 0)
      .map { k =>
        val moved = if (k % 14 == 0) s"g${(k + 1) % 5}" else s"g${k % 5}"
        if (k % 7 == 0) IaRow(k, moved, k * 1.25 + 10) else IaRow(k, s"g${k % 5}", k * 1.25)
      } ++ (101L to 110L).map(k => IaRow(k, s"g${k % 5}", k * 1.25))).toDF()

    val state0 = IncrementalAgg.init(v0, spec)
    assertSame(state0, IncrementalAgg.init(v0, spec))

    val state1 = IncrementalAgg.maintain(state0, feedOf(v0, v1), spec)
    assertSame(state1, IncrementalAgg.init(v1, spec))

    // batch 2 chains on the MAINTAINED state: wipe out group g1 entirely,
    // plus one more plain update
    val v1rows = v1.as[IaRow].collect()
    val v2 = v1rows.filterNot(_.grp == "g1")
      .map(r => if (r.k == 3L) r.copy(v = r.v + 0.5) else r)
      .toSeq.toDF()
    val state2 = IncrementalAgg.maintain(state1, feedOf(v1, v2), spec)
    assertSame(state2, IncrementalAgg.init(v2, spec))
    assert(state2.filter($"grp" === "g1").isEmpty,
      "a fully-deleted group must drop out of the maintained view")
  }

  test("null group keys retract correctly (null-safe state join)") {
    import spark.implicits._
    // grp null is a legitimate group — init groups nulls together; the
    // maintenance join must match them too or retractions strand forever
    val v0 = Seq(IaRow(1, null, 5.0), IaRow(2, null, 7.0), IaRow(3, "g0", 1.0)).toDF()
    val v1 = Seq(IaRow(2, null, 9.0), IaRow(3, "g0", 1.0)).toDF() // 1 deleted, 2 updated
    val state1 = IncrementalAgg.maintain(
      IncrementalAgg.init(v0, spec), feedOf(v0, v1), spec)
    assertSame(state1, IncrementalAgg.init(v1, spec))
    val nullRow = state1.filter($"grp".isNull).collect()
    assert(nullRow.length === 1 && nullRow(0).getLong(1) === 1L,
      "null group must hold exactly the surviving row")
  }

  test("count-only spec: group moves retract from the OLD group") {
    import spark.implicits._
    val countSpec = IncrementalAgg.Spec(groupCols = Seq("grp"), sumCols = Nil)
    val v0 = Seq(IaRow(1, "g0", 1.0), IaRow(2, "g0", 2.0)).toDF()
    val v1 = Seq(IaRow(1, "g1", 1.0), IaRow(2, "g0", 2.0)).toDF() // 1 moves g0→g1
    val state1 = IncrementalAgg.maintain(
      IncrementalAgg.init(v0, countSpec), feedOf(v0, v1), countSpec)
    assertSame(state1, IncrementalAgg.init(v1, countSpec))
    // a priors-free feed is rejected even though sumCols is empty — at
    // RUN time, when the first U row streams through (a key-only config
    // that can never produce U stays legal)
    val noPriors = CdcMerge.classify(v0, v1, cfg, useXxhash64 = true)
    val e = intercept[Exception](
      IncrementalAgg.deltas(noPriors, countSpec).collect())
    assert(e.getMessage.contains("no prior images"),
      s"wrong failure: ${e.getMessage}")
  }

  test("a priors-free feed WITHOUT update rows is legal for count specs") {
    import spark.implicits._
    // an insert/delete-only feed (e.g. an append+retention log) carries
    // no __old_ columns and needs none — the in-plan guard must let it
    // through and only fail when an actual U row streams past
    val cSpec = IncrementalAgg.Spec(groupCols = Seq("grp"), sumCols = Nil)
    val state0 = IncrementalAgg.init(
      Seq("g0", "g0", "g1").toDF("grp"), cSpec)
    val feed = Seq(("g0", "D"), ("g1", "I"), ("g2", "I"))
      .toDF("grp", CdcMerge.OpCol)
    val state1 = IncrementalAgg.maintain(state0, feed, cSpec)
    assertSame(state1, IncrementalAgg.init(
      Seq("g0", "g1", "g1", "g2").toDF("grp"), cSpec))
  }

  test("deltas demand prior images — a priors-free feed fails loudly") {
    import spark.implicits._
    val a = Seq(IaRow(1, "g0", 1.0)).toDF()
    val b = Seq(IaRow(1, "g0", 2.0)).toDF()
    val noPriors = CdcMerge.classify(a, b, cfg, useXxhash64 = true)
    val e = intercept[IllegalArgumentException](
      IncrementalAgg.deltas(noPriors, spec))
    assert(e.getMessage.contains("__old_v"))
  }

  test("an all-N feed is a no-op on the maintained state") {
    import spark.implicits._
    val v0 = (1L to 20L).map(k => IaRow(k, s"g${k % 3}", k * 2.0)).toDF()
    val state0 = IncrementalAgg.init(v0, spec)
    val state1 = IncrementalAgg.maintain(state0, feedOf(v0, v0), spec)
    assertSame(state1, state0)
  }
}
