package graft

import graft.cdc.{CdcConfig, CdcMerge, IncrementalJoin}
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The maintained join view must equal a fresh full re-join BIT-EXACTLY
  * after every batch — inserts, value updates, deletes, dim-side churn,
  * and FK moves (the join key itself changing under an update). */
class IncrementalJoinSpec extends AnyFunSuite with SparkFixture {

  private val cfgA = CdcConfig(Seq("line_id"), Seq("order_id", "qty"))
  private val cfgB = CdcConfig(Seq("o_id"), Seq("status"))
  private val spec = IncrementalJoin.Spec(Seq("order_id"), Seq("o_id"))

  private def dfA(rows: Seq[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("line_id", "order_id", "qty")
  }
  private def dfB(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("o_id", "status")
  }

  private def feed(prev: DataFrame, curr: DataFrame, cfg: CdcConfig) =
    CdcMerge.classifyHashed(CdcMerge.withHashes(prev, cfg),
      CdcMerge.withHashes(curr, cfg), cfg, withPriors = true)

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  test("maintained view tracks recompute through I/U/D on both sides") {
    val a0 = dfA(Seq((1L, 10L, 5.0), (2L, 10L, 2.0), (3L, 20L, 1.0),
      (4L, 30L, 4.0)))
    val b0 = dfB(Seq((10L, "open"), (20L, "open"), (30L, "done")))
    val view0 = IncrementalJoin.init(a0, b0, spec)
    assert(rows(view0).size === 4)

    // batch 1: fact insert + delete + value update; dim update + insert
    // + delete (order 30 goes away — its lineitem must drop from the view)
    val a1 = dfA(Seq((1L, 10L, 5.0), (3L, 20L, 9.0), (4L, 30L, 4.0),
      (5L, 20L, 7.0)))
    val b1 = dfB(Seq((10L, "hold"), (20L, "open"), (40L, "new")))
    val view1 = IncrementalJoin.maintain(view0, a1, feed(a0, a1, cfgA),
      b1, feed(b0, b1, cfgB), spec)
    assert(rows(view1) === rows(IncrementalJoin.init(a1, b1, spec)))

    // batch 2: FK MOVE — line 1 rehomes from order 10 to order 20; the
    // update's prior image must touch BOTH keys (10 loses a row, 20
    // gains one). Dim side quiet.
    val a2 = dfA(Seq((1L, 20L, 5.0), (3L, 20L, 9.0), (4L, 30L, 4.0),
      (5L, 20L, 7.0)))
    val view2 = IncrementalJoin.maintain(view1, a2, feed(a1, a2, cfgA),
      b1, feed(b1, b1, cfgB), spec)
    assert(rows(view2) === rows(IncrementalJoin.init(a2, b1, spec)))

    // batch 3: nothing changed — all-N feeds must leave the view intact
    val view3 = IncrementalJoin.maintain(view2, a2, feed(a2, a2, cfgA),
      b1, feed(b1, b1, cfgB), spec)
    assert(rows(view3) === rows(view2))
  }

  test("fan-out change cannot double-count: new match arrives for touched key") {
    // order 20 starts with one lineitem; a second arrives in the same
    // batch as a dim-side status flip — the whole key group is rebuilt,
    // exactly once
    val a0 = dfA(Seq((1L, 20L, 1.0)))
    val b0 = dfB(Seq((20L, "open")))
    val a1 = dfA(Seq((1L, 20L, 1.0), (2L, 20L, 2.0)))
    val b1 = dfB(Seq((20L, "shut")))
    val v = IncrementalJoin.maintain(IncrementalJoin.init(a0, b0, spec),
      a1, feed(a0, a1, cfgA), b1, feed(b0, b1, cfgB), spec)
    assert(rows(v) === rows(IncrementalJoin.init(a1, b1, spec)))
  }

  test("property: maintained == recompute over random multi-batch evolutions") {
    // Small key domains force every event class — inserts, deletes,
    // value updates, FK moves (order_id is drawn fresh each epoch, so a
    // surviving line frequently rehomes), dim churn, dangling FKs, and
    // M:N fan-out (several lines share an order). 8 seeds × 3 epochs,
    // view threaded across epochs and compared to a fresh re-join after
    // every one.
    val lineGen: Gen[List[(Long, Long, Double)]] =
      Gen.listOfN(24, for {
        id <- Gen.choose(0L, 15L)
        oid <- Gen.choose(0L, 7L)
        qty <- Gen.choose(0, 999).map(_ / 10.0)
      } yield (id, oid, qty)).map(_.groupBy(_._1).values.map(_.head).toList)
    val dimGen: Gen[List[(Long, String)]] =
      Gen.listOfN(10, for {
        oid <- Gen.choose(0L, 7L)
        st <- Gen.oneOf("open", "hold", "done")
      } yield (oid, st)).map(_.groupBy(_._1).values.map(_.head).toList)
    val epochsGen = Gen.zip(Gen.listOfN(3, lineGen), Gen.listOfN(3, dimGen))
    (0 until 8).foreach { i =>
      val (as, bs) =
        epochsGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      var aPrev = dfA(Nil); var bPrev = dfB(Nil)
      var view = IncrementalJoin.init(aPrev, bPrev, spec)
      as.zip(bs).foreach { case (aRows, bRows) =>
        val (aCurr, bCurr) = (dfA(aRows), dfB(bRows))
        view = IncrementalJoin.maintain(view, aCurr,
          feed(aPrev, aCurr, cfgA), bCurr, feed(bPrev, bCurr, cfgB), spec)
        assert(rows(view) === rows(IncrementalJoin.init(aCurr, bCurr, spec)),
          s"seed $i diverged from recompute")
        aPrev = aCurr; bPrev = bCurr
      }
    }
  }

  test("maintainJoinView tracks two on-disk CDC streams end-to-end") {
    import java.nio.file.Files
    import graft.streaming.CdcStream
    val dirL = Files.createTempDirectory("ij_left").toString
    val dirR = Files.createTempDirectory("ij_right").toString
    val viewDir = Files.createTempDirectory("ij_view").toString

    val a0 = dfA(Seq((1L, 10L, 5.0), (2L, 10L, 2.0), (3L, 20L, 1.0)))
    val b0 = dfB(Seq((10L, "open"), (20L, "open")))
    // feedPriors = true: order_id is a VALUE column on the left side (an
    // FK that can move under U) — the maintainJoinView contract
    CdcStream.mergeBatch(a0, 0, cfgA, dirL, buckets = 2, feedPriors = true)
    CdcStream.mergeBatch(b0, 0, cfgB, dirR, buckets = 2, feedPriors = true)
    val v0 = CdcStream.maintainJoinView(spark, dirL, dirR, viewDir, spec)
    assert(v0.isDefined)
    assert(rows(spark.read.parquet(s"$viewDir/v${v0.get}")) ===
      rows(IncrementalJoin.init(a0, b0, spec)))

    // batch 1: FK move (line 1: 10→20), fact delete (line 2), dim
    // update + insert
    val a1 = dfA(Seq((1L, 20L, 5.0), (3L, 20L, 1.0)))
    val b1 = dfB(Seq((10L, "hold"), (20L, "open"), (30L, "new")))
    CdcStream.mergeBatch(a1, 1, cfgA, dirL, buckets = 2, feedPriors = true)
    CdcStream.mergeBatch(b1, 1, cfgB, dirR, buckets = 2, feedPriors = true)
    val v1 = CdcStream.maintainJoinView(spark, dirL, dirR, viewDir, spec)
    assert(v1.isDefined && v1.get > v0.get)
    assert(rows(spark.read.parquet(s"$viewDir/v${v1.get}")) ===
      rows(IncrementalJoin.init(a1, b1, spec)))

    // no new committed batches → no phantom generation
    assert(CdcStream.maintainJoinView(spark, dirL, dirR, viewDir, spec)
      .isEmpty)
  }

  test("maintainJoinView sweeps superseded generations after each commit") {
    import java.nio.file.Files
    import graft.streaming.CdcStream
    val dirL = Files.createTempDirectory("ijr_left").toString
    val dirR = Files.createTempDirectory("ijr_right").toString
    val viewDir = Files.createTempDirectory("ijr_view").toString
    def generations(): Set[String] =
      Option(new java.io.File(viewDir).list()).map(_.toSet).getOrElse(Set())
        .filter(_.startsWith("v"))
    val a0 = dfA(Seq((1L, 10L, 5.0))); val b0 = dfB(Seq((10L, "open")))
    CdcStream.mergeBatch(a0, 0, cfgA, dirL, buckets = 2, feedPriors = true)
    CdcStream.mergeBatch(b0, 0, cfgB, dirR, buckets = 2, feedPriors = true)
    val v0 = CdcStream.maintainJoinView(spark, dirL, dirR, viewDir, spec).get
    assert(generations() === Set(s"v$v0"))
    // two more advances: only the newest committed generation may remain
    val a1 = dfA(Seq((1L, 10L, 6.0)))
    CdcStream.mergeBatch(a1, 1, cfgA, dirL, buckets = 2, feedPriors = true)
    val v1 = CdcStream.maintainJoinView(spark, dirL, dirR, viewDir, spec).get
    assert(generations() === Set(s"v$v1"), s"v$v0 must be swept")
    val b1 = dfB(Seq((10L, "hold")))
    CdcStream.mergeBatch(b1, 1, cfgB, dirR, buckets = 2, feedPriors = true)
    val v2 = CdcStream.maintainJoinView(spark, dirL, dirR, viewDir, spec).get
    assert(generations() === Set(s"v$v2"), s"older generations must be swept")
    // and the surviving generation is still the correct maintained view
    assert(rows(spark.read.parquet(s"$viewDir/v$v2")) ===
      rows(IncrementalJoin.init(a1, b1, spec)))
  }

  test("maintainJoinView heals a crash between parquet commit and frontier") {
    import java.nio.file.Files
    import graft.streaming.CdcStream
    val dirL = Files.createTempDirectory("ijc_left").toString
    val dirR = Files.createTempDirectory("ijc_right").toString
    val viewDir = Files.createTempDirectory("ijc_view").toString
    val a0 = dfA(Seq((1L, 10L, 5.0))); val b0 = dfB(Seq((10L, "open")))
    CdcStream.mergeBatch(a0, 0, cfgA, dirL, buckets = 2, feedPriors = true)
    CdcStream.mergeBatch(b0, 0, cfgB, dirR, buckets = 2, feedPriors = true)
    val v0 = CdcStream.maintainJoinView(spark, dirL, dirR, viewDir, spec).get
    // simulate the crash: the NEXT generation's parquet landed but the
    // frontier marker never did
    val a1 = dfA(Seq((1L, 10L, 9.0)))
    CdcStream.mergeBatch(a1, 1, cfgA, dirL, buckets = 2, feedPriors = true)
    val orphan = new java.io.File(s"$viewDir/v${v0 + 1}")
    IncrementalJoin.init(dfA(Seq((99L, 99L, 0.0))), dfB(Seq((99L, "bogus"))),
      spec).write.mode("overwrite").parquet(orphan.toString)
    assert(new java.io.File(orphan, "_SUCCESS").exists)
    // advance must IGNORE the frontier-less orphan (discovery requires
    // both markers), maintain from v0, and overwrite the orphan
    val v1 = CdcStream.maintainJoinView(spark, dirL, dirR, viewDir, spec)
    assert(v1.contains(v0 + 1))
    assert(rows(spark.read.parquet(s"$viewDir/v${v1.get}")) ===
      rows(IncrementalJoin.init(a1, b0, spec)),
      "healed generation must hold the maintained view, not the orphan")
  }

  test("broadcastKeyLimit guard: over-limit batch takes the shuffle path") {
    // a "backfill replay" batch touching more keys than the limit must
    // NOT be forced through the driver as a broadcast — with the hint
    // withheld (and static auto-broadcast off) the plan degrades to
    // shuffle joins, and the result is still bit-equal to the recompute
    val a0 = dfA((1L to 40L).map(i => (i, i % 8, 1.0)))
    val b0 = dfB((0L to 7L).map(i => (i, "open")))
    val a1 = dfA((1L to 40L).map(i => (i, i % 8, 2.0)))  // every row updates
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val guarded = spec.copy(broadcastKeyLimit = 2L)
      val v = IncrementalJoin.maintain(IncrementalJoin.init(a0, b0, spec),
        a1, feed(a0, a1, cfgA), b0, feed(b0, b0, cfgB), guarded)
      assert(!v.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "over-limit touched set must not plan a static broadcast")
      assert(rows(v) === rows(IncrementalJoin.init(a1, b0, spec)))
      // and under the default limit the hint still forces the broadcast
      // even with static auto-broadcast disabled
      val hintedPlan = IncrementalJoin.maintain(
          IncrementalJoin.init(a0, b0, spec), a1, feed(a0, a1, cfgA),
          b0, feed(b0, b0, cfgB), spec)
        .queryExecution.sparkPlan.toString
      assert(hintedPlan.contains("BroadcastHashJoin"),
        "feed-sized touched set must keep the broadcast hint")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("maintenance plan is touched-key bounded: anti + two semi probes") {
    val a0 = dfA(Seq((1L, 10L, 5.0))); val b0 = dfB(Seq((10L, "open")))
    val a1 = dfA(Seq((1L, 10L, 6.0)))
    val plan = IncrementalJoin.maintain(IncrementalJoin.init(a0, b0, spec),
        a1, feed(a0, a1, cfgA), b0, feed(b0, b0, cfgB), spec)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), "survivors must anti-join touched keys")
    assert("LeftSemi".r.findAllIn(plan).size >= 2,
      "both recompute slices must semi-join down to touched keys")
  }
}
