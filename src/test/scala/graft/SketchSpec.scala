package graft

import graft.ops.SketchOps
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import org.scalatest.funsuite.AnyFunSuite

/** Sketch operators: error bounds vs exact ground truth, and the merge
  * laws that make sketches the scale path (partials union to the whole,
  * independent of partitioning/order). */
class SketchSpec extends AnyFunSuite with SparkFixture {

  test("q_sketch_hll: estimates within HLL error of exact; union covers global distinct") {
    val rows = SketchOps.sketchHll.fn(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      // lgConfigK=12 → relative standard error ~1.04/sqrt(2^12) ≈ 1.6%;
      // 5σ bound keeps the test deterministic-in-practice
      assert(math.abs(est - exact) <= math.max(5, 0.08 * exact),
        s"type ${r.getString(0)}: est $est vs exact $exact")
    }
    val globalExact = Tables.events(spark, Sf)
      .agg(countDistinct(col("user_id"))).head.getLong(0)
    val unionEst = rows.head.getLong(3)
    assert(math.abs(unionEst - globalExact) <= math.max(5, 0.08 * globalExact))
  }

  test("q_sketch_hll: sketch union is partitioning-invariant (merge law)") {
    val ev = Tables.events(spark, Sf).select("user_id")
    def unionEst(parts: Int): Long = ev.repartition(parts)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .head.getLong(0)
    // HLL merge is max-per-register — associative, commutative, idempotent
    assert(unionEst(1) === unionEst(7))
  }

  test("q_sketch_cms: point estimates over-count by at most eps * N") {
    val row = SketchOps.sketchCms.fn(spark, Sf).head
    val cms = CountMinSketch.readFrom(row.getAs[Array[Byte]]("cms"))
    val n = row.getAs[Long]("n_tokens")
    val exact = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(cms.totalCount() === n)
    exact.foreach { case (tok, cnt) =>
      val est = cms.estimateCount(tok)
      assert(est >= cnt, s"CMS must never under-count ($tok)")
      assert(est <= cnt + math.ceil(0.001 * n).toLong + 1, s"eps bound ($tok)")
    }
  }

  test("q_sketch_cms: sketch is partitioning-invariant (cell-wise-add merge law)") {
    def sketch(parts: Int): CountMinSketch = {
      val row = Tables.documents(spark, Sf)
        .select(explode(split(col("text"), " ")).as("token"))
        .repartition(parts)
        .agg(count_min_sketch(col("token"), lit(0.001d), lit(0.99d), lit(42))
          .as("cms")).head
      CountMinSketch.readFrom(row.getAs[Array[Byte]]("cms"))
    }
    val (a, b) = (sketch(1), sketch(5))
    // identical seed → identical hash rows; merge = cell-wise add, so the
    // final table is exactly equal however the rows were partitioned
    val probe = Seq("scan", "join", "the", "a", "nonexistent-token")
    probe.foreach(t => assert(a.estimateCount(t) === b.estimateCount(t)))
  }

  test("HLL sketch aggregates in a stream: complete-mode estimates equal batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, Sf)
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)].collect().toSeq
    val ms = MemoryStream[(String, Long)]
    val q = ms.toDF.toDF("event_type", "user_id")
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("approx_users"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      val (a, b) = evs.splitAt(evs.length / 2)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hll_stream").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, Sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("approx_users")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // same sketch algorithm over the same rows — merge order cannot
    // change HLL register maxima, so estimates are exactly equal
    assert(streamed === batch)
  }

  test("q_sketch_quantile: approx quantiles bracket the exact discrete quantiles") {
    // flattened output: one row per (segment, p) — all scalar columns
    val approx = SketchOps.sketchQuantile.fn(spark, Sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val segs = approx.keySet.map(_._1)
    segs.foreach { seg =>
      val qs = Seq(0.25, 0.5, 0.75).map(p => approx((seg, p))._1)
      val (_, lo, hi) = approx((seg, 0.5))
      // accuracy 10^4 on ~300 rows/segment → exact rank; values must be
      // non-decreasing across p and lie within the segment's range
      assert(qs(0) <= qs(1) && qs(1) <= qs(2))
      qs.foreach(q => assert(q >= lo && q <= hi))
    }
    graft.ops.CurateOps.quantileDisc.fn(spark, Sf).collect().foreach { r =>
      val seg = r.getString(0)
      val (med, lo, hi) = approx((seg, 0.5))
      assert(math.abs(med - r.getDouble(2)) <= (hi - lo) * 0.05,
        s"$seg median drift")
    }
  }

  test("q_rolling_hll: merged daily sketches track exact rolling distinct") {
    val exact = graft.ops.StreamShapeOps.rollingDistinct.fn(spark, Sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val est = SketchOps.rollingHll.fn(spark, Sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1).toDouble)
      .toMap
    assert(est.keySet === exact.keySet,
      "sketch path must emit exactly the exact path's window-end days")
    // lgK=12 → relative standard error ≈ 1.04/√2¹² ≈ 1.6%; allow 4σ plus
    // integer slack for tiny windows
    est.foreach { case (day, e) =>
      val x = exact(day).toDouble
      assert(math.abs(e - x) <= math.max(4, x * 0.065),
        s"window $day: est $e vs exact $x")
    }
  }
}
