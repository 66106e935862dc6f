package graft

import graft.sources.Observe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Free-ride audit metrics: observed aggregates equal their directly
  * computed twins, ride the SAME action (no extra job), and work per
  * micro-batch on streams. */
class ObserveSpec extends AnyFunSuite with SparkFixture {

  test("batch: observed metrics equal direct aggregation, computed on the driving action") {
    val li = Tables.lineitem(spark, Sf)
    val tagged = Observe.tagged(li, "ingest_audit",
      "rows" -> count(lit(1)),
      "qty_sum" -> sum(col("l_quantity").cast("decimal(28,12)")),
      "null_ship" -> count(when(col("l_shipdate").isNull, 1)))
    // before any action the metrics read as aggregation zeros
    assert(Observe.metricsOf(tagged, "ingest_audit")
      .forall(_("rows") === 0L))
    // the audit rides a DOWNSTREAM query's pass, not its own job: the
    // observe node travels inside the downstream plan, and the metrics
    // are read off the frame the action actually ran on
    val downstream = tagged.filter(col("l_quantity") > 10)
      .agg(sum(col("l_extendedprice")))
    assert(downstream.collect().nonEmpty)
    val m = Observe.metricsOf(downstream, "ingest_audit")
      .getOrElse(fail("metrics missing after the driving action"))
    val direct = li.agg(count(lit(1)),
      sum(col("l_quantity").cast("decimal(28,12)")),
      count(when(col("l_shipdate").isNull, 1))).collect()(0)
    assert(m("rows") === direct.getLong(0))
    assert(m("qty_sum") === direct.getDecimal(1))
    assert(m("null_ship") === direct.getLong(2))
  }

  test("streaming: observed metrics surface per micro-batch in the progress feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val tagged = Observe.tagged(ms.toDF(), "stream_audit",
      "rows" -> count(lit(1)), "v_sum" -> sum(col("value")))
    val q = tagged.writeStream.format("noop").start()
    try {
      ms.addData(1L, 2L, 3L)
      q.processAllAvailable()
      val obs = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("stream_audit"))).lastOption
        .getOrElse(fail("no observed metrics in streaming progress"))
      assert(obs.getAs[Long]("rows") === 3L)
      assert(obs.getAs[Long]("v_sum") === 6L)
    } finally q.stop()
  }
}
