package graft

import graft.ops.ReshapeOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reshape pillar: unpivot conservation laws and gap-fill calendar /
  * LOCF invariants that the row-hash oracle can't articulate. */
class ReshapeOpsSpec extends AnyFunSuite with SparkFixture {

  test("q_unpivot conserves rows and min/max per metric") {
    val nLine = Tables.lineitem(spark, Sf).count()
    val rows = ReshapeOps.unpivot.fn(spark, Sf).collect()
    assert(rows.length === 4)
    assert(rows.map(_.getLong(1)).sum === 4 * nLine,
      "each input row must melt into exactly 4 metric rows")
    val byMetric = rows.map(r => r.getString(0) -> r).toMap
    val qty = Tables.lineitem(spark, Sf)
      .agg(min("l_quantity"), max("l_quantity")).collect()(0)
    assert(byMetric("quantity").getDouble(3) === qty.getDouble(0))
    assert(byMetric("quantity").getDouble(4) === qty.getDouble(1))
  }

  test("q_gapfill: complete contiguous calendar per priority, zeros filled, LOCF correct") {
    val rows = ReshapeOps.gapfill.fn(spark, Sf).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val byP = rows.groupBy(_._1)
    assert(byP.size === 5)
    val span = rows.map(_._2.toLocalDate).distinct.sorted
    val expectDays =
      java.time.temporal.ChronoUnit.DAYS.between(span.head, span.last) + 1
    byP.foreach { case (p, rs) =>
      assert(rs.length.toLong === expectDays,
        s"$p calendar has holes: ${rs.length} days vs $expectDays")
      assert(rs.exists(_._3 == 0L), s"$p: no zero-filled gap days at this SF?")
      // LOCF: a zero-order day's price equals the previous day's carried
      // value; days before the first observation stay null
      val sorted = rs.sortBy(_._2.toLocalDate.toEpochDay)
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur._3 == 0L =>
          assert(cur._4 === prev._4,
            s"$p ${cur._2}: gap day must carry the previous value")
        case _ => ()
      }
      assert(sorted.takeWhile(_._3 == 0L).forall(_._4.isEmpty),
        "leading gap days (before any observation) must stay null")
    }
  }
}
