package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the kept-chain throttle (q_throttle_chain) — it has no ANSI
  * oracle (greedy chains are sequential), so the verification is (1) the
  * defining gap invariant on the output, (2) set relations against the
  * lag-based dedup, (3) equality with a driver-side sequential reference
  * on a sampled key set.
  */
class ThrottleSpec extends AnyFunSuite with SparkFixture {

  private val GapUs = 21600000000L

  test("kept output: no two survivors within the gap; first event always kept") {
    val kept = ops.ImplOps.throttleChain.fn(spark, Sf)
    val withTs = kept.join(
      Tables.events(spark, Sf).select(col("event_id"),
        unix_micros(col("ts")).as("us")), "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("us", "event_id")
    val violations = withTs
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull && col("gap") < GapUs)
    assert(violations.count() === 0, "two survivors within the gap")
    // the first event of every key survives by definition
    val firsts = Tables.events(spark, Sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1).select("event_id")
    assert(firsts.join(kept, "event_id", "left_anti").count() === 0)
  }

  test("lag-dedup survivors are a subset of chain-throttle survivors") {
    // keep-first-of-session (the lag filter) can only keep FEWER events:
    // its gate needs a ≥gap pause since ANY previous event, the chain's
    // only since the last survivor
    val lagKept = ops.StreamShapeOps.eventDedupWindow.fn(spark, Sf)
      .select("event_id")
    val chainKept = ops.ImplOps.throttleChain.fn(spark, Sf).select("event_id")
    assert(lagKept.join(chainKept, "event_id", "left_anti").count() === 0,
      "lag-dedup kept an event the chain dropped")
    // and on this data the chain keeps strictly more (drizzle exists)
    assert(chainKept.count() > lagKept.count())
  }

  test("matches a sequential reference implementation on every key") {
    val evs = Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = evs.groupBy(e => (e._2, e._3)).valuesIterator.flatMap { g =>
      val sorted = g.sortBy(e => (e._4, e._1))
      var lastKept = Long.MinValue
      sorted.flatMap { case (id, _, _, us) =>
        if (lastKept == Long.MinValue || us - lastKept >= GapUs) {
          lastKept = us; Some(id)
        } else None
      }
    }.toSet
    val got = ops.ImplOps.throttleChain.fn(spark, Sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }
}
