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

  private def eventsUs = Tables.events(spark, Sf)
    .select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))

  test("bucketedChain equals sequentialChain on the whole events table") {
    val seq = ops.ThrottleScale.sequentialChain(eventsUs, GapUs)
    val bkt = ops.ThrottleScale.bucketedChain(eventsUs, GapUs)
    assert(seq.exceptAll(bkt).isEmpty && bkt.exceptAll(seq).isEmpty,
      "bucketed fallback disagrees with the sequential shape")
  }

  test("planted hot key routes through the bucketed path and stays exact") {
    import spark.implicits._
    // a bot key firing every ~17 min for ~90 days: 7680 events — hot
    // under a 1000-event threshold while every organic key stays cold.
    // Sub-gap drizzle means survivors depend on true chain semantics.
    val t0 = 1704103200000000L
    val bot = (0 until 7680)
      .map(i => (10000000L + i, 999999L, "bot_ping", t0 + i * 1013000000L))
      .toDF("event_id", "user_id", "event_type", "us")
    val mixed = eventsUs.unionByName(bot)
    val guarded = ops.ThrottleScale
      .guardedChain(mixed, GapUs, hotKeyThreshold = 1000L)
    val reference = ops.ThrottleScale.sequentialChain(mixed, GapUs)
    assert(guarded.exceptAll(reference).isEmpty &&
      reference.exceptAll(guarded).isEmpty,
      "guarded routing changed the survivor set")
    // the planted key really is the hot route: survivors every
    // ceil(6h/1013s)·1013s = 22286 s, so the ~90-day window keeps
    // 7680·1013/22286 ≈ 350, not 7680
    val botKept = guarded.filter(col("user_id") === 999999L).count()
    assert(botKept === 350L, s"bot survivors: $botKept")
  }

  test("bucketedChain edges: empty input, single event, exact-gap spacing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, String, Long)]
      .toDF("event_id", "user_id", "event_type", "us")
    assert(ops.ThrottleScale.bucketedChain(empty, GapUs).count() === 0)
    val one = Seq((1L, 7L, "a", 123456789L))
      .toDF("event_id", "user_id", "event_type", "us")
    assert(ops.ThrottleScale.bucketedChain(one, GapUs).count() === 1)
    // events exactly gap apart: ALL kept (>= gap opens the gate); one
    // event gap-1 after a survivor: dropped
    val spaced = (0 until 5).map(i => (i.toLong, 7L, "a", i * GapUs)) :+
      ((99L, 7L, "a", 2 * GapUs + GapUs - 1))
    val out = ops.ThrottleScale
      .bucketedChain(spaced.toDF("event_id", "user_id", "event_type", "us"),
        GapUs)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(0L, 1L, 2L, 3L, 4L), s"got $out")
  }
}
