package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale paths for the kept-chain throttle (q_throttle_chain): drop an
  * event within `gapUs` of the last KEPT event for its (user, type).
  *
  * Greedy chains are sequential per key, so the natural batch shape is
  * `flatMapGroups` ([[sequentialChain]]) — but that materializes one
  * ARRAY per key in a task, which a pathological hot key (bot traffic,
  * a tag-everything type) can blow past task memory. The fallback
  * ([[bucketedChain]]) removes that bound EXACTLY, with no task ever
  * holding more than one time bucket of one key:
  *
  *  1. Bucket width = gap. An event in bucket b has its successor
  *     (first event with `us >= us_e + gap`) either IN bucket b+1 —
  *     because `us_e + gap` always lands in bucket b+1 — or, when
  *     bucket b+1 has nothing at/after the threshold, at the FIRST
  *     event of the nearest non-empty bucket >= b+2 (any such event
  *     clears the threshold automatically). So `next` pointers need
  *     only (b, b+1) cogroups (two sorted iterators, one merge pass,
  *     task-bounded by one bucket) plus a per-key bucket-frame lookup
  *     (rows = non-empty buckets, bounded by CALENDAR/gap, not data).
  *  2. The greedy chain IS the `next`-pointer path from the key's
  *     first event: after keeping e, the next survivor is exactly
  *     next(e). Pointer DOUBLING materializes the whole path in
  *     ceil(log2(chain length)) rounds of hash self-joins — chain
  *     length <= time-span/gap + 1, so rounds are calendar-bounded
  *     too (a decade of 6 h buckets is 15 rounds).
  *
  * [[guardedChain]] routes: per-key counts (one hash agg) split keys at
  * `hotKeyThreshold`; cold keys take the cheap sequential shape, hot
  * keys the bucketed one. Results are identical by construction —
  * ThrottleSpec law-checks both paths against a driver-side reference
  * and forces a planted hot key through the bucketed path.
  *
  * The STREAMING twin ([[graft.streaming.StreamOps.throttleChain]])
  * needs none of this: its state is one `lastKept` per key.
  */
object ThrottleScale {

  /** (event_id, user_id, event_type, us) — the wire shape both paths
    * consume and produce (output drops `us`). */
  private type Ev = (Long, Long, String, Long)

  /** The baseline per-key shape: hash-shuffle on the key, one in-group
    * sort, linear scan. Exact; per-key event list must fit a task. */
  def sequentialChain(events: DataFrame, gapUs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    asEv(events)
      .groupByKey { case (_, u, t, _) => (u, t) }
      .flatMapGroups { (_: (Long, String), it: Iterator[Ev]) =>
        val evs = it.toArray.sortBy(e => (e._4, e._1)) // total: (ts, id)
        val out = Seq.newBuilder[(Long, Long, String)]
        var lastKept = Long.MinValue
        for ((id, u, t, us) <- evs)
          if (lastKept == Long.MinValue || us - lastKept >= gapUs) {
            out += ((id, u, t)); lastKept = us
          }
        out.result()
      }
      .toDF("event_id", "user_id", "event_type")
  }

  /** Hot-key fallback: exact kept-chain with every task bounded to one
    * (key, gap-width bucket) slice. See object doc for the argument. */
  def bucketedChain(events: DataFrame, gapUs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val ev = asEv(events).cache()
    val span = ev.toDF("event_id", "user_id", "event_type", "us")
      .agg(min("us"), max("us")).collect()(0)
    if (span.isNullAt(0)) { ev.unpersist(); return emptyOut(s) }
    // chain length <= span/gap + 2 => doubling rounds are log2 of that
    val maxChain = (span.getLong(1) - span.getLong(0)) / gapUs + 2
    val rounds = 64 - java.lang.Long.numberOfLeadingZeros(maxChain).toInt

    def bucket(us: Long): Long = Math.floorDiv(us, gapUs)

    // next-in-pair: events of bucket b (queries, keyed at b+1) merged
    // against events of bucket b+1 (candidates, keyed at their own b).
    // Both iterators sort ONE bucket of ONE key — the task bound.
    val queries = ev.groupByKey(e => (e._2, e._3, bucket(e._4) + 1))
    val cands = ev.groupByKey(e => (e._2, e._3, bucket(e._4)))
    val nextInPair = queries.cogroup(cands) { case (_, qs, cs) =>
      val qarr = qs.toArray.sortBy(e => (e._4, e._1))
      val carr = cs.toArray.sortBy(e => (e._4, e._1))
      var j = 0
      val out = Seq.newBuilder[(Long, Long, Long)] // from_id, to_id, to_us
      for (q <- qarr) { // thresholds ascend with q => j is monotone
        val thr = q._4 + gapUs
        while (j < carr.length && carr(j)._4 < thr) j += 1
        if (j < carr.length) out += ((q._1, carr(j)._1, carr(j)._4))
      }
      out.result()
    }.toDF("from_id", "pair_to_id", "pair_to_us")

    // bucket frame per key: first event of each non-empty bucket, plus
    // the first event of the nearest non-empty bucket >= b+2 ("skip"
    // target). Rows per key = non-empty buckets — calendar-bounded.
    val fb = ev
      .groupByKey(e => (e._2, e._3, bucket(e._4)))
      .mapGroups { (k: (Long, String, Long), it: Iterator[Ev]) =>
        val (us, id) = it.map(e => (e._4, e._1)).min
        (k._1, k._2, k._3, id, us)
      }
    val skip = fb
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (k: (Long, String),
          it: Iterator[(Long, String, Long, Long, Long)]) =>
        val arr = it.toArray.sortBy(_._3)
        var j = 0
        arr.indices.iterator.flatMap { i =>
          while (j < arr.length && arr(j)._3 < arr(i)._3 + 2) j += 1
          // first event of any bucket >= b+2 IS the first event at or
          // after (b+2)*gap: buckets are time-monotone
          if (j < arr.length)
            Some((k._1, k._2, arr(i)._3, arr(j)._4, arr(j)._5))
          else None
        }
      }.toDF("s_user", "s_type", "s_bkt", "skip_to_id", "skip_to_us")

    val evDf = ev.toDF("event_id", "user_id", "event_type", "us")
      .withColumn("bkt", expr(s"us div $gapUs") -
        when(col("us") < 0 && expr(s"us % $gapUs") =!= 0, 1).otherwise(0))
    // next(e): the bucket-pair hit if any, else the skip target
    val next = evDf
      .join(nextInPair, evDf("event_id") === nextInPair("from_id"), "left")
      .join(skip, col("user_id") === col("s_user") &&
        col("event_type") === col("s_type") && col("bkt") === col("s_bkt"),
        "left")
      .select(col("event_id").as("j_from"),
        coalesce(col("pair_to_id"), col("skip_to_id")).as("j_to"))
      .filter(col("j_to").isNotNull)

    // heads: every key's first event is kept by definition
    val heads = evDf.groupBy("user_id", "event_type")
      .agg(min(struct(col("us"), col("event_id"))).as("fe"))
      .select(col("fe.event_id").as("event_id"))

    // pointer doubling: S_r = first 2^r survivors, J_r = 2^r-step jumps.
    // S_r and J_r(S_r) are disjoint (jumps go strictly forward), so the
    // union needs no distinct. Checkpoints truncate the doubling lineage.
    var surv = heads.localCheckpoint(true)
    var jump = next.localCheckpoint(true)
    for (_ <- 1 to rounds) {
      surv = surv.union(
          surv.join(jump, surv("event_id") === jump("j_from"))
            .select(col("j_to").as("event_id")))
        .localCheckpoint(true)
      jump = jump.as("a")
        .join(jump.as("b"), col("a.j_to") === col("b.j_from"))
        .select(col("a.j_from").as("j_from"), col("b.j_to").as("j_to"))
        .localCheckpoint(true)
    }
    ev.unpersist()
    surv.join(evDf, "event_id")
      .select("event_id", "user_id", "event_type")
  }

  /** Routed chain: cold keys sequential, keys past `hotKeyThreshold`
    * bucketed. The router costs one per-key count aggregate. */
  def guardedChain(events: DataFrame, gapUs: Long,
      hotKeyThreshold: Long = 1L << 20): DataFrame = {
    val evDf = asEvDf(events)
    val hotKeys = evDf.groupBy("user_id", "event_type").count()
      .filter(col("count") > hotKeyThreshold)
      .select("user_id", "event_type")
    if (hotKeys.isEmpty) sequentialChain(evDf, gapUs)
    else {
      val cold = evDf.join(hotKeys, Seq("user_id", "event_type"),
        "left_anti")
      val hot = evDf.join(hotKeys, Seq("user_id", "event_type"),
        "left_semi")
      sequentialChain(cold, gapUs).unionByName(bucketedChain(hot, gapUs))
    }
  }

  private def asEvDf(events: DataFrame): DataFrame =
    events.select(col("event_id").cast(LongType),
      col("user_id").cast(LongType), col("event_type"),
      col("us").cast(LongType))

  private def asEv(events: DataFrame): Dataset[Ev] = {
    val s = events.sparkSession
    import s.implicits._
    asEvDf(events).as[Ev]
  }

  private def emptyOut(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(Long, Long, String)]
      .toDF("event_id", "user_id", "event_type")
  }
}
