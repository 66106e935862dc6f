package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view: the materialized inner equi-join
  * A ⋈ B kept current from the two sides' CDC change feeds in
  * O(|changes|) per batch — the join sibling of [[IncrementalAgg]], and
  * together with it the complete "materialized view over CDC" story: at
  * 100 TB you maintain the enriched/joined table, you do not re-join two
  * 100 TB inputs nightly.
  *
  * Maintenance algebra (affected-key recompute): a change on either side
  * can only create or destroy view rows whose JOIN KEY it touches, so
  *   V_new = V_old ∖ (rows with touched keys)
  *         ∪ (A_new|touched ⋈ B_new|touched).
  * "Touched" collects each feed row's NEW join key AND (for updates with
  * prior images, and deletes) its OLD join key — a key-moving update
  * touches both sides of the move; nothing else can differ between V_old
  * and a full recompute. This keyed form handles I/U/D uniformly, needs
  * no per-row retraction bookkeeping (unlike count-annotated delta
  * joins), and is exact for 1:N and M:N joins alike — the recompute
  * slice rebuilds a touched key's ENTIRE match group from the new
  * snapshots, so fan-out changes (a second lineitem arriving for an
  * order) can never double-count.
  *
  * Scale shape: the touched-key frame is feed-sized (broadcast); the
  * surviving-view pass is one anti-join against it and the recompute
  * slice semi-joins BOTH snapshots down to touched keys before the only
  * real join — every per-batch operator is O(|changes| · fan-out), and
  * with key-bucketed state ([[graft.streaming.CdcBucketed]] treatment
  * for the view and both snapshots) the anti/semi probes prune to
  * touched buckets instead of scanning.
  *
  * Null join keys never participate (inner equi-join semantics on both
  * the view and the recompute slice), so plain equality joins are
  * correct here — unlike [[IncrementalAgg.applyDeltas]]'s null-safe
  * grouping.
  */
object IncrementalJoin {

  /** leftKeys(i) joins rightKeys(i). Column names must be disjoint
    * across the two sides — a materialized view needs an unambiguous
    * flat schema.
    *
    * `broadcastKeyLimit` bounds the touched-key broadcast: a normal CDC
    * batch is feed-sized and broadcasting it keeps the view/snapshot
    * sides shuffle-free, but a pathological giant batch (a backfill
    * replay touching most keys) must not be forced through the driver —
    * above the limit [[maintain]] degrades to plain shuffle joins (AQE
    * still broadcasts at runtime if the actual bytes allow). */
  final case class Spec(leftKeys: Seq[String], rightKeys: Seq[String],
      broadcastKeyLimit: Long = 4000000L) {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "need matching, non-empty key lists")
  }

  /** Fresh view from full snapshots — the bootstrap, and the recompute
    * the maintained view must equal exactly (IncrementalJoinSpec). */
  def init(left: DataFrame, right: DataFrame, spec: Spec): DataFrame = {
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"ambiguous view columns: ${dup.mkString(", ")}")
    val cond = spec.leftKeys.zip(spec.rightKeys)
      .map { case (l, r) => left(l) === right(r) }.reduce(_ && _)
    left.join(right, cond, "inner")
  }

  /** Join-key values a feed touches: the NEW key of every I/U/D row plus
    * the OLD key of every row carrying prior images (a D's "current"
    * columns already hold the deleted row's values per the
    * [[CdcMerge.classify]] contract; a U's old key lives in `__old_`
    * twins when the key is mutable). One distinct over a feed-sized
    * frame. */
  def touchedKeys(feed: DataFrame, keys: Seq[String],
      outNames: Seq[String]): DataFrame =
    touchedKeysRaw(feed, keys, outNames).distinct()

  /** [[touchedKeys]] without the trailing distinct — [[maintain]] unions
    * both sides' raw key frames and dedups ONCE (one shuffle instead of
    * three; the probes below are anti/semi joins, set-semantic either
    * way — the distinct only bounds the broadcast). */
  private def touchedKeysRaw(feed: DataFrame, keys: Seq[String],
      outNames: Seq[String]): DataFrame = {
    import CdcMerge.{Delete, Insert, OldPrefix, OpCol, Update}
    def oldName(c: String): String =
      if (feed.columns.contains(s"$OldPrefix$c")) s"$OldPrefix$c" else c
    // priors contract, guarded IN-PLAN (the IncrementalAgg.deltas
    // discipline): a feed with NO prior columns at all cannot prove a
    // U row's join key didn't move — if it was classified with
    // withPriors = false over value columns, an FK-moving update would
    // silently strand the old key's view rows. A key-only config is
    // still fine: it can never produce U, so the assert never fires.
    // When prior columns exist, a join key without an __old_ twin is a
    // CDC key column — immutable within U by the classify join.
    val guarded =
      if (feed.columns.exists(_.startsWith(OldPrefix))) feed
      else feed.filter(assert_true(col(OpCol) =!= Update,
        lit("join-view feed has update rows but no prior images — run " +
          "the stream with feedPriors = true (or classify withPriors)"))
        .isNull)
    val newK = struct(keys.zip(outNames)
      .map { case (k, o) => col(k).as(o) }: _*)
    val oldK = struct(keys.zip(outNames)
      .map { case (k, o) => col(oldName(k)).as(o) }: _*)
    guarded.filter(col(OpCol).isin(Insert, Update, Delete))
      .select(explode(
        when(col(OpCol) === Update, array(newK, oldK))
          .otherwise(array(newK))).as("__k"))
      .select(col("__k.*"))
  }

  /** Advance the view by one batch: both feeds are the classified frames
    * of their side's batch (either may be empty); snapshots are the
    * POST-batch states. */
  def maintain(view: DataFrame, leftNew: DataFrame, leftFeed: DataFrame,
      rightNew: DataFrame, rightFeed: DataFrame, spec: Spec): DataFrame = {
    val kn = spec.leftKeys.map(k => s"__t_$k")
    // materialized once (localCheckpoint): the frame probes THREE joins
    // below and its cardinality decides the broadcast — un-checkpointed
    // it would re-derive the feed classification four times. Raw (non-
    // distinct) per-side frames union FIRST so the dedup is ONE shuffle.
    val touched = touchedKeysRaw(leftFeed, spec.leftKeys, kn)
      .unionByName(touchedKeysRaw(rightFeed, spec.rightKeys, kn))
      .distinct()
      .localCheckpoint()
    val hinted =
      if (touched.count() <= spec.broadcastKeyLimit) broadcast(touched)
      else touched
    def keyCond(df: DataFrame, keys: Seq[String]) =
      keys.zip(kn).map { case (k, t) => df(k) === col(t) }.reduce(_ && _)
    val survivors = view.join(hinted,
      keyCond(view, spec.leftKeys), "left_anti")
    val aSlice = leftNew.join(hinted,
      keyCond(leftNew, spec.leftKeys), "left_semi")
    val bSlice = rightNew.join(hinted,
      keyCond(rightNew, spec.rightKeys), "left_semi")
    survivors.unionByName(init(aSlice, bSlice, spec))
  }
}
