package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Incrementally-maintained aggregate view: per-group row count plus
  * exact decimal sums, updated from a CDC change feed in O(|changes|)
  * instead of recomputing over the table — THE reason to run CDC at
  * 100 TB (a day's changes are GBs; the table is not).
  *
  * Maintenance algebra: every change contributes signed deltas —
  *   I → (+1, +values); D → (−1, −values);
  *   U → (−1, −old values) AND (+1, +new values).
  * Splitting an update into retract+insert makes GROUP MOVES free: if the
  * grouping column itself changed, the retraction lands in the old group
  * and the insertion in the new one — no special casing. Groups whose
  * maintained count reaches zero are dropped (exactly what a recompute
  * would produce: no row).
  *
  * Sums are maintained in DECIMAL(28,6) with SUM0 (null-as-zero)
  * semantics — the standard materialized-view choice: decimal addition is
  * associative and commutative, so the maintained state is BIT-IDENTICAL
  * to a fresh [[init]] recompute regardless of batch order or
  * partitioning (IncrementalAggSpec asserts exact frame equality). Double
  * sums could not promise that — retraction would accumulate rounding
  * residue, and a "deleted" group could leave a ghost 1e-12 behind.
  * Count and sum are the self-maintainable aggregates; avg derives as
  * sum/cnt at read time; min/max are NOT self-maintainable under deletes
  * (a retraction below the current max needs the group's full history) —
  * recompute affected groups for those.
  *
  * Scale shape: deltas aggregate map-side before ONE shuffle at group
  * grain; the state join is group-keyed — persist the state bucketed by
  * the group columns ([[graft.streaming.CdcBucketed]] treatment) and only
  * the (tiny) delta side ever moves.
  *
  * Feed contract: a classified frame from
  * `CdcMerge.classifyHashed(..., withPriors = true)` — U rows carry
  * `__old_<col>` pre-images; D rows carry previous values in the regular
  * columns; N rows are ignored here. Group columns WITHOUT an `__old_`
  * twin are treated as immutable (CDC key columns cannot change within a
  * U); sum columns are value columns by nature, so their priors are
  * required loudly.
  */
object IncrementalAgg {

  /** groupCols: grouping key (key or value columns); sumCols: numeric
    * value columns to sum. */
  final case class Spec(groupCols: Seq[String], sumCols: Seq[String]) {
    require(groupCols.nonEmpty, "incremental agg needs a group key")
    def cntCol: String = "cnt"
    def sumCol(c: String): String = s"sum_$c"
  }

  private val Sum = DecimalType(28, 6)
  private def sum0(c: org.apache.spark.sql.Column) =
    coalesce(c.cast(Sum), lit(0).cast(Sum))

  /** Fresh state from a full snapshot — the bootstrap, and the recompute
    * the maintained state must equal exactly. */
  def init(snapshot: DataFrame, spec: Spec): DataFrame =
    snapshot.groupBy(spec.groupCols.map(col): _*)
      .agg(count(lit(1)).as(spec.cntCol),
        spec.sumCols.map(c =>
          sum(sum0(col(c))).cast(Sum).as(spec.sumCol(c))): _*)

  /** Signed per-group deltas from one classified-with-priors feed — ONE
    * pass over the feed (each row explodes into its 1–2 contributions),
    * one shuffle at group grain. */
  def deltas(feed: DataFrame, spec: Spec): DataFrame = {
    import CdcMerge.{Delete, Insert, OldPrefix, OpCol, Update}
    val missing = spec.sumCols.filterNot(c =>
      feed.columns.contains(s"$OldPrefix$c"))
    require(missing.isEmpty,
      s"feed lacks prior images ${missing.map(OldPrefix + _).mkString(", ")} — " +
        "classify with withPriors = true")
    // count-only specs still need priors for UPDATES: a group move's
    // retraction needs the OLD group value, and a groupCol without an
    // __old_ twin is only safe when twins exist for value columns (then
    // no-twin ⇒ key ⇒ immutable within a U). A feed with no prior columns
    // at all can still be legitimate — a key-only CdcConfig classifies
    // with zero __old_ columns and can never produce U — so the guard is
    // IN-PLAN: the first U row streaming through a priors-free feed
    // fails the run (same assert_true discipline as alignToSchema).
    val guarded =
      if (feed.columns.exists(_.startsWith(OldPrefix))) feed
      else feed.filter(assert_true(col(OpCol) =!= Update,
        lit("feed has update rows but no prior images — classify with " +
          "withPriors = true")).isNull)
    def oldName(c: String): String =
      if (feed.columns.contains(s"$OldPrefix$c")) s"$OldPrefix$c" else c
    def contrib(sign: Int, name: String => String) =
      struct(
        spec.groupCols.map(g => col(name(g)).as(g)) ++
          Seq(lit(sign.toLong).as("__dc")) ++
          spec.sumCols.map(c =>
            (sum0(col(name(c))) * sign).cast(Sum).as(s"__ds_$c")): _*)
    guarded
      .filter(col(OpCol).isin(Insert, Update, Delete))
      .select(explode(
        when(col(OpCol) === Insert, array(contrib(+1, identity)))
          .when(col(OpCol) === Update,
            array(contrib(+1, identity), contrib(-1, oldName)))
          .otherwise(array(contrib(-1, identity)))).as("__c"))
      .select(col("__c.*"))
      .groupBy(spec.groupCols.map(col): _*)
      .agg(sum(col("__dc")).cast(LongType).as("__dc"),
        spec.sumCols.map(c =>
          sum(col(s"__ds_$c")).cast(Sum).as(s"__ds_$c")): _*)
  }

  /** Merge one feed's deltas into the maintained state. */
  def maintain(state: DataFrame, feed: DataFrame, spec: Spec): DataFrame =
    applyDeltas(state, deltas(feed, spec), spec)

  /** state ⟗ deltas on the group key; zero-count groups drop out. The
    * join is NULL-SAFE (`<=>`) — a nullable group column legitimately
    * groups its nulls together ([[init]]'s groupBy does), and a plain
    * equality join would strand the null group's retractions forever. */
  def applyDeltas(state: DataFrame, d: DataFrame, spec: Spec): DataFrame = {
    val s = state.alias("s")
    val dd = d.select(
      spec.groupCols.map(g => col(g).as(s"__d_$g")) ++
        Seq(col("__dc")) ++ spec.sumCols.map(c => col(s"__ds_$c")): _*)
    val cond = spec.groupCols
      .map(g => col(s"s.$g") <=> col(s"__d_$g"))
      .reduce(_ && _)
    val cnt = coalesce(col(spec.cntCol), lit(0L)) + coalesce(col("__dc"), lit(0L))
    val sums = spec.sumCols.map { c =>
      (sum0(col(spec.sumCol(c))) + sum0(col(s"__ds_$c")))
        .cast(Sum).as(spec.sumCol(c))
    }
    s.join(dd, cond, "full_outer")
      .select(spec.groupCols.map(g =>
        coalesce(col(s"s.$g"), col(s"__d_$g")).as(g)) ++
        Seq(cnt.as(spec.cntCol)) ++ sums: _*)
      .filter(col(spec.cntCol) > 0)
  }
}
