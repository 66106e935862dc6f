package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared scale-safe GLOBAL ranking machinery — every "order the whole
  * relation" statistic routes through here instead of the
  * single-partition window Spark plans for an empty PARTITION BY (the
  * anti-pattern that serializes a corpus through one task at 100 TB).
  *
  * Two families:
  *
  * GROUPED-BUCKETED ([[rankedByValue]], r7) — ranking within
  * low-cardinality groups (q_quantile_disc / q_quantile_cont /
  * weighted sampling): integer value-buckets make a bounded prefix
  * frame, intra-bucket row_numbers run (group, bucket)-partitioned,
  * rn = prefix_before + intra. Needs a bucketable numeric domain.
  *
  * RANGE-EXCHANGE ([[withGlobalPosition]] / [[withGlobalNtile]] /
  * [[withGlobalCumSum]], r10) — the general-domain global order, the
  * classic MPP two-phase distributed sort-rank:
  *  1. `repartitionByRange` on the total order — Spark's sampled range
  *     exchange, the same machinery a global ORDER BY uses;
  *  2. `sortWithinPartitions`, then `monotonically_increasing_id()` in
  *     the SAME stage — ids are monotonic within each partition in
  *     sorted order (only monotonicity is relied on: the local row
  *     number is `mid − min(mid over the partition)`);
  *  3. one BOUNDED per-partition (count, min-id) aggregate —
  *     ≤ spark.sql.shuffle.partitions rows — broadcast back as prefix
  *     offsets.
  * The caller passes a TOTAL order (unique tie-break): the global
  * position is then invariant to boundary placement, so the result is
  * deterministic even though range boundaries are sample-based.
  * Cost: ONE full-data shuffle for positions/ntile (the offsets branch
  * reuses the exchange); the running prefix-sum adds one pid-hash
  * exchange (its within-partition cumulative is a window clustered by
  * pid — np-way parallel, never single-partition).
  *
  * q_lift_curve keeps its third variant inline (bounded SCORE-domain
  * histogram prefix — cheaper when the score domain is ≤~1000 values);
  * q_decile_spend / q_abc_class ride the general path here. */
object RankedFrames {

  /** Returns `df` + (rn, n): rank of (valueCol, keyCol) and group size
    * within groupCol, without a corpus-scale window partition. */
  def rankedByValue(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String): DataFrame = {
    val d = df.withColumn("_bkt", floor(col(valueCol)).cast(LongType))
    val buckets = d.groupBy(groupCol, "_bkt")
      .agg(count(lit(1)).as("_c"))
      .withColumn("_before", coalesce(
        sum(col("_c")).over(Window.partitionBy(groupCol).orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n",
        sum(col("_c")).over(Window.partitionBy(groupCol)))
      .select(groupCol, "_bkt", "_before", "n")
    val intra = Window.partitionBy(groupCol, "_bkt")
      .orderBy(valueCol, keyCol)
    d.join(buckets, Seq(groupCol, "_bkt"))
      .withColumn("rn", col("_before") + row_number().over(intra))
      .drop("_bkt", "_before")
  }

  // ------------------------------------------------------------------
  // Range-exchange global order (r10) — see the object scaladoc
  // ------------------------------------------------------------------

  private val Pid = "_rf_pid"
  private val Mid = "_rf_mid"

  /** `df` plus `posCol` = the exact 1-based global position under
    * `order` (which must be total — include a unique tie-break). */
  def withGlobalPosition(df: DataFrame, order: Seq[Column],
      posCol: String = "gpos"): DataFrame =
    positioned(df, order, posCol).drop(Pid, Mid)

  private def positioned(df: DataFrame, order: Seq[Column],
      posCol: String): DataFrame = {
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val marked = df.repartitionByRange(np, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(Pid, spark_partition_id())
      .withColumn(Mid, monotonically_increasing_id())
    // bounded: ≤ np rows — metadata, never data; staying inside one
    // lazy plan (broadcast join, not a collect) lets the range
    // exchange be planned once and reused by both branches
    val perPid = marked.groupBy(Pid)
      .agg(count(lit(1)).as("_rf_cnt"), min(Mid).as("_rf_mid0"))
    val offsets = perPid
      .withColumn("_rf_before",
        coalesce(sum("_rf_cnt").over(Window.orderBy(Pid)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(Pid), col("_rf_mid0"), col("_rf_before"))
    marked.join(broadcast(offsets), Pid)
      .withColumn(posCol,
        col("_rf_before") + (col(Mid) - col("_rf_mid0")) + lit(1L))
      .drop("_rf_mid0", "_rf_before")
  }

  /** `df` plus `bucketCol` = exact NTILE(n) under `order` — SQL's
    * floor-distribution semantics (the first `count mod n` buckets hold
    * one extra row), computed from the global position. */
  def withGlobalNtile(df: DataFrame, order: Seq[Column], n: Int,
      bucketCol: String = "bucket"): DataFrame = {
    require(n >= 1, s"ntile needs n >= 1, got $n")
    val pos = positioned(df, order, "_rf_pos")
    val total = pos.groupBy().agg(count(lit(1)).as("_rf_tot"))
    pos.crossJoin(broadcast(total))
      .withColumn(bucketCol, expr(
        s"""CAST(CASE
           | WHEN _rf_pos <= (_rf_tot div $n + 1) * (_rf_tot % $n)
           |   THEN (_rf_pos - 1) div (_rf_tot div $n + 1) + 1
           | ELSE _rf_tot % $n + (_rf_pos - (_rf_tot div $n + 1)
           |   * (_rf_tot % $n) - 1) div (_rf_tot div $n) + 1
           |END AS INT)""".stripMargin.replace("\n", " ")))
      .drop(Pid, Mid, "_rf_pos", "_rf_tot")
  }

  /** `df` plus `cumCol` = the exact running sum of `value` under
    * `order` (inclusive of the current row) and `totCol` = the grand
    * total — the distributed cumulative-share frame (ABC/Pareto
    * classification). Adds one pid-hash exchange beyond the range
    * shuffle (the within-partition running sum is a window clustered
    * by pid — np-way parallel, never single-partition). */
  def withGlobalCumSum(df: DataFrame, order: Seq[Column], value: Column,
      cumCol: String = "cum", totCol: String = "total"): DataFrame = {
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val marked = df.repartitionByRange(np, order: _*)
      .withColumn(Pid, spark_partition_id())
      .withColumn("_rf_v", value)
    val perPid = marked.groupBy(Pid).agg(sum("_rf_v").as("_rf_psum"))
    val offsets = perPid
      .withColumn("_rf_before",
        coalesce(sum("_rf_psum").over(Window.orderBy(Pid)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totCol, sum("_rf_psum").over(Window.partitionBy()))
      .select(col(Pid), col("_rf_before"), col(totCol))
    val runW = Window.partitionBy(Pid).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked.join(broadcast(offsets), Pid)
      .withColumn(cumCol, col("_rf_before") + sum("_rf_v").over(runW))
      .select((df.columns.map(col) :+ col(cumCol) :+ col(totCol)).toSeq: _*)
  }
}
