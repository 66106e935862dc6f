package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared scale-safe global ranking within low-cardinality groups — the
  * machinery under the exact-quantile queries (q_quantile_disc,
  * q_quantile_cont). A plain `row_number over (partition by group order
  * by value)` puts a GROUP's every row into one task; with ~5 market
  * segments that is the whole corpus on 5 cores. This computes the same
  * rn via the bucketed two-pass (the q_skyline / q_pack_bins treatment):
  *
  *  1. integer value-buckets (floor(value)) → per-(group, bucket) counts
  *     — a bounded frame (value range, not corpus);
  *  2. prefix counts + group totals over that bounded frame;
  *  3. intra-bucket row_number partitioned by (group, BUCKET) — ~|range|
  *     parallel partitions per group instead of one;
  *  4. rn = prefix_before + intra, n = group total.
  *
  * Identical (value, key) total order ⇒ identical rn ⇒ downstream picks
  * are hash-identical to the window twin. Residual: a single bucket can
  * still be hot if the value distribution collapses onto one integer —
  * the same bounded residual q_skyline documents.
  */
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
}
