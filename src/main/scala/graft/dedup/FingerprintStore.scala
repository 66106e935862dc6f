package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted perceptual-FINGERPRINT store — the standing-corpus side of
  * incremental image dedup made durable (the promise narrated at
  * [[graft.ops.ImplOps.dedupImageIncr]]: "in production the standing
  * fingerprints live bucketed by band"). Without it, every daily screen
  * re-fingerprints and re-bands the standing corpus — O(corpus) per
  * batch; with it, a screen reads only the band-buckets its batch
  * actually touches and the store grows by exactly the accepted batch.
  *
  * Layout (the ShingleStore/CdcIndex precedent):
  * {{{
  *   <dir>/batch_id=<b>/bucket=<k>/part-*.parquet  // media_id, dhash
  * }}}
  *  - BAND grain: each accepted fingerprint is written once per band
  *    (8 rows of 16 bytes — negligible next to payloads), under
  *    bucket = band_id·256 + band_val. A near-match candidate must
  *    share at least one full band (the [[SimHash.bandedHammingPairs]]
  *    pigeonhole, exact for Hamming ≤ 7), so a screen's candidate read
  *    partition-prunes to the ≤ 8·|batch| (≤ 2048 total) buckets the
  *    incoming fingerprints touch — never the whole standing set.
  *  - batch_id partitioning gives replay idempotence (dynamic overwrite
  *    rewrites a replayed batch's own partitions byte-for-byte) and
  *    "store as of batch b" reads by pruning batch_id < b.
  *
  * Geometry is FIXED at 8×8-bit bands — a store is laid out once; the
  * exact-recall radius (Hamming ≤ 7) is a property of the layout, so
  * screens refuse a larger maxDist instead of silently losing recall.
  */
object FingerprintStore {

  private val Bands = 8
  private val Width = 64 / Bands
  private val Mask = (1L << Width) - 1

  private def bucketsOf(sigCol: String) = expr(
    s"transform(sequence(0, ${Bands - 1}), " +
      s"b -> b * 256 + (shiftright(`$sigCol`, b * $Width) & $Mask))")

  /** One row per (band-bucket, fingerprint): (bucket, media_id, dhash). */
  private def banded(fps: DataFrame): DataFrame =
    fps.select(col("media_id"), col("dhash"),
      explode(bucketsOf("dhash")).as("bucket"))

  /** The standing fingerprints from every batch strictly before
    * `asOfBatch`, as (bucket, media_id, dhash). Empty for a fresh dir. */
  def standing(spark: SparkSession, dir: String,
      asOfBatch: Long): DataFrame = {
    val p = new Path(dir)
    val exists =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (!exists)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("bucket", LongType),
          StructField("media_id", LongType),
          StructField("dhash", LongType))))
    // explicit schema: partition columns typed LONG as the writer
    // stamped them (the CdcStream round-3 gotcha), and a dir an
    // all-rejected first batch left file-less still reads
    else spark.read.schema(StructType(Seq(
        StructField("media_id", LongType),
        StructField("dhash", LongType),
        StructField("batch_id", LongType),
        StructField("bucket", LongType))))
      .parquet(dir)
      .filter(col("batch_id") < asOfBatch)
      .select(col("bucket"), col("media_id"), col("dhash"))
  }

  /** Ingest one ACCEPTED batch of fingerprints (media_id, dhash): each
    * lands once per band under its bucket. Idempotent under
    * at-least-once replay: dynamic overwrite rewrites the batch's own
    * partitions in place. Returns rows written (8 × accepted). */
  def append(spark: SparkSession, dir: String, fps: DataFrame,
      batchId: Long): Long = {
    val rows = banded(fps).withColumn("batch_id", lit(batchId))
      .persist()
    try {
      // an empty batch writes nothing: a zero-partition dynamic
      // overwrite would still create a file-less dir that later reads
      // must special-case — skip it instead (replay-safe: a replayed
      // empty batch is still empty)
      if (rows.isEmpty) 0L
      else {
        rows.repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("batch_id", "bucket")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(dir)
        spark.read.parquet(dir)
          .filter(col("batch_id").cast(LongType) === batchId).count()
      }
    } finally { rows.unpersist(); () }
  }

  /** Screen an incoming fingerprint batch against the store (batches
    * < `asOfBatch`): per incoming media_id, its standing near-dup count
    * (Hamming ≤ maxDist), nearest distance (64 = none) and the accept
    * verdict — [[graft.ops.ImplOps.dedupImageIncr]]'s report read from
    * the STORE instead of a standing-corpus recompute. The store read
    * partition-prunes to the buckets the batch touches (collected
    * driver-side — bounded by 2048, the layout constant). */
  def screen(spark: SparkSession, dir: String, fps: DataFrame,
      asOfBatch: Long, maxDist: Int = 6): DataFrame = {
    require(maxDist >= 0 && maxDist < Bands,
      s"the 8x8-band layout guarantees recall only for Hamming <= " +
        s"${Bands - 1}; got maxDist=$maxDist — re-shard the store for " +
        "a wider radius instead of silently losing recall")
    val in = banded(fps)
      .select(col("bucket"), col("media_id").as("id_in"),
        col("dhash").as("sh_in"))
    val touched = in.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ 2048 — driver-bounded
    val cand = standing(spark, dir, asOfBatch)
      .filter(col("bucket").isin(touched: _*)) // partition-pruned read
    val hits = in.join(cand, "bucket")
      .select(col("id_in"), col("media_id").as("id_std"),
        expr("bit_count(sh_in ^ dhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
    fps.select(col("media_id"))
      .join(hits.groupBy("id_in").agg(
        count(lit(1)).as("n_dups"), min("hamming").as("nearest")),
        col("media_id") === col("id_in"), "left_outer")
      .select(col("media_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("nearest"), lit(64)).as("nearest"),
        (coalesce(col("n_dups"), lit(0L)) === 0L).as("accept"))
      .orderBy("media_id")
  }
}
