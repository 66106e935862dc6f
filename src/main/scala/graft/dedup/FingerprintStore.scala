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
  *
  * Retention: at daily cadence the per-batch layout is 365 batch dirs ×
  * up to 2048 bucket dirs a year of small files, and every screen lists
  * every batch partition under each touched bucket. [[compact]] folds
  * all checkpoint-committed batches into generation −1 (the
  * CdcIndex/CdcIvf recipe: batch ids start at 0, so a replayed batch
  * can never overwrite the folded partitions), keeping the NEWEST batch
  * verbatim — it may still replay. The fold records its high-water mark
  * in `_compaction_watermark`; replayed appends at or below it are
  * no-ops (their rows already live in the folded generation) and as-of
  * reads at or below it REFUSE loudly (per-batch provenance below the
  * watermark is gone — serving them would silently include later
  * fingerprints).
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

  // filesystem choreography (swap staging, heal, watermark file) is the
  // shared [[StoreCompaction]] mechanics; the POLICY below stays here
  private def fs(spark: SparkSession, dir: String) =
    StoreCompaction.fs(spark, dir)

  private def swapTmpPath(dir: String) = StoreCompaction.swapTmpPath(dir)

  private def healSwap(spark: SparkSession, dir: String): Unit =
    StoreCompaction.healSwap(spark, dir)

  /** Newest REAL batch id in the store (the folded −1 generation
    * excluded) — None for a fresh/empty store. Directory-listing only,
    * no data read: callers use it to validate run-id monotonicity
    * before an append can dynamic-overwrite an older batch's
    * partitions with different content. */
  def maxBatchId(spark: SparkSession, dir: String): Option[Long] = {
    healSwap(spark, dir)
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) None
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).filter(_ >= 0L) match {
        case Seq() => None
        case xs    => Some(xs.max)
      }
  }

  /** The highest batch id [[compact]] has folded into generation −1 —
    * None for a never-compacted store. */
  def compactionWatermark(spark: SparkSession, dir: String): Option[Long] =
    StoreCompaction.watermark(spark, dir)

  /** The standing fingerprints from every batch strictly before
    * `asOfBatch`, as (bucket, media_id, dhash). Empty for a fresh dir.
    * Refuses an `asOfBatch` at or below the compaction watermark:
    * those batches' provenance was folded away, so the read would
    * silently include fingerprints from LATER batches. */
  def standing(spark: SparkSession, dir: String,
      asOfBatch: Long): DataFrame = {
    healSwap(spark, dir)
    val p = new Path(dir)
    val exists =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (exists) compactionWatermark(spark, dir).foreach { w =>
      require(asOfBatch > w,
        s"as-of batch $asOfBatch is at or below the compaction " +
          s"watermark $w of $dir — batches <= $w were folded into the " +
          "compacted generation and their per-batch provenance is gone; " +
          "an as-of read there would silently include later " +
          "fingerprints. Screen against a later as-of, or rebuild the " +
          "store if historical screens are required.")
    }
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
    * partitions in place. Returns rows written (8 × accepted).
    *
    * A batch at or below the compaction watermark is a REPLAY of a
    * batch [[compact]] already folded — its rows live in generation −1,
    * so re-writing `batch_id=<b>` partitions would duplicate them
    * beside the fold. Such appends are no-ops (0 returned): only
    * checkpoint-committed batches fold, so the replayed content is
    * byte-identical to what the fold absorbed. */
  def append(spark: SparkSession, dir: String, fps: DataFrame,
      batchId: Long): Long = {
    if (compactionWatermark(spark, dir).exists(batchId <= _)) return 0L
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
    // an EMPTY batch (a drained stream's idle micro-batch) touches no
    // buckets: short-circuit rather than hand isin() an empty value
    // list — the verdict frame is empty either way
    val cand =
      if (touched.isEmpty) standing(spark, dir, asOfBatch).limit(0)
      else standing(spark, dir, asOfBatch)
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

  /** Fold every batch EXCEPT the newest (plus any prior fold) into
    * generation −1, one file per touched bucket — the CdcIndex/CdcIvf
    * retention recipe at fingerprint grain. The newest batch survives
    * VERBATIM: its stream sink checkpoint may not have committed when
    * the stream stopped, so an at-least-once replay dynamic-overwrites
    * its own partitions on resume — folding it would leave the replayed
    * copy duplicated beside the fold. Every older batch is
    * checkpoint-committed by Spark's in-order batch contract and folds
    * safely; its replay becomes [[append]]'s watermark no-op. Duplicate
    * (bucket, media_id, dhash) rows ACROSS folded batches collapse —
    * screens join per distinct fingerprint row, so the collapse is
    * row-identical for every later screen. Swap is whole-store
    * (tmp-write + rename, the index-compaction convention): briefly
    * absent, never half-old-half-new; the watermark file rides inside
    * the tmp dir so the rename publishes fold and guard atomically.
    * Returns (rows folded away, files reclaimed); (0, 0) when there is
    * nothing to fold. */
  def compact(spark: SparkSession, dir: String): (Long, Long) = {
    healSwap(spark, dir)
    val f = fs(spark, dir)
    if (!f.exists(new Path(dir))) return (0L, 0L)
    val all = spark.read.schema(StructType(Seq(
        StructField("media_id", LongType),
        StructField("dhash", LongType),
        StructField("batch_id", LongType),
        StructField("bucket", LongType))))
      .parquet(dir)
    val real = all.filter(col("batch_id") >= 0L)
      .agg(max("batch_id")).head
    if (real.isNullAt(0)) return (0L, 0L) // only a fold, or empty
    val maxBatch = real.getLong(0)
    val foldSrc = all.filter(col("batch_id") =!= maxBatch)
    val foldBatches = foldSrc.filter(col("batch_id") >= 0L)
      .select("batch_id").distinct().collect().map(_.getLong(0))
    if (foldBatches.isEmpty) return (0L, 0L) // one batch + prior fold
    val rowsBefore = all.count()
    val filesBefore = countFiles(f, new Path(dir))
    val folded = foldSrc
      .select(col("bucket"), col("media_id"), col("dhash")).distinct()
      .withColumn("batch_id", lit(-1L))
    val kept = all.filter(col("batch_id") === maxBatch)
    val newWatermark = math.max(
      compactionWatermark(spark, dir).getOrElse(-1L), foldBatches.max)
    val tmp = swapTmpPath(dir)
    f.delete(tmp, true)
    folded.unionByName(kept)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("batch_id", "bucket")
      .parquet(tmp.toString)
    // watermark INSIDE tmp: the swap rename publishes fold + replay
    // guard in one atomic visibility transition
    StoreCompaction.writeWatermarkInto(f, tmp, newWatermark)
    val rowsAfter = spark.read.parquet(tmp.toString).count()
    StoreCompaction.swapInto(spark, dir, tmp)
    (rowsBefore - rowsAfter,
      filesBefore - StoreCompaction.countFiles(f, new Path(dir)))
  }

  private def countFiles(f: org.apache.hadoop.fs.FileSystem,
      root: Path): Long = StoreCompaction.countFiles(f, root)
}
