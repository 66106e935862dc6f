package graft.streaming

import graft.dedup.SemDedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming semantic dedup — [[graft.dedup.SemDedup]]'s ingest rule run
  * continuously over an arriving embedding stream (the vector twin of
  * [[CurateStream]]'s simhash gate): per micro-batch, classify the batch
  * against the accepted-vector store under a FROZEN quantizer; accepted
  * members always win, in-batch ties go to the lowest id; append the
  * kept vectors (with their assignment and norm) to the store.
  *
  * State design: the store persists (id, embedding, list_id, nrm,
  * batch_id) — assignment and norm computed ONCE at accept time, so the
  * state side of every later batch's verdict join arrives pre-assigned
  * ([[SemDedup.ingestVerdicts]]'s contract) and the quantizer runs only
  * over the new batch. The store is cluster-joinable as-is; at 100 TB it
  * would hold PQ codes ([[graft.sim.Pq]]) with exact-refine on the
  * shortlist instead of raw floats, and be bucketed by list_id (the
  * [[CdcBucketed]] treatment) so the state side never re-shuffles — the
  * layout already supports both without changing this contract.
  *
  * The quantizer is trained OFFLINE (e.g. `Ivf.centroidsIter` over a
  * reference corpus) and passed in frozen — re-training mid-stream would
  * silently re-cluster history and destabilize every verdict after it.
  * Idempotence under foreachBatch's at-least-once replay: dynamic
  * partition overwrite on batch_id + `batch_id < current` on the state
  * read, the [[CurateStream]]/[[CdcStream]] recipe.
  */
object SemDedupStream {

  final case class Config(idCol: String = "vec_id",
                          embCol: String = "embedding",
                          tauMicro: Long = 350000L)

  def storePath(outDir: String): String = s"$outDir/accepted_vecs"

  private def storeSchema(cfg: Config): StructType = StructType(Seq(
    StructField(cfg.idCol, LongType),
    StructField(cfg.embCol, ArrayType(FloatType)),
    StructField("list_id", LongType),
    StructField("nrm", DoubleType),
    StructField("batch_id", LongType)))

  private def readStore(spark: SparkSession, dir: String,
                        cfg: Config): DataFrame = {
    graft.dedup.StoreCompaction.healSwap(spark, dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(storeSchema(cfg)).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      storeSchema(cfg))
  }

  /** One micro-batch: returns the number of newly accepted vectors.
    * Callable directly for batch backfills — stream and batch share this
    * code. `cents` is the frozen quantizer (list_id, centroid). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 outDir: String, cents: DataFrame,
                 cfg: Config = Config()): Long = {
    // a batch at or below the compaction watermark is a REPLAY of a
    // batch [[compact]] already folded into generation −1 — rewriting
    // its batch_id partition would duplicate its vectors beside the
    // fold (only checkpoint-committed batches fold, so the replayed
    // content is exactly what the fold absorbed). No-op, like
    // FingerprintStore.append.
    if (graft.dedup.StoreCompaction
        .watermark(spark, storePath(outDir)).exists(batchId <= _))
      return 0L
    val da = SemDedup.assignForStore(batch, cents, cfg.idCol, cfg.embCol)
      .localCheckpoint(true) // feeds both verdict-join sides + the write
    val seen = readStore(spark, storePath(outDir), cfg)
      .filter(col("batch_id") < batchId)
      .drop("batch_id")
    val keptIds = SemDedup
      .ingestVerdicts(seen, da, cfg.idCol, cfg.embCol, cfg.tauMicro)
      .filter(!col("is_dup"))
      .select(cfg.idCol)
    val kept = da.join(keptIds, Seq(cfg.idCol), "left_semi")
      .withColumn("batch_id", lit(batchId))
      .localCheckpoint(true) // one evaluation feeds the write + count
    kept.write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(storePath(outDir))
    kept.count()
  }

  /** Fold every accepted-vector batch EXCEPT the newest (plus any prior
    * fold) into generation −1 — the [[graft.dedup.FingerprintStore]]
    * retention treatment at embedding grain. At daily cadence the
    * per-batch layout accumulates one small-file dir per day and every
    * micro-batch's state read lists all of them; the fold collapses
    * history to one generation clustered by list_id (the join key every
    * verdict uses). The newest batch survives VERBATIM — its stream
    * checkpoint may not have committed, so an at-least-once replay
    * dynamic-overwrites its own partition on resume; every older batch
    * is checkpoint-committed by Spark's in-order batch contract and its
    * replay becomes [[mergeBatch]]'s watermark no-op. Generation −1
    * sorts below every real batch id, so `batch_id < current` state
    * reads keep working unchanged. Whole-store swap via the shared
    * [[graft.dedup.StoreCompaction]] choreography (staging sibling +
    * watermark riding the rename + crashed-swap self-heal on every
    * entry point). Returns (rows deduped away, files reclaimed);
    * (0, 0) when there is nothing to fold. */
  def compact(spark: SparkSession, outDir: String): (Long, Long) = {
    import graft.dedup.StoreCompaction
    val dir = storePath(outDir)
    StoreCompaction.healSwap(spark, dir)
    val f = StoreCompaction.fs(spark, dir)
    if (!f.exists(new Path(dir))) return (0L, 0L)
    // name-agnostic read (the store's data columns are cfg-named): only
    // batch_id matters here, cast to LONG against partition inference
    val all = spark.read.parquet(dir)
      .withColumn("batch_id", col("batch_id").cast(LongType))
    val real = all.filter(col("batch_id") >= 0L).agg(max("batch_id")).head
    if (real.isNullAt(0)) return (0L, 0L) // only a fold, or empty
    val maxBatch = real.getLong(0)
    val foldSrc = all.filter(col("batch_id") =!= maxBatch)
    val foldBatches = foldSrc.filter(col("batch_id") >= 0L)
      .select("batch_id").distinct().collect().map(_.getLong(0))
    if (foldBatches.isEmpty) return (0L, 0L) // one batch + prior fold
    val rowsBefore = all.count()
    val filesBefore = StoreCompaction.countFiles(f, new Path(dir))
    val folded = foldSrc.drop("batch_id").distinct()
      .withColumn("batch_id", lit(-1L))
    val kept = all.filter(col("batch_id") === maxBatch)
    val newWatermark = math.max(
      StoreCompaction.watermark(spark, dir).getOrElse(-1L),
      foldBatches.max)
    val tmp = StoreCompaction.swapTmpPath(dir)
    f.delete(tmp, true)
    folded.unionByName(kept)
      .repartition(col("list_id")) // fold files cluster on the join key
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(tmp.toString)
    StoreCompaction.writeWatermarkInto(f, tmp, newWatermark)
    val rowsAfter = spark.read.parquet(tmp.toString).count()
    StoreCompaction.swapInto(spark, dir, tmp)
    (rowsBefore - rowsAfter,
      filesBefore - StoreCompaction.countFiles(f, new Path(dir)))
  }

  /** The watermark [[compact]] recorded — None for a never-compacted
    * store (see [[graft.dedup.StoreCompaction.watermark]]). */
  def compactionWatermark(spark: SparkSession,
      outDir: String): Option[Long] =
    graft.dedup.StoreCompaction.watermark(spark, storePath(outDir))

  /** Wire a streaming embedding feed into the semantic-dedup merge. The
    * tiny quantizer frame is cached once at stream start (its centroids
    * are collected per batch by the assignment). */
  def run(vecs: DataFrame, outDir: String, checkpointDir: String,
          cents: DataFrame, cfg: Config = Config()): StreamingQuery = {
    val frozen = cents.cache()
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch.sparkSession, batch, id, outDir, frozen, cfg); ()
      }
      .start()
  }
}
