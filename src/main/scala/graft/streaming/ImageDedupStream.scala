package graft.streaming

import graft.dedup.{FingerprintStore, ImageDedup, SimHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming perceptual image dedup — the raster twin of
  * [[SemDedupStream]] (embeddings) and [[CurateStream]]'s simhash gate
  * (text): per micro-batch of (media_id, payload) images, fingerprint
  * (dHash, one shuffle-free decode map), screen against the PERSISTED
  * standing store ([[graft.dedup.FingerprintStore]] — band-bucketed,
  * the screen read prunes to the batch's touched buckets), drop
  * in-batch near-dups (an id rejects when a SMALLER in-batch id sits
  * within the radius — the SemDedup lowest-id-wins tie rule, pointwise)
  * and append the accepted fingerprints to the store.
  *
  * Only FINGERPRINTS persist — 8 rows × 16 bytes per accepted image;
  * payloads never enter state. At 100 TB the store read stays bounded
  * by the batch's ≤ 2048 touched band-buckets regardless of corpus
  * size.
  *
  * Idempotence under foreachBatch's at-least-once replay: the screen
  * reads strictly-earlier batches (`asOfBatch = batchId`) and the store
  * append is dynamic-partition-overwrite on batch_id — a replayed batch
  * re-derives identical verdicts and rewrites its own partitions
  * byte-for-byte (the [[CurateStream]]/[[CdcStream]] recipe). */
object ImageDedupStream {

  final case class Config(idCol: String = "media_id",
                          payloadCol: String = "payload",
                          maxDist: Int = 6)

  def storePath(outDir: String): String = s"$outDir/accepted_fps"

  /** One micro-batch: returns the number of newly accepted images.
    * Callable directly for batch backfills — stream and batch share
    * this code. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      outDir: String, cfg: Config = Config()): Long = {
    val fps = ImageDedup.fingerprints(
        batch.select(col(cfg.idCol).as("media_id"), col(cfg.payloadCol)),
        "media_id", cfg.payloadCol)
      .localCheckpoint(true) // feeds screen + in-batch join + append
    // standing rejections: any near-dup already accepted by an EARLIER
    // batch (bucket-pruned store read)
    val standingOk = FingerprintStore
      .screen(spark, storePath(outDir), fps, asOfBatch = batchId,
        maxDist = cfg.maxDist)
      .filter(col("accept")).select("media_id")
    // in-batch rejections: a smaller same-batch id within the radius
    // wins (banded — never all-pairs; pairs emit id_a < id_b, so id_b
    // is the loser)
    val inBatchLosers = SimHash.bandedHammingPairs(fps, "media_id",
        "dhash", cfg.maxDist, bands = 8)
      .select(col("id_b").as("media_id")).distinct()
    val kept = fps
      .join(standingOk, Seq("media_id"), "left_semi")
      .join(inBatchLosers, Seq("media_id"), "left_anti")
      .localCheckpoint(true) // one evaluation feeds append + count
    FingerprintStore.append(spark, storePath(outDir), kept, batchId)
    kept.count()
  }

  /** Wire a streaming (media_id, payload) feed into the dedup merge. */
  def run(images: DataFrame, outDir: String, checkpointDir: String,
      cfg: Config = Config()): StreamingQuery =
    images.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch.sparkSession, batch, id, outDir, cfg); ()
      }
      .start()
}
