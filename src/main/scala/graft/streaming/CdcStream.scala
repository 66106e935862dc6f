package graft.streaming

import graft.cdc.{CdcConfig, CdcMerge}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply — the north-star pipeline (BASELINE.json
  * "Structured Streaming + CDC source connectors"; [upstream `cdc.py`]
  * semantics per micro-batch).
  *
  * Each micro-batch is treated as one incoming full extract (the
  * reference's model: compare extract vs previous snapshot, R5): classify
  * against the previous state snapshot, append the I/U/D change feed, and
  * write the next snapshot.
  *
  * State layout under `stateDir`:
  *   v{batchId}/   — parquet snapshot after applying batch `batchId`
  *   changes/      — appended change feed, stamped with batch_id
  *
  * Idempotence/restart: snapshots are keyed by batchId, so re-processing
  * a batch after a crash overwrites `v{id}` with identical content
  * instead of double-applying (foreachBatch is at-least-once). At 100 TB
  * the snapshot write would be hash-partitioned by keyhash so the next
  * batch's full-outer join re-reads co-partitioned state without a
  * shuffle (SURVEY §4); the merge itself is a single shuffle either way,
  * with 8-byte xxhash64 join keys (`useXxhash64 = true`).
  */
object CdcStream {

  def versionPath(stateDir: String, v: Long): String = s"$stateDir/v$v"
  def changesPath(stateDir: String): String = s"$stateDir/changes"

  /** Latest committed snapshot version, if any (Hadoop FS — works on
    * local paths and distributed stores alike). */
  def currentVersion(spark: SparkSession, stateDir: String): Option[Long] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val versions = fs.listStatus(p).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v") => n.drop(1).toLong }
      versions.sorted.lastOption
    }
  }

  /** The current state snapshot, if one has been committed. */
  def currentState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    currentVersion(spark, stateDir)
      .map(v => spark.read.parquet(versionPath(stateDir, v)))

  /** Merge one micro-batch (a full extract) into the state dir. */
  def mergeBatch(batch: DataFrame, batchId: Long, cfg: CdcConfig,
                 stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = currentState(spark, stateDir)
      .getOrElse(batch.limit(0)) // first batch: empty previous state
    val classified =
      CdcMerge.classify(prev, batch, cfg, useXxhash64 = true).cache()
    try {
      CdcMerge.changeFeed(classified, batchId)
        .write.mode("append").parquet(changesPath(stateDir))
      CdcMerge.applyChanges(classified, cfg)
        .write.mode("overwrite").parquet(versionPath(stateDir, batchId))
    } finally classified.unpersist()
  }

  /** Drop snapshot generations older than the newest `keep` — retention
    * for the versioned state layout (at 100 TB each generation is a full
    * table copy; unbounded history is an operational leak). Never removes
    * the latest version. */
  def pruneVersions(spark: SparkSession, stateDir: String, keep: Int): Unit = {
    require(keep >= 1, "must keep at least the current snapshot")
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val versions = fs.listStatus(p).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v") => n.drop(1).toLong }
        .sorted
      versions.dropRight(keep).foreach { v =>
        fs.delete(new Path(versionPath(stateDir, v)), true)
      }
    }
  }

  /** Wire a streaming extract feed into the merge via foreachBatch. */
  def start(incoming: DataFrame, cfg: CdcConfig, stateDir: String,
            checkpointDir: String): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch, id, cfg, stateDir)
      }
      .start()
}
