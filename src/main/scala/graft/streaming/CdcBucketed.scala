package graft.streaming

import graft.cdc.{CdcConfig, CdcMerge}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed CDC state — the shuffle-free-merge design from SURVEY.md §4.
  *
  * The current-state snapshot is persisted as a parquet table bucketed
  * (and sorted) by `keyhash`, with the hash columns materialized. On the
  * next merge, only the (much smaller) incoming extract is shuffled into
  * the state's bucketing; Spark plans NO Exchange above the state scan —
  * at 100 TB that removes a full shuffle+write-read of the big side from
  * every incremental run. CdcBucketedSpec asserts the Exchange count on
  * the physical plan.
  *
  * Bucket count is a capacity decision: size so one bucket ≈ one HDFS/S3
  * object in the 100 MB–1 GB range at the target scale.
  */
object CdcBucketed {

  /** Persist a snapshot (with hashes) as the bucketed state table. Drops
    * any previous generation first — including an orphaned location left
    * by a crash between file-write and catalog-commit (the in-memory
    * catalog forgets, the filesystem does not). */
  def writeState(snapshot: DataFrame, cfg: CdcConfig, table: String,
                 buckets: Int, useXxhash64: Boolean = true): Unit = {
    val spark = snapshot.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    CdcMerge.withHashes(snapshot, cfg, useXxhash64)
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, CdcMerge.KeyHash)
      .sortBy(CdcMerge.KeyHash)
      .saveAsTable(table)
  }

  /** Classify an incoming extract against the bucketed state. The state
    * side is read pre-partitioned from its buckets; only `incoming` is
    * hashed and shuffled. */
  def classifyAgainstState(spark: SparkSession, table: String,
                           incoming: DataFrame, cfg: CdcConfig,
                           useXxhash64: Boolean = true): DataFrame =
    CdcMerge.classifyHashed(
      spark.table(table),
      CdcMerge.withHashes(incoming, cfg, useXxhash64),
      cfg)

  /** One full merge cycle: classify, commit the next bucketed snapshot,
    * return the I/U/D change feed. */
  def mergeIntoState(spark: SparkSession, table: String, incoming: DataFrame,
                     cfg: CdcConfig, batchId: Long, buckets: Int): DataFrame = {
    val classified = classifyAgainstState(spark, table, incoming, cfg).cache()
    // materialize the feed BEFORE the state swap: a lazy plan over the old
    // table would recompute against dropped files
    val feed = CdcMerge.changeFeed(classified, batchId)
      .localCheckpoint(eager = true)
    val next = CdcMerge.applyChanges(classified, cfg)
    // stage the new generation, then swap the table name atomically-ish:
    // parquet bucketed tables cannot be overwritten while being read
    val staging = s"${table}_stage"
    writeState(next, cfg, staging, buckets)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    classified.unpersist()
    feed
  }
}
