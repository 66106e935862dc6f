package graft.streaming

import graft.ops.TextRankOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incrementally maintained inverted index — the STREAM cadence of
  * [[graft.ops.RetrievalOps]]'s batch index build (the SemDedupStream /
  * CurateStream pattern: one semantics, batch + incremental forms):
  * documents arrive in micro-batches, each batch appends its postings
  * and a stats row, and queries over the live index are exactly the
  * BM25 the batch path computes over the corpus-so-far.
  *
  * Two deliberate differences from the batch layout:
  *  - postings are partitioned by (batch_id, bucket): batch_id makes
  *    foreachBatch replay idempotent (dynamic partition overwrite — a
  *    replayed batch rewrites ITS directories and nothing else), bucket
  *    keeps planning-time term pruning (the filter prunes bucket
  *    subdirs under every batch).
  *  - df is NOT denormalized onto postings (a new batch would make
  *    every stored copy stale). Query-time df is a ≤|terms|-row
  *    aggregate over the already-pruned postings joined back broadcast
  *    — the same numbers the batch build bakes in, always current.
  *
  * Contract: doc_ids are append-once (an updated document is a new id —
  * re-ingesting an id double-counts its postings; CDC-style upsert would
  * need [[CdcStream]] semantics on the postings store, deliberately out
  * of scope for an append-only corpus log).
  *
  * Stats are per-batch rows summed at query time: the 1-row-per-batch
  * frame stays trivially small (1 row / micro-batch) and replay
  * overwrites its own batch's row, so totals never double-count.
  */
object IndexStream {

  def postingsPath(dir: String): String = s"$dir/postings"
  def statsPath(dir: String): String = s"$dir/stats"

  /** Append one micro-batch of documents (doc_id, text). Returns the
    * number of postings written. Shared by the stream sink and batch
    * backfills. */
  def appendBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      dir: String): Long = {
    val postings = batch
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("token"))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", graft.ops.RetrievalOps.bucketCol(col("token")))
      .withColumn("batch_id", lit(batchId))
      .localCheckpoint(true) // one evaluation feeds the write + count
    postings
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("batch_id", "bucket")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(postingsPath(dir))
    TextRankOps.corpusStats(batch)
      .withColumn("batch_id", lit(batchId))
      .coalesce(1)
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(statsPath(dir))
    postings.count()
  }

  /** BM25 top-k over everything ingested so far: bucket-pruned postings
    * read, query-time df (a ≤|terms|-row broadcast join — never stale),
    * summed per-batch stats, then the SAME bm25Score arithmetic as the
    * corpus and batch-index paths. */
  def query(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int = 10): DataFrame = {
    val buckets = terms.map(graft.ops.RetrievalOps.bucketOf).distinct
    val postings = spark.read.parquet(postingsPath(dir))
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("token").isin(terms: _*))
    val df = postings.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = spark.read.parquet(statsPath(dir))
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
    TextRankOps.bm25Score(
      postings.join(broadcast(df), "token"), stats)
      .select(col("doc_id"), col("n_terms"),
        col("score_dec").cast(DoubleType).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Wire a streaming document feed into the index. */
  def run(docs: DataFrame, dir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(batch.sparkSession, batch, id, dir); ()
      }
      .start()

  /** True if at least one batch has committed (query on an empty index
    * would otherwise fail on a missing path). */
  def nonEmpty(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(postingsPath(dir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
