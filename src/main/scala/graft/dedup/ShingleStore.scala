package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted shingle-TYPE store — the standing-corpus side of
  * incremental passage dedup made durable (the promise narrated at
  * [[graft.ops.RetrievalOps.passageIncr]]: "in production the standing
  * shingle-type set is a persisted bucketed table appended per accepted
  * batch"). Without it, every daily screen recomputes the standing
  * corpus's distinct shingles — O(corpus) per batch; with it, a screen
  * is O(batch shingles + matched store buckets) and the store grows by
  * exactly the novel types each accepted batch contributes.
  *
  * Layout (the CdcIndex/IvfIndex precedent):
  * {{{
  *   <dir>/batch_id=<b>/bucket=<k>/part-*.parquet   // h: 16-byte binary
  * }}}
  *  - TYPE grain: each 8-token shingle hash appears ONCE store-wide —
  *    [[append]] only writes types absent from every earlier batch, so
  *    store size tracks distinct passages, not occurrences.
  *  - bucket = xxhash64(h) mod B is a DIRECTORY: a screen collects the
  *    (≤ B, driver-bounded) buckets its batch actually touches and
  *    filters on them, so the store scan partition-prunes to matched
  *    buckets instead of reading the whole standing set.
  *  - batch_id partitioning gives replay idempotence (dynamic overwrite
  *    rewrites a replayed batch's own partitions byte-for-byte, because
  *    the novel set is recomputed against strictly-earlier batches) and
  *    lets both verbs read "the store as of batch b" by partition
  *    pruning on batch_id < b.
  *
  * Hash width: 16-byte unhex(md5) like the passage queries — 128 bits
  * keeps collisions negligible at trillions of distinct shingles.
  */
object ShingleStore {

  val DefaultBuckets = 64

  private def bucketCol(h: Column, buckets: Int): Column =
    pmod(xxhash64(h), lit(buckets.toLong))

  /** Distinct (doc_id, shingle hash) pairs of a document frame — the
    * shared shingle grammar of q_dedup_passage / q_dedup_passage_incr
    * (8-token windows, 16-byte md5, one vote per doc per type). Docs
    * shorter than n tokens have no n-shingle and drop out (the
    * `sequence(0, n)` counts-down guard — correctness, not hygiene). */
  def docShingles(docs: DataFrame, n: Int = 8): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - n)).as("i"))
      .select(col("doc_id"),
        unhex(md5(array_join(slice(col("t"), col("i") + 1, lit(n)), " ")
          .cast(BinaryType))).as("h"))
      .distinct()

  /** The standing type set from every batch strictly before `asOfBatch`
    * (partition-pruned), as (bucket, h). Empty frame for a fresh dir. */
  def standing(spark: SparkSession, dir: String, asOfBatch: Long): DataFrame = {
    val p = new Path(dir)
    val exists = p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (!exists)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("bucket", LongType),
          StructField("h", BinaryType))))
    else spark.read.parquet(dir)
      // partition-column read-back infers INT for batch_id/bucket while
      // the writer stamped LONG (the CdcStream round-3 gotcha)
      .withColumn("batch_id", col("batch_id").cast(LongType))
      .filter(col("batch_id") < asOfBatch)
      .select(col("bucket").cast(LongType).as("bucket"), col("h"))
  }

  /** Ingest one ACCEPTED batch: append the batch's shingle types that no
    * earlier batch contributed. Returns the number of novel types
    * written. Idempotent under at-least-once replay: the novel set is
    * computed against strictly-earlier batches only, so a replay
    * re-derives the identical set and dynamic overwrite rewrites the
    * batch's own partitions in place. */
  def append(spark: SparkSession, dir: String, docs: DataFrame,
      batchId: Long, n: Int = 8, buckets: Int = DefaultBuckets): Long = {
    val types = docShingles(docs, n).select("h").distinct()
      .withColumn("bucket", bucketCol(col("h"), buckets))
    val novel = types
      .join(standing(spark, dir, batchId), Seq("bucket", "h"), "left_anti")
      .withColumn("batch_id", lit(batchId))
    novel.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("batch_id", "bucket")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(dir)
    spark.read.parquet(dir)
      .filter(col("batch_id").cast(LongType) === batchId).count()
  }

  /** Screen an incoming batch against the store: per incoming doc, how
    * many of its distinct shingle types the standing set (batches
    * < `asOfBatch`) already contains, and the novel milli-fraction —
    * the q_dedup_passage_incr report read from the STORE instead of a
    * standing-corpus recompute. The store scan prunes to the buckets
    * the batch actually touches (bucket list collected driver-side,
    * bounded by B). */
  def screen(spark: SparkSession, dir: String, docs: DataFrame,
      asOfBatch: Long, n: Int = 8,
      buckets: Int = DefaultBuckets): DataFrame = {
    val sh = docShingles(docs, n)
      .withColumn("bucket", bucketCol(col("h"), buckets))
    val touched = sh.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ B values — driver-bounded
    val seenTypes = standing(spark, dir, asOfBatch)
      .filter(col("bucket").isin(touched: _*)) // partition-pruned read
      .select(col("bucket"), col("h").as("sh_h"))
    sh.join(seenTypes,
        sh("bucket") === seenTypes("bucket") && col("h") === col("sh_h"),
        "left_outer")
      .select(col("doc_id"),
        when(col("sh_h").isNotNull, 1L).otherwise(0L).as("seen"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), sum("seen").as("n_seen"))
      .select(col("doc_id"), col("n_shingles"), col("n_seen"),
        expr("(n_shingles - n_seen) * 1000 div n_shingles").as("novel_milli"))
      .orderBy("doc_id")
  }
}
