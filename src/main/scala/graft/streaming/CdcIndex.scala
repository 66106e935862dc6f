package graft.streaming

import graft.ops.{RetrievalOps, TextRankOps}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC-maintained inverted index — the missing cell in the retrieval
  * matrix (batch build: RetrievalOps; append-only stream: IndexStream):
  * a DOCUMENT CHANGE FEED (op I/U/D, the engine's CDC classify output
  * shape) keeps a BM25 index current without ever rebuilding it.
  *
  * Merge-on-read design (how production LSM/Iceberg-style indexes do
  * it): applying a change never touches existing posting files —
  *  - I/U append the new document version's postings + doclen row under
  *    this batch's partition;
  *  - U/D also append a TOMBSTONE (doc_id, asof = batch). A posting is
  *    live iff no tombstone for its doc has `asof > its batch_id`, so an
  *    update masks every OLDER version while its own same-batch postings
  *    survive (strict `<`), and multiple updates just raise the max asof.
  * Queries apply the mask as one anti-join of the bucket-pruned postings
  * against the doc-grain max-asof tombstone frame; [[compact]] applies
  * it physically (rewrite live rows, clear tombstones) so read cost
  * returns to the clean-index baseline on whatever cadence the operator
  * chooses — the classic merge-on-read / compaction split.
  *
  * Why not rewrite affected partitions on delete: a doc's postings are
  * scattered across every bucket its tokens hash to — a 1-doc delete
  * would rewrite up to B directories at 100 TB. Tombstones make a
  * delete O(1) write + an equi-join at read, and the anti-join's build
  * side (docs deleted/updated since last compaction) is exactly what
  * compaction keeps small.
  *
  * Stats come from the live doclen rows (masked the same way), never
  * from per-batch running totals — deletes and updates subtract
  * naturally because the masked rows simply stop counting.
  *
  * Idempotence under at-least-once replay: all three stores partition
  * by batch_id with dynamic overwrite (the CurateStream/CdcStream
  * recipe) — a replayed batch rewrites its own partitions byte-for-byte.
  */
object CdcIndex {

  def postingsPath(dir: String): String = s"$dir/postings"
  def doclensPath(dir: String): String = s"$dir/doclens"
  def tombstonesPath(dir: String): String = s"$dir/tombstones"

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val p = new Path(path)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private val tombSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("asof", LongType)))

  /** Apply one change batch: rows (op ∈ I/U/D, doc_id, text — text may
    * be null for D; optional `seq` = intra-batch order, e.g. a Kafka
    * offset). Returns the number of live documents ingested.
    *
    * Intra-batch collapse: a batch may carry SEVERAL events for one
    * doc_id (insert then delete, two rapid updates). The tombstone
    * mask is doc-grain with strict `batch_id < asof`, so same-batch
    * postings survive their own batch's tombstones by design (an U's
    * new version must outlive its own mask) — which means multiple
    * same-batch versions of a doc would all stay live and double-count
    * tf/df, and a same-batch I-then-D would leave the doc resurrected.
    * So each batch is first collapsed to ONE winning event per doc_id:
    * ordered by `seq` descending when present; at equal seq (or
    * without the column) D outranks I/U — a delete named in the batch
    * is honored, the conservative choice for an index — and remaining
    * ties break on a payload hash, a total order (the
    * [[CdcStream.applyEnvelopeBatch]] recipe), never an arbitrary
    * row_number pick. The window partitions by doc_id over ONE batch —
    * batch-sized, not corpus-sized. */
  def applyChanges(spark: SparkSession, changes: DataFrame, batchId: Long,
      dir: String): Long = {
    val seqCol = if (changes.columns.contains("seq")) col("seq") else lit(0L)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(seqCol.desc,
        when(col("op") === "D", 1).otherwise(0).desc,
        xxhash64(col("op"), coalesce(col("text"), lit(""))).desc)
    val last = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val upserts = last.filter(col("op").isin("I", "U"))
      .select("doc_id", "text")
    val masks = last.filter(col("op").isin("U", "D"))
      .select(col("doc_id"), lit(batchId).as("asof"))
    val postings = upserts
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("token"))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", RetrievalOps.bucketCol(col("token")))
      .withColumn("batch_id", lit(batchId))
    postings.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("batch_id", "bucket")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(postingsPath(dir))
    upserts
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("dl"),
        lit(batchId).as("batch_id"))
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(doclensPath(dir))
    masks.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(tombstonesPath(dir))
    upserts.count()
  }

  /** Doc-grain mask: latest tombstone per doc. Size is bounded by docs
    * touched since the last [[compact]] — the thing compaction exists to
    * keep small. */
  private def maskFrame(spark: SparkSession, dir: String): DataFrame =
    readOrEmpty(spark, tombstonesPath(dir),
      StructType(tombSchema.fields :+ StructField("batch_id", LongType)))
      .groupBy("doc_id").agg(max("asof").as("asof"))

  private def maskedOut(rows: DataFrame, mask: DataFrame): DataFrame =
    rows.join(mask,
      rows("doc_id") === mask("doc_id") && rows("batch_id") < mask("asof"),
      "left_anti")

  /** BM25 top-k over the CURRENT document set: bucket-pruned postings,
    * tombstone mask, query-time df, live-doclen stats, the shared
    * bm25Score arithmetic. */
  def query(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int = 10): DataFrame = {
    val buckets = terms.map(RetrievalOps.bucketOf).distinct
    val mask = maskFrame(spark, dir)
    val postings = maskedOut(
      spark.read.parquet(postingsPath(dir))
        .filter(col("bucket").isin(buckets: _*))
        .filter(col("token").isin(terms: _*)),
      mask)
    val lens = maskedOut(spark.read.parquet(doclensPath(dir)), mask)
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val df = postings.groupBy("token").agg(count(lit(1)).as("df"))
    TextRankOps.bm25Score(postings.join(broadcast(df), "token"), stats)
      .select(col("doc_id"), col("n_terms"),
        col("score_dec").cast(DoubleType).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Physically apply the mask: rewrite live postings/doclens of every
    * CHECKPOINT-SAFE batch as the generation −1 partition set, drop the
    * applied tombstones — but keep the NEWEST batch's partitions and
    * tombstones verbatim, because that one batch may still replay
    * (at-least-once) and must overwrite exactly its own partitions.
    * Staged under `_compact_tmp` and swapped by rename (Maintenance's
    * recipe); a crash before the swap leaves the live stores untouched.
    * Returns (postings dropped, tombstones cleared). */
  def compact(spark: SparkSession, dir: String): (Long, Long) = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mask = maskFrame(spark, dir)
    val nTomb = mask.count()
    if (nTomb == 0) return (0L, 0L)
    val postings = spark.read.parquet(postingsPath(dir))
    val lens = spark.read.parquet(doclensPath(dir))
    val tombs = readOrEmpty(spark, tombstonesPath(dir),
      StructType(tombSchema.fields :+ StructField("batch_id", LongType)))
    // The NEWEST stream batch may not have reached the sink checkpoint
    // when the stream stopped — its at-least-once replay
    // dynamic-overwrites its own partitions on resume. Those partitions
    // must therefore survive compaction VERBATIM: folding them into
    // generation −1 would leave the replayed copy duplicated beside the
    // folded one, and a plain INSERT has no tombstone to heal it
    // (CdcIndexSpec pins the replay-after-compact law). Every OLDER
    // batch is checkpoint-committed by Spark's in-order batch contract
    // and folds safely. Generation id −1: batch ids start at 0, so a
    // replay can never overwrite the folded partitions.
    val maxRow = postings.select(col("batch_id"))
      .unionByName(lens.select(col("batch_id")))
      .unionByName(tombs.select(col("batch_id")))
      .agg(max("batch_id")).head
    val maxBatch = if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0)
    val before = postings.count()
    def split(df: DataFrame): (DataFrame, DataFrame) =
      (df.filter(col("batch_id") =!= maxBatch),
        df.filter(col("batch_id") === maxBatch))
    val (foldP, keepP) = split(postings)
    val (foldL, keepL) = split(lens)
    val livePost = maskedOut(foldP, mask).withColumn("batch_id", lit(-1L))
      .unionByName(keepP)
    val liveLens = maskedOut(foldL, mask).withColumn("batch_id", lit(-1L))
      .unionByName(keepL)
    // only the newest batch's tombstones remain live (they mask the
    // folded −1 generation of their docs — which holds no rows for those
    // docs, since the fold already applied them — and a replay rewrites
    // exactly this partition); older tombstones are fully applied
    val keptTombs = tombs.filter(col("batch_id") === maxBatch)
    val nKeptTombRows = keptTombs.count()
    val nTombRows = tombs.count() // before the swap deletes the old files
    val tmpP = s"$dir/_compact_tmp/postings"
    val tmpL = s"$dir/_compact_tmp/doclens"
    val tmpT = s"$dir/_compact_tmp/tombstones"
    livePost.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("batch_id", "bucket").parquet(tmpP)
    liveLens.write.mode("overwrite").partitionBy("batch_id").parquet(tmpL)
    if (nKeptTombRows > 0)
      keptTombs.write.mode("overwrite").partitionBy("batch_id").parquet(tmpT)
    val after = spark.read.parquet(tmpP).count()
    // swap: the index is briefly absent, never half-old-half-new; a
    // crash mid-swap is healed by re-running compact's renames manually
    // or re-ingesting — acceptable for an offline maintenance op
    f.delete(new Path(postingsPath(dir)), true)
    f.rename(new Path(tmpP), new Path(postingsPath(dir)))
    f.delete(new Path(doclensPath(dir)), true)
    f.rename(new Path(tmpL), new Path(doclensPath(dir)))
    f.delete(new Path(tombstonesPath(dir)), true)
    if (nKeptTombRows > 0)
      f.rename(new Path(tmpT), new Path(tombstonesPath(dir)))
    f.delete(new Path(s"$dir/_compact_tmp"), true)
    (before - after, nTombRows - nKeptTombRows)
  }

  /** Wire a CDC change stream (op, doc_id, text) into the index. */
  def run(changes: DataFrame, dir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyChanges(batch.sparkSession, batch, id, dir); ()
      }
      .start()
}
