package graft.streaming

import graft.sim.Ivf
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC-maintained IVF index — the DENSE twin of [[CdcIndex]] (which
  * maintains the lexical BM25 index): an EMBEDDING change feed
  * (op ∈ I/U/D, vec_id, embedding) keeps a persisted
  * [[graft.sim.IvfIndex]]-shaped ANN index current without rebuilds.
  *
  * Frozen quantizer: the centroids are trained ONCE ([[train]], from a
  * bootstrap corpus or sample) and never move during ingest — the
  * SemDedup ingest-stability rule. A drifting quantizer would silently
  * re-home vectors (the same vector probing differently across batches)
  * and force mass re-assignment; the operator instead retrains + rebuilds
  * on an explicit cadence, exactly like production IVF deployments.
  *
  * Merge-on-read, the [[CdcIndex]] design applied to vectors:
  *  - I/U append the new vector assigned to its nearest frozen-centroid
  *    list under this batch's partition (`vectors/batch_id=<b>/list_id=`);
  *  - U/D append a TOMBSTONE (vec_id, asof = batch): a vector row is
  *    live iff no tombstone for its id has `asof > its batch_id` — an
  *    update masks every OLDER version while its own same-batch row
  *    survives (strict `<`). Each batch is first collapsed to ONE
  *    winning event per vec_id (the CdcIndex same-batch recipe: `seq`
  *    desc when present, D outranks siblings at equal seq, payload-hash
  *    tie-break), so a same-batch insert+delete stays dead and two
  *    same-batch versions never both score.
  *  - [[query]] = frozen-quantizer probe ∩ live mask: nProbe nearest
  *    lists are driver-side scalar math; the scan partition-prunes on
  *    list_id ACROSS batch partitions; the mask is one anti-join whose
  *    build side is docs touched since the last [[compact]].
  *  - [[compact]] rewrites live rows as generation −1 and clears
  *    tombstones — read cost returns to the clean-index baseline.
  *
  * Idempotence: all stores partition by batch_id with dynamic overwrite;
  * a replayed batch rewrites its own partitions byte-for-byte.
  *
  * Fidelity contract (CdcIvfSpec): after any I/U/D history, [[query]]
  * is BIT-IDENTICAL to a fresh [[graft.sim.IvfIndex]] rebuild of the
  * current vector set under the same frozen quantizer.
  */
object CdcIvf {

  def vectorsPath(dir: String): String = s"$dir/vectors"
  def centroidsPath(dir: String): String = s"$dir/centroids"
  def tombstonesPath(dir: String): String = s"$dir/tombstones"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Train and freeze the quantizer from a bootstrap corpus (runs
    * [[Ivf.centroidsIter]] — deterministic, no RNG). Must happen before
    * the first [[applyChanges]]; retraining is an explicit rebuild, not
    * an ingest-path event. */
  def train(spark: SparkSession, corpus: DataFrame, dir: String,
      embCol: String = "embedding", seedCol: String = "label",
      iters: Int = 3): Unit =
    Ivf.centroidsIter(corpus, embCol, seedCol, iters)
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath(dir))

  private def quantizer(spark: SparkSession, dir: String): DataFrame = {
    require(fs(spark, dir).exists(new Path(centroidsPath(dir))),
      s"no frozen quantizer under $dir — run CdcIvf.train first")
    spark.read.parquet(centroidsPath(dir))
  }

  private val tombSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("asof", LongType)))

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val p = new Path(path)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Apply one change batch: rows (op ∈ I/U/D, vec_id, embedding —
    * embedding may be null for D; optional `seq` = intra-batch order).
    * Returns the number of live vectors ingested. */
  def applyChanges(spark: SparkSession, changes: DataFrame, batchId: Long,
      dir: String): Long = {
    val seqCol = if (changes.columns.contains("seq")) col("seq") else lit(0L)
    val w = Window.partitionBy("vec_id")
      .orderBy(seqCol.desc,
        when(col("op") === "D", 1).otherwise(0).desc,
        xxhash64(col("op"), coalesce(col("embedding").cast(StringType),
          lit(""))).desc)
    val last = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val upserts = last.filter(col("op").isin("I", "U"))
      .select("vec_id", "embedding")
    val masks = last.filter(col("op").isin("U", "D"))
      .select(col("vec_id"), lit(batchId).as("asof"))
    Ivf.assign(upserts, quantizer(spark, dir), "vec_id", "embedding")
      .withColumn("batch_id", lit(batchId))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("batch_id", "list_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(vectorsPath(dir))
    masks.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(tombstonesPath(dir))
    upserts.count()
  }

  /** Latest tombstone per vec_id — bounded by ids touched since the last
    * [[compact]]. */
  private def maskFrame(spark: SparkSession, dir: String): DataFrame =
    readOrEmpty(spark, tombstonesPath(dir),
      StructType(tombSchema.fields :+ StructField("batch_id", LongType)))
      .groupBy("vec_id").agg(max("asof").as("asof"))

  private def maskedOut(rows: DataFrame, mask: DataFrame): DataFrame =
    rows.join(mask,
      rows("vec_id") === mask("vec_id") && rows("batch_id") < mask("asof"),
      "left_anti")

  /** Cosine top-k for a probe vector over the CURRENT vector set:
    * frozen-quantizer nProbe list prune + tombstone mask + the shared
    * dotLit/norm2 fold shapes ([[graft.sim.IvfIndex.query]]'s schema:
    * vec_id, list_id, cos_sim). */
  def query(spark: SparkSession, dir: String, probe: Array[Double],
      k: Int = 10, nProbe: Int = 3,
      excludeId: Option[Long] = None): DataFrame = {
    val cs = quantizer(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    val probedLists = cs.map { case (lid, c) =>
      val d2 = probe.indices.foldLeft(0.0) { (acc, i) =>
        acc + (probe(i) - c(i)) * (probe(i) - c(i))
      }
      (d2, lid)
    }.sorted.take(nProbe).map(_._2)
    import graft.functions.VectorExprs.{dotLit, norm2}
    val normProbe = lit(math.sqrt(probe.foldLeft(0.0)((a, x) => a + x * x)))
    val base = spark.read.parquet(vectorsPath(dir))
      .filter(col("list_id").isin(probedLists: _*))
      .withColumn("batch_id", col("batch_id").cast(LongType))
    val live = maskedOut(base, maskFrame(spark, dir))
    val cands = excludeId.fold(live)(id => live.filter(col("vec_id") =!= id))
    cands
      .withColumn("cos_sim",
        dotLit(col("embedding"), probe) /
          (sqrt(norm2(col("embedding"))) * normProbe))
      .select(col("vec_id"), col("list_id").cast(LongType).as("list_id"),
        col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Probe by corpus member id (one filter scan, then [[query]]
    * excluding it). Fails loudly on an unknown or deleted id. */
  def queryById(spark: SparkSession, dir: String, probeId: Long,
      k: Int = 10, nProbe: Int = 3): DataFrame = {
    val live = maskedOut(
      spark.read.parquet(vectorsPath(dir))
        .withColumn("batch_id", col("batch_id").cast(LongType))
        .filter(col("vec_id") === probeId),
      maskFrame(spark, dir))
    val row = live.orderBy(col("batch_id").desc).select(col("embedding"))
      .limit(1).collect().headOption.getOrElse(
        throw new IllegalArgumentException(s"probe id $probeId not in index"))
    query(spark, dir, row.getSeq[Float](0).map(_.toDouble).toArray,
      k, nProbe, excludeId = Some(probeId))
  }

  /** Physically apply the mask: rewrite live vectors of every
    * CHECKPOINT-SAFE batch as the generation −1 partition set and drop
    * the applied tombstones — but keep the NEWEST batch's partitions and
    * tombstones verbatim, because that one batch may still replay
    * (at-least-once) and must dynamic-overwrite exactly its own
    * partitions; folding it would leave the replayed copy duplicated
    * beside the folded one, and a plain insert has no tombstone to heal
    * it (the [[CdcIndex.compact]] replay-after-compact law; CdcIvfSpec
    * pins it here). Stage-then-swap under `_compact_tmp`; generation −1
    * can never collide with a replayed stream batch id. Returns (rows
    * dropped, tombstones cleared). */
  def compact(spark: SparkSession, dir: String): (Long, Long) = {
    val f = fs(spark, dir)
    val mask = maskFrame(spark, dir)
    val nTomb = mask.count()
    if (nTomb == 0) return (0L, 0L)
    val vectors = spark.read.parquet(vectorsPath(dir))
      .withColumn("batch_id", col("batch_id").cast(LongType))
    val tombs = readOrEmpty(spark, tombstonesPath(dir),
      StructType(tombSchema.fields :+ StructField("batch_id", LongType)))
    val maxRow = vectors.select(col("batch_id"))
      .unionByName(tombs.select(col("batch_id")))
      .agg(max("batch_id")).head
    val maxBatch = if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0)
    val before = vectors.count()
    val live = maskedOut(vectors.filter(col("batch_id") =!= maxBatch), mask)
      .withColumn("batch_id", lit(-1L))
      .unionByName(vectors.filter(col("batch_id") === maxBatch))
    val keptTombs = tombs.filter(col("batch_id") === maxBatch)
    val nKeptTombRows = keptTombs.count()
    val nTombRows = tombs.count() // before the swap deletes the old files
    val tmp = s"$dir/_compact_tmp/vectors"
    val tmpT = s"$dir/_compact_tmp/tombstones"
    live.repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("batch_id", "list_id").parquet(tmp)
    if (nKeptTombRows > 0)
      keptTombs.write.mode("overwrite").partitionBy("batch_id").parquet(tmpT)
    val after = spark.read.parquet(tmp).count()
    f.delete(new Path(vectorsPath(dir)), true)
    f.rename(new Path(tmp), new Path(vectorsPath(dir)))
    f.delete(new Path(tombstonesPath(dir)), true)
    if (nKeptTombRows > 0)
      f.rename(new Path(tmpT), new Path(tombstonesPath(dir)))
    f.delete(new Path(s"$dir/_compact_tmp"), true)
    (before - after, nTombRows - nKeptTombRows)
  }

  /** Wire an embedding change stream (op, vec_id, embedding) into the
    * index. */
  def run(changes: DataFrame, dir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyChanges(batch.sparkSession, batch, id, dir); ()
      }
      .start()
}
