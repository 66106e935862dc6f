package graft.streaming

import graft.functions.HashExprs
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming corpus curation — the LLM-data-pipeline pillar run
  * continuously over an arriving document stream (the batch semantics of
  * `q_curate` + the simhash near-dup gate, per micro-batch):
  *
  *   quality gate (map-only) → in-batch near-dup survivor election →
  *   cross-batch near-dup anti-join against the seen-signature store →
  *   append accepted docs + their signatures.
  *
  * The cross-batch state is a parquet signature store of 8-byte simhashes
  * partitioned by batch_id — kilobytes per million docs, NOT the
  * documents themselves; the anti-join therefore shuffles only hashes. At
  * 100 TB the store would additionally be bucketed by `sig` (the
  * [[CdcBucketed]] treatment) to make the anti-join shuffle-free on the
  * state side; the store layout (one partition per batch) already
  * supports that without changing this code's contract.
  *
  * Idempotence under foreachBatch's at-least-once replay, same recipe as
  * [[CdcStream]]: both writes use dynamic partition overwrite on
  * batch_id (a replay rewrites its own partition), and the signature
  * store is read with `batch_id < current` so a replayed batch never
  * anti-joins against its own first attempt.
  */
object CurateStream {

  final case class Config(idCol: String = "doc_id", textCol: String = "text",
                          minTok: Int = 20, maxTok: Int = 400,
                          minTtr: Double = 0.3,
                          decontGram: Int = 4)

  def acceptedPath(outDir: String): String = s"$outDir/accepted"
  def sigPath(outDir: String): String = s"$outDir/sigs"

  /** Quality gate: token count in [minTok, maxTok], type-token ratio ≥
    * minTtr — identical predicate to the q_curate oracle. */
  def qualityGate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val toks = split(col(cfg.textCol), " ")
    docs
      .withColumn("__ntok", size(toks))
      .withColumn("__ttr",
        size(array_distinct(toks)).cast("double") / col("__ntok"))
      .filter(col("__ntok").between(cfg.minTok, cfg.maxTok) &&
        col("__ttr") >= cfg.minTtr)
      .drop("__ntok", "__ttr")
  }

  private def readSigs(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("sig", LongType), StructField("batch_id", LongType))))
  }

  /** Decontamination gate: drop docs sharing any `decontGram`-gram with
    * the eval set (same semantics as the batch q_decontaminate, as a
    * stream-static anti-join). `evalGrams` is the PREcomputed distinct
    * gram frame ([[evalGramSet]]) — tiny by construction, broadcast by
    * the anti-join; compute it once at stream start, not per batch. */
  def decontGate(docs: DataFrame, evalGrams: DataFrame,
                 cfg: Config = Config()): DataFrame = {
    // shingleExpr yields an empty array for sub-n-token docs — explode
    // drops them, and they can't hit the eval set anyway; its
    // array_distinct is also free correctness here (semi-join semantics)
    val hit = docs
      .withColumn("__toks", split(col(cfg.textCol), " "))
      .select(col(cfg.idCol), explode(expr(
        graft.dedup.MinHashLsh.shingleExpr("__toks", cfg.decontGram)))
        .as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .select(cfg.idCol).distinct()
    docs.join(hit, Seq(cfg.idCol), "left_anti")
  }

  /** Distinct `decontGram`-grams of an eval/benchmark table — the static
    * side of [[decontGate]]. [[run]] caches it once at stream start. */
  def evalGramSet(eval: DataFrame, cfg: Config = Config()): DataFrame =
    eval
      .withColumn("__toks", split(col(cfg.textCol), " "))
      .select(explode(expr(
        graft.dedup.MinHashLsh.shingleExpr("__toks", cfg.decontGram)))
        .as("gram"))
      .distinct()

  /** One micro-batch: returns the number of accepted documents. Callable
    * directly for batch backfills — stream and batch share this code.
    * `evalGrams` (optional) switches on the decontamination gate. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 outDir: String, cfg: Config = Config(),
                 evalGrams: Option[DataFrame] = None): Long = {
    val clean = evalGrams.map(decontGate(batch, _, cfg)).getOrElse(batch)
    val gated = qualityGate(clean, cfg)
      .withColumn("sig", HashExprs.simHash64(split(col(cfg.textCol), " ")))
    // in-batch survivor per signature: min id — deterministic under any
    // partitioning (same election rule as exact dedup / components)
    val w = Window.partitionBy("sig").orderBy(col(cfg.idCol))
    val inBatch = gated.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val seen = readSigs(spark, sigPath(outDir))
      .filter(col("batch_id") < batchId).select("sig")
    val fresh = inBatch.join(seen, Seq("sig"), "left_anti")
      .withColumn("batch_id", lit(batchId))
      .localCheckpoint(true) // one evaluation feeds both writes + count
    fresh.write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(acceptedPath(outDir))
    fresh.select("sig", "batch_id")
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(sigPath(outDir))
    fresh.count()
  }

  /** Wire a streaming document feed into the curation merge. `evalGrams`
    * (optional) decontaminates every micro-batch against a static eval
    * set. */
  def run(docs: DataFrame, outDir: String, checkpointDir: String,
          cfg: Config = Config(),
          evalGrams: Option[DataFrame] = None): StreamingQuery = {
    // cache the static side once: without it every micro-batch re-scans,
    // re-explodes and re-DISTINCTs the whole eval table (cache is lazy —
    // materialized by the first batch; lives until the session drops it)
    val cached = evalGrams.map(_.cache())
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch.sparkSession, batch, id, outDir, cfg, cached); ()
      }
      .start()
  }
}
