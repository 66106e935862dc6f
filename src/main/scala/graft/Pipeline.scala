package graft

import graft.cdc.{CdcConfig, CdcMerge}
import graft.sources.Sources
import graft.streaming.CdcStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's top-level surface [upstream `cdc.py` main(config),
  * SURVEY.md §3.1]: a config-driven CDC pipeline run — read one incoming
  * extract (R1), project to the declared columns (R2), merge against the
  * previous snapshot (R3–R7), persist the new snapshot + change feed
  * (R9), and return the per-op counts (R8) the reference logs per run.
  *
  * Config is a plain case class (the YAML of the reference is an
  * infra-side concern, not operator surface — SURVEY §2.1 R10).
  *
  * Entry shapes:
  *  - initial load: no previous snapshot → everything classifies I
  *  - incremental merge: full extract vs previous snapshot
  *  - [[runStream]]: the same merge per arriving file via foreachBatch
  */
final case class PipelineConfig(
    sourcePath: String,
    format: String, // "csv" | "json" | "parquet"
    schema: StructType,
    keyCols: Seq[String],
    valueCols: Seq[String],
    stateDir: String) {
  def cdc: CdcConfig = CdcConfig(keyCols, valueCols)
}

object Pipeline {

  private def readExtract(spark: SparkSession, cfg: PipelineConfig): DataFrame = {
    val raw = cfg.format match {
      case "csv"     => Sources.csv(spark, cfg.sourcePath, cfg.schema)
      case "json"    => Sources.jsonLines(spark, cfg.sourcePath, cfg.schema)
      case "parquet" => spark.read.schema(cfg.schema).parquet(cfg.sourcePath)
      case other     => throw new IllegalArgumentException(s"format: $other")
    }
    raw.select(cfg.cdc.allCols.map(org.apache.spark.sql.functions.col): _*) // R2
  }

  /** One batch run. Returns the per-op counts (R8). */
  def run(spark: SparkSession, cfg: PipelineConfig,
          batchId: Long): Map[String, Long] = {
    val incoming = readExtract(spark, cfg)
    CdcStream.mergeBatch(incoming, batchId, cfg.cdc, cfg.stateDir)
    val feed = spark.read.parquet(CdcStream.changesPath(cfg.stateDir))
      .filter(org.apache.spark.sql.functions.col("batch_id") === batchId)
    val opCounts = CdcMerge.counts(feed).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // N rows never reach the feed; derive them from the snapshot size
    val snapshotRows = CdcStream.currentState(spark, cfg.stateDir)
      .map(_.count()).getOrElse(0L)
    val iun = opCounts.getOrElse(CdcMerge.Insert, 0L) +
      opCounts.getOrElse(CdcMerge.Update, 0L)
    opCounts + (CdcMerge.Unchanged -> (snapshotRows - iun))
  }

  /** Many-table run — the reference's "at scale" deployment shape is
    * hundreds of source tables per scheduled run [upstream `README.md`].
    * Tables are independent merges, so they run concurrently on the
    * driver (each submits its own jobs; the scheduler pool interleaves
    * them — on a real cluster pair this with FAIR scheduling). Returns
    * per-table op counts; a failed table is reported, not fatal to the
    * rest. */
  def runAll(spark: SparkSession, configs: Seq[PipelineConfig], batchId: Long,
             parallelism: Int = 4): Map[String, Either[String, Map[String, Long]]] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = configs.map { cfg =>
        Future {
          cfg.stateDir -> (try Right(run(spark, cfg, batchId))
          catch { case e: Exception => Left(e.getMessage) })
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf).toMap
    } finally pool.shutdown()
  }

  /** The streaming shape: extracts arriving as files under sourcePath. */
  def runStream(spark: SparkSession, cfg: PipelineConfig,
                checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = cfg.format match {
      case "csv"     => Sources.csvStream(spark, cfg.sourcePath, cfg.schema)
      case "parquet" => Sources.parquetStream(spark, cfg.sourcePath, cfg.schema)
      case other     => throw new IllegalArgumentException(s"stream format: $other")
    }
    CdcStream.start(stream, cfg.cdc, cfg.stateDir, checkpointDir)
  }
}
