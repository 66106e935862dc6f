package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch and streaming source/sink helpers (SURVEY.md §2.2-A impl rows).
  *
  * The reference ingests header-CSV incremental extracts [upstream
  * `cdc.py` R1]; these wrappers pin the options that matter for
  * correctness at scale: explicit schemas (inference = an extra full scan
  * of 100 TB), header handling, and permissive-vs-failfast mode.
  */
object Sources {

  /** Header CSV with an explicit schema — never schema inference in
    * production paths. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          failFast: Boolean = true): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** JSON-lines with an explicit schema. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Incremental-extract arrival as a file stream: new parquet files
    * dropped into `dir` become micro-batches. `maxFilesPerTrigger=1`
    * mirrors one-extract-per-batch CDC semantics. */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType,
                    maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** CSV file stream (header extracts arriving over time). */
  def csvStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream
      .option("header", "true")
      .schema(schema)
      .csv(dir)

  /** Snapshot sink: overwrite-write a parquet snapshot (R9). */
  def writeSnapshot(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Append a change-feed batch (R9). */
  def appendChangeFeed(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)
}
