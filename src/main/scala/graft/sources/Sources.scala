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

  /** Header CSV read AS-IS (every column string-typed, named by the
    * header) — the schema-drift entry point: no positional schema binding,
    * so [[alignToSchema]] can match by NAME and detect added/dropped
    * columns. No inference scan (header line only). */
  def csvRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Project a source frame onto the DECLARED schema by column name —
    * the schema-drift contract of the extract reader (a CDC source's
    * upstream DDL changes between runs; the declared config is the
    * truth):
    *   - declared column present  → cast to the declared type
    *   - declared VALUE column missing → null (tolerant) / fail (strict)
    *   - undeclared extra column  → dropped (tolerant) / fail (strict)
    *   - declared KEY column missing → always an error: a null-keyed
    *     merge would silently fuse unrelated rows into one key.
    * Cheap for csv (header-only) and parquet (footer schema); JSON pays
    * its usual inference pass when read without a schema. */
  def alignToSchema(df: DataFrame, schema: StructType, keyCols: Seq[String],
                    strict: Boolean): DataFrame = {
    val present = df.columns.toSet
    val declared = schema.fieldNames.toSet
    val missing = schema.fieldNames.filterNot(present)
    val extra = df.columns.filterNot(declared)
    val missingKeys = keyCols.filter(missing.contains)
    if (missingKeys.nonEmpty)
      throw new IllegalArgumentException(
        s"extract is missing key column(s): ${missingKeys.mkString(", ")}")
    if (strict && (missing.nonEmpty || extra.nonEmpty))
      throw new IllegalArgumentException(
        s"schema drift in strict mode: missing=${missing.mkString(",")} " +
          s"extra=${extra.mkString(",")}")
    val cols = schema.fields.map { f =>
      if (present(f.name)) org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }
    // a PERMISSIVE reader null-fills ragged rows, and the merge's
    // null-safe key equality (<=>) would then fuse every null-keyed row
    // many-to-many — reject them at the boundary: tolerant mode drops
    // them, strict mode fails the run in-plan (assert_true: no extra
    // scan, evaluated as rows stream through the merge)
    import org.apache.spark.sql.functions.{assert_true, col, lit}
    val keyNull = keyCols.map(col(_).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    val aligned = df.select(cols.toIndexedSeq: _*)
    if (strict) aligned.filter(assert_true(!keyNull).isNull)
    else aligned.filter(!keyNull)
  }

  /** ORC read with an explicit schema — columnar alternative when the
    * lakehouse standard is ORC (Hive estates); same pushdown/pruning
    * behavior as parquet (predicate + column pruning reach the stripe
    * reader). */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC snapshot writer (zlib by Spark default; bucketing/partitioning
    * composes via the caller's writer options as with parquet). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Media-file ingest: Spark's `binaryFile` source reads whole files as
    * rows `(path, modificationTime, length, content: binary)` — the
    * entry point that turns a directory of PNG/WAV/video files into the
    * multimodal binary-payload column
    * ([[graft.multimodal.Multimodal.extractFeatures]] decodes it).
    * `pathGlobFilter` prunes by extension at the LISTING, so a mixed
    * media lake never reads the wrong modality's bytes. At scale, set
    * `spark.sql.files.maxPartitionBytes` so one partition batches many
    * small media files (one decoder init per partition, not per file). */
  def binaryFiles(spark: SparkSession, dir: String,
                  glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

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

  /** CDC-source-connector-shaped adapter (the "CDC source connectors" of
    * BASELINE.json): turns a stream of change RECORDS — a serialized
    * payload plus op/ts metadata, exactly the shape a Kafka/Debezium
    * topic read yields after
    * `.selectExpr("CAST(value AS STRING) AS value", ...)` — into typed
    * envelope rows `(payload columns…, op, ts)` for
    * [[graft.streaming.CdcStream.startFromEnvelope]]. No Kafka connector
    * exists in this sandbox (zero egress), so the adapter takes any
    * DataFrame with that shape — MemoryStream/rate/file streams included;
    * on a real cluster the input is `spark.readStream.format("kafka")`. */
  def cdcEnvelope(records: DataFrame, payloadSchema: StructType,
                  valueCol: String = "value", opCol: String = "op",
                  tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions._
    records
      .select(from_json(col(valueCol).cast("string"), payloadSchema).as("payload"),
        col(opCol).as("op"), col(tsCol).as("ts"))
      .select(payloadSchema.fieldNames.map(n => col(s"payload.$n")).toIndexedSeq
        :+ col("op") :+ col("ts"): _*)
  }

  /** Debezium-envelope adapter (contract-level "CDC source connector"):
    * parses the standard Debezium change-event envelope
    * `{"before": {...}|null, "after": {...}|null, "op": "c|r|u|d",
    * "ts_ms": <epoch millis>}` — the public wire format every
    * Debezium-family connector emits on its topic — from a string/binary
    * `value` column into the typed envelope rows
    * [[graft.streaming.CdcStream.startFromEnvelope]] consumes.
    *
    * Semantics mapping:
    *   - `c` (create) and `r` (snapshot read) → I, payload from `after`
    *   - `u` (update) → U, payload from `after`
    *   - `d` (delete) → D, payload from `before` (`after` is null on d)
    *   - anything else (`t` truncate, `m` message, Kafka tombstones /
    *     unparsable lines, which from_json nulls out) is dropped —
    *     row-grain ops are the only events a keyed merge can apply.
    *
    * No Kafka jars exist in this sandbox (zero egress), so the input is
    * any DataFrame bearing the serialized envelope — MemoryStream in
    * tests, `spark.readStream.format("kafka")...selectExpr("value")` on
    * a real cluster. The parse is one codegen'd from_json per row; at
    * 100 TB the adapter adds no shuffle (narrow projection only). */
  def debeziumEnvelope(records: DataFrame, payloadSchema: StructType,
                       valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    val envSchema = StructType(Seq(
      StructField("before", payloadSchema),
      StructField("after", payloadSchema),
      StructField("op", StringType),
      StructField("ts_ms", LongType)))
    val parsed = records
      .select(from_json(col(valueCol).cast("string"), envSchema).as("e"))
    val side = when(col("e.op") === "d", col("e.before"))
      .otherwise(col("e.after"))
    parsed
      .filter(col("e.op").isin("c", "r", "u", "d"))
      .select(payloadSchema.fieldNames
        .map(n => side.getField(n).as(n)).toIndexedSeq
        :+ when(col("e.op") === "d", lit("D"))
          .when(col("e.op") === "u", lit("U"))
          .otherwise(lit("I")).as("op")
        :+ timestamp_millis(col("e.ts_ms")).as("ts"): _*)
  }

  /** The DEAD-LETTER complement of [[debeziumEnvelope]]: every input
    * record the adapter would silently drop, with the RAW payload and a
    * reason — `unparsable` (from_json rejected the line / tombstone),
    * `missing_op` (valid JSON, no op field), or `unsupported_op:<op>`
    * (truncate/message events a keyed merge cannot apply). Silent drops
    * are invisible data loss at 100 TB: one misconfigured connector
    * serializing Avro instead of JSON nulls out EVERY record and the
    * merge "succeeds" on zero rows; quarantining the rejects (and
    * alerting on their count) is the ops contract real CDC platforms
    * ship. Conservation law (spec-pinned): envelope rows + dead letters
    * == input rows, exactly. Same narrow map-only shape as the adapter;
    * runs identically on batch and streaming frames. */
  def debeziumDeadLetters(records: DataFrame, payloadSchema: StructType,
                          valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    val envSchema = StructType(Seq(
      StructField("before", payloadSchema),
      StructField("after", payloadSchema),
      StructField("op", StringType),
      StructField("ts_ms", LongType)))
    records
      .select(col(valueCol).cast("string").as("value"))
      .select(col("value"),
        from_json(col("value"), envSchema).as("e"))
      .filter(col("e").isNull || col("e.op").isNull ||
        !col("e.op").isin("c", "r", "u", "d"))
      // PERMISSIVE from_json yields an ALL-NULL struct (not a null
      // struct) for an unparsable line — distinguish it from valid JSON
      // that merely lacks an op by the whole envelope being empty (an
      // empty {} envelope classifies as unparsable too, which it is)
      .select(col("value"),
        when(col("e").isNull || (col("e.op").isNull &&
            col("e.before").isNull && col("e.after").isNull &&
            col("e.ts_ms").isNull), lit("unparsable"))
          .when(col("e.op").isNull, lit("missing_op"))
          .otherwise(concat(lit("unsupported_op:"), col("e.op")))
          .as("reason"))
  }

  /** Kafka topic reader for the Debezium adapter — the production
    * binding [[debeziumEnvelope]] plugs into. Builds the standard
    * `format("kafka")` reader and projects the record `value` (the
    * envelope JSON); everything downstream is identical to the file
    * stand-in. COMPILED but config-dead in this sandbox: no Kafka jars
    * ship here (zero egress), so `load()` throws
    * "Failed to find data source: kafka" — on a real cluster add
    * `spark-sql-kafka-0-10` to the classpath and set the
    * `kafka_bootstrap`/`kafka_topic` config keys; nothing else changes. */
  def kafkaRecords(spark: SparkSession,
      k: graft.KafkaBinding): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", k.bootstrapServers)
      .option("subscribe", k.topic)
      .option("startingOffsets", k.startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** Snapshot sink: overwrite-write a parquet snapshot (R9). */
  def writeSnapshot(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Append a change-feed batch (R9). */
  def appendChangeFeed(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)
}
