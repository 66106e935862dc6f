package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured-Streaming SOURCE over a snapshot-log table — stream the
  * table's committed versions without Kafka or a feed directory:
  *
  * {{{
  * spark.readStream
  *   .format("graft.sources.SnapshotStreamSource")
  *   .option("path", tableDir)
  *   .option("startingVersion", "1")   // optional; default: earliest
  *   .load()                            //   retained, "latest" = new only
  * }}}
  *
  * Offsets are VERSION NUMBERS (the manifest is already a totally
  * ordered commit log), so checkpoint recovery replays exactly the
  * un-committed version range — the same replay-safety argument as the
  * CDC feed, with zero extra infrastructure. Each micro-batch reads the
  * files ADDED in its version range (a version's files minus its
  * predecessor's; the first streamed version contributes its full
  * snapshot).
  *
  * Deliberate scope — loud, never silently wrong:
  *  - APPEND-ONLY version ranges: a version that removed or rewrote a
  *    file (COW delete/update/merge/optimize/replace) fails the batch —
  *    rows already emitted cannot be retracted by a source (use
  *    [[SnapshotLog.changesBetween]] for CDC semantics). Deletion-vector
  *    growth is refused for the same reason.
  *  - Flat schemas of long / int / short / byte / double / float /
  *    boolean / string / date / timestamp columns — the readers decode
  *    parquet directly on executors ([[GroupReadSupport]], public
  *    parquet-hadoop API) without a nested SparkSession.
  *  - Hive-partitioned tables ARE supported: each file's partition
  *    tuple ships with its input partition (from the manifest — never
  *    re-parsed from paths on executors) and the reader fills the
  *    partition columns as constants, decoded under the declared type
  *    (string / integral / date partition columns).
  *
  * Backpressure: `.option("maxVersionsPerTrigger", n)` caps each batch
  * at n versions (admission control) — a stream starting from v1 of a
  * long history catches up in bounded bites instead of one giant batch.
  *
  * Micro-batch planning costs one manifest read per version in the
  * range — metadata-sized, never data-sized; each added file becomes
  * one input partition, so read parallelism tracks the commit's own
  * file layout. */
class SnapshotStreamSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  /** Registered via META-INF/services — `.format("graft-snapshot")`. */
  override def shortName(): String = "graft-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotStreamSource.schemaFor(SnapshotStreamSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SnapshotStreamTable(schema, properties.get("path"))
}

private[sources] object SnapshotStreamSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "SnapshotStreamSource needs .option(\"path\", <table dir>)")
    p
  }

  /** Latest version's declared schema, validated against the source's
    * scope (decodable primitive types; typed-decodable partition
    * columns). */
  def schemaFor(dir: String): StructType = {
    val spark = SparkSession.active
    val vs = SnapshotLog.versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val latest = vs.last
    val schema = SnapshotLog.schemaOf(spark, dir, latest).getOrElse(
      throw new IllegalArgumentException(
        s"$dir has no #schema header — streaming needs a declared schema"))
    schema.fields.foreach { f =>
      require(decodable(f.dataType),
        s"streaming source supports long/int/short/byte/double/float/" +
          s"boolean/string/date/timestamp columns; '${f.name}' is " +
          f.dataType.simpleString)
    }
    SnapshotLog.partitionColsOf(spark, dir, latest).foreach { c =>
      require(partDecodable(schema(c).dataType),
        s"streaming source supports string/integral/date PARTITION " +
          s"columns; '$c' is ${schema(c).dataType.simpleString}")
    }
    schema
  }

  def partDecodable(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         DateType => true
    case _ => false
  }

  def decodable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | BooleanType | StringType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }
}

private[sources] class SnapshotStreamTable(schema0: StructType, dir: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot($dir)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      // column pruning pushes down to the PARQUET column chunks: the
      // reader requests only the projected fields from each file, so a
      // 2-of-20-column streaming consumer skips ~90% of the bytes — the
      // same discipline as the batch scan's ReadSchema
      private var pruned: StructType = schema0
      override def pruneColumns(requiredSchema: StructType): Unit = {
        // preserve the DECLARED column order (parquet assembly order is
        // the file's; our row builder follows the schema we pass)
        val want = requiredSchema.fieldNames.toSet
        pruned = StructType(schema0.fields.filter(f => want(f.name)))
      }
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = pruned
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new SnapshotMicroBatchStream(dir, pruned,
            Option(options.get("startingVersion")),
            Option(options.get("maxVersionsPerTrigger")).map(_.toLong))
      }
    }
}

/** A stream position: "everything up to and including version v". */
private[sources] final case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[sources] class SnapshotMicroBatchStream(dir: String,
    schema: StructType, startingVersion: Option[String],
    maxVersionsPerTrigger: Option[Long])
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  maxVersionsPerTrigger.foreach(m => require(m >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $m"))
  private def spark = SparkSession.active

  override def initialOffset(): Offset = {
    val vs = SnapshotLog.versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val from = startingVersion match {
      case Some("latest") => vs.last + 1 // only versions after stream start
      case Some(s)        => s.toLong
      case None           => vs.head
    }
    VersionOffset(from - 1) // nothing emitted yet; first batch starts here
  }

  // with SupportsAdmissionControl the engine drives the 2-arg form
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val latest = SnapshotLog.versions(spark, dir).last
    val s = start.asInstanceOf[VersionOffset].v
    VersionOffset(maxVersionsPerTrigger match {
      case Some(m) => math.min(latest, s + m) // bounded catch-up bites
      case None    => latest
    })
  }

  override def reportLatestOffset(): Offset =
    VersionOffset(SnapshotLog.versions(spark, dir).last)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[VersionOffset].v,
      end.asInstanceOf[VersionOffset].v)
    if (e <= s) return Array.empty
    val vs = SnapshotLog.versions(spark, dir)
    val newFiles =
      scala.collection.mutable.ArrayBuffer[(String, Map[String, String])]()
    ((s + 1) to e).foreach { v =>
      require(vs.contains(v),
        s"version $v of $dir is gone (vacuumed?) — the stream cannot " +
          s"replay it; restart from a retained version " +
          s"(have ${vs.mkString(",")})")
      val files = SnapshotLog.filesOf(spark, dir, v)
      val prev: Seq[String] =
        if (vs.contains(v - 1)) SnapshotLog.filesOf(spark, dir, v - 1)
        else Seq.empty // first retained version: full snapshot
      val prevSet = prev.map(p => new Path(p).toUri.getPath).toSet
      val removed = prev.filterNot(p => files.map(x =>
        new Path(x).toUri.getPath).toSet.contains(new Path(p).toUri.getPath))
      require(removed.isEmpty,
        s"version $v of $dir removed/rewrote ${removed.size} file(s) — " +
          "the streaming source is append-only (an emitted row cannot be " +
          "retracted); use SnapshotLog.changesBetween for CDC semantics")
      require(SnapshotLog.dvOf(spark, dir, v) ==
        (if (vs.contains(v - 1)) SnapshotLog.dvOf(spark, dir, v - 1)
         else None),
        s"version $v of $dir changed its deletion vector — MoR deletes " +
          "retract emitted rows; use changesBetween for CDC semantics")
      // partition tuples ride with the files (from the MANIFEST — never
      // re-parsed from paths on executors); readers fill the partition
      // columns as typed constants
      val parts = if (SnapshotLog.partitionColsOf(spark, dir, v).nonEmpty)
        SnapshotLog.filePartsOf(spark, dir, v)
      else Map.empty[String, Map[String, String]]
      newFiles ++= files.filterNot(p =>
        prevSet.contains(new Path(p).toUri.getPath))
        .map(p => (p, parts.getOrElse(p, Map.empty[String, String])))
    }
    newFiles.map { case (p, t) =>
      SnapshotFilePartition(p, schema.json, t): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotFileReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final case class SnapshotFilePartition(path: String,
    schemaJson: String,
    partTuple: Map[String, String]) extends InputPartition

private[sources] class SnapshotFileReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapshotFilePartition]
    new GroupFileReader(p.path,
      DataType.fromJson(p.schemaJson).asInstanceOf[StructType], p.partTuple)
  }
}

/** Executor-side parquet reader: one file → InternalRows through the
  * PUBLIC parquet-hadoop Group API (no SparkSession on executors).
  * Column order follows the DECLARED schema; a column missing from the
  * file reads its PARTITION-tuple constant when the file's manifest
  * tuple carries one (hive layouts strip partition columns from the
  * data files), else null (pre-evolution data). */
private[sources] class GroupFileReader(path: String, schema: StructType,
    partTuple: Map[String, String] = Map.empty)
    extends PartitionReader[InternalRow] {
  // typed constants for partition columns, decoded ONCE per file
  private val partConsts: Map[String, Any] = partTuple.flatMap {
    case (c, raw) => schema.fields.find(_.name == c).map { f =>
      c -> (if (raw == "__HIVE_DEFAULT_PARTITION__") null
        else f.dataType match {
          case StringType  => UTF8String.fromString(raw)
          case LongType    => java.lang.Long.parseLong(raw)
          case IntegerType => java.lang.Integer.parseInt(raw)
          case ShortType   => java.lang.Short.parseShort(raw)
          case ByteType    => java.lang.Byte.parseByte(raw)
          case DateType    =>
            java.time.LocalDate.parse(raw).toEpochDay.toInt
          case other => throw new IllegalStateException(
            s"undecodable partition type ${other.simpleString} for '$c'")
        })
    }
  }
  private val reader = {
    val conf = new org.apache.hadoop.conf.Configuration()
    // parquet-level projection: request only the schema's fields that
    // exist in THIS file (typed from the file's own footer, so INT96 vs
    // INT64 timestamps always match) — unrequested column chunks are
    // never read. An all-partition/pre-evolution projection keeps one
    // anchor field purely to drive the row count.
    val hp = new Path(path)
    val footer = org.apache.parquet.hadoop.ParquetFileReader
      .readFooter(conf, hp,
        org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    val fileSchema = footer.getFileMetaData.getSchema
    val want = schema.fieldNames.toSet
    val projected = {
      import scala.jdk.CollectionConverters._
      val fields = fileSchema.getFields.asScala.filter(f =>
        want(f.getName))
      val anchor = if (fields.nonEmpty) fields
        else Seq(fileSchema.getFields.get(0))
      new org.apache.parquet.schema.MessageType(fileSchema.getName,
        anchor.asJava)
    }
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projected.toString)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        hp)
      .withConf(conf)
      .build()
  }
  private var current: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val gt = g.getType
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val fi = if (gt.containsField(f.name)) gt.getFieldIndex(f.name) else -1
      vals(i) =
        if (fi < 0 && partConsts.contains(f.name)) partConsts(f.name)
        else if (fi < 0 || g.getFieldRepetitionCount(fi) == 0) null
        else f.dataType match {
          case LongType    => g.getLong(fi, 0)
          case IntegerType => g.getInteger(fi, 0)
          case ShortType   => g.getInteger(fi, 0).toShort
          case ByteType    => g.getInteger(fi, 0).toByte
          case DoubleType  => g.getDouble(fi, 0)
          case FloatType   => g.getFloat(fi, 0)
          case BooleanType => g.getBoolean(fi, 0)
          case StringType  =>
            UTF8String.fromBytes(g.getBinary(fi, 0).getBytes)
          case DateType    => g.getInteger(fi, 0) // epoch days, as stored
          case TimestampType | TimestampNTZType =>
            // Spark writes INT96 by default (12 bytes: nanos-of-day LE ++
            // julian-day LE) and TIMESTAMP_MICROS when configured —
            // decode whichever the file carries
            import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
            gt.getType(fi).asPrimitiveType().getPrimitiveTypeName match {
              case PrimitiveTypeName.INT96 =>
                val b = g.getInt96(fi, 0).getBytes
                val buf = java.nio.ByteBuffer.wrap(b)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                val nanosOfDay = buf.getLong
                val julianDay = buf.getInt
                (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
              case _ => g.getLong(fi, 0) // TIMESTAMP_MICROS
            }
          case other => throw new IllegalStateException(
            s"undecodable type ${other.simpleString} for '${f.name}'")
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = reader.close()
}
