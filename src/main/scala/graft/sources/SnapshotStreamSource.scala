package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 table over a snapshot-log directory — BOTH halves of
  * the read surface behind one format string:
  *
  * {{{
  * // batch: the table as of its latest (or a named) version
  * spark.read.format("graft-snapshot").option("path", tableDir).load()
  * spark.read.format("graft-snapshot").option("path", tableDir)
  *   .option("versionAsOf", "3").load()          // time travel
  *
  * // streaming: committed versions as micro-batches
  * spark.readStream.format("graft-snapshot").option("path", tableDir)
  *   .option("startingVersion", "1")   // optional; default: earliest
  *   .load()                            //   retained, "latest" = new only
  * }}}
  *
  * The BATCH scan plans the version's exact manifest file list (same
  * visibility rule as [[SnapshotLog.read]]), fills hive-partition
  * columns from manifest tuples, and applies merge-on-read deletion
  * vectors by shipping each file's serialized roaring bitmap inside its
  * input partition (KB-scale) — readers skip tombstoned positions
  * locally, so a DV-carrying table reads identically through SQL
  * clients and the library API.
  *
  * STREAMING offsets are VERSION NUMBERS (the manifest is already a
  * totally ordered commit log), so checkpoint recovery replays exactly
  * the un-committed version range — the same replay-safety argument as
  * the CDC feed, with zero extra infrastructure. Each micro-batch reads
  * the files ADDED in its version range (a version's files minus its
  * predecessor's; the stream's first version contributes its full
  * snapshot). The offset JSON also records the stream's START version,
  * so a vacuumed predecessor at recovery is DISTINGUISHABLE from the
  * legitimate initial snapshot and fails loudly instead of silently
  * re-emitting every carried file.
  *
  * Deliberate scope — loud, never silently wrong:
  *  - APPEND-ONLY version ranges for streaming: a version that removed
  *    or rewrote a file (COW delete/update/merge/optimize/replace)
  *    fails the batch — rows already emitted cannot be retracted by a
  *    source (use [[SnapshotLog.changesBetween]] for CDC semantics).
  *    Deletion-vector growth is refused for the same reason (batch
  *    reads apply DVs; streams refuse their growth).
  *  - EXCEPT under `.option("readChangeFeed", "true")`: rows carry a
  *    `_change_type` marker (insert | delete | update_preimage |
  *    update_postimage), appends derive their inserts at file grain,
  *    and rewrite commits are read through their RECORDED change files
  *    ([[SnapshotLog.ChangeFeedProperty]] — the rewrite verbs write
  *    their exact, survivor-cancelled changes when the table property
  *    is on; a rewrite that ran without it still refuses loudly). The
  *    replay law: (inserts ∪ postimages) exceptAll (deletes ∪
  *    preimages) over the feed reconstructs the table content.
  *  - Flat schemas of long / int / short / byte / double / float /
  *    boolean / string / date / timestamp / decimal columns, plus
  *    single-level arrays of those element types (the embeddings
  *    corpus is array<float>) — the readers decode parquet directly on
  *    executors ([[org.apache.parquet.hadoop.example.GroupReadSupport]],
  *    public parquet-hadoop API) without a nested SparkSession.
  *  - Hive-partitioned tables ARE supported: each file's partition
  *    tuple ships with its input partition (from the manifest — never
  *    re-parsed from paths on executors) and the reader fills the
  *    partition columns as constants, decoded under the declared type
  *    (string / integral / date partition columns).
  *
  * Backpressure: `.option("maxVersionsPerTrigger", n)` caps each batch
  * at n versions (admission control) — a stream starting from v1 of a
  * long history catches up in bounded bites instead of one giant batch.
  * `.option("maxBytesPerTrigger", b)` bounds each batch by the NEW
  * bytes its versions add instead (versions admitted until the budget
  * is crossed; the first pending version always rides, so a single fat
  * version is admitted alone rather than wedging the stream). Both
  * compose: versions cap first, bytes tighten.
  *
  * Micro-batch planning costs one manifest read per version in the
  * range — metadata-sized, never data-sized, and O(files) per version
  * (file-set membership via one prebuilt hash set); each added file
  * becomes one input partition, so read parallelism tracks the
  * commit's own file layout. */
class SnapshotStreamSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister
    with org.apache.spark.sql.sources.CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {
  /** Registered via META-INF/services — `.format("graft-snapshot")`. */
  override def shortName(): String = "graft-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = SnapshotStreamSource.schemaFor(
      SnapshotStreamSource.pathOf(options),
      Option(options.get("versionAsOf")).map(_.toLong))
    // readChangeFeed streams append the change-type marker and the
    // commit version (the Delta-CDF _commit_version: what a keyed
    // applier orders same-key changes by when one batch spans versions)
    if (java.lang.Boolean.parseBoolean(
        options.getOrDefault("readChangeFeed", "false"))) {
      Seq("_change_type", "_commit_version", "_commit_timestamp")
        .foreach(c => require(!base.fieldNames.contains(c),
          s"the table already has a $c column — readChangeFeed " +
            "reserves that name"))
      base.add("_change_type", org.apache.spark.sql.types.StringType,
        nullable = true)
        .add("_commit_version", org.apache.spark.sql.types.LongType,
          nullable = true)
        .add("_commit_timestamp",
          org.apache.spark.sql.types.TimestampType, nullable = true)
    } else base
  }

  /** The BATCH write half (`df.write.format("graft-snapshot")`), routed
    * through the library's commit verbs so CHECK constraints, schema
    * merge, DV carry, partition purity and race rebase all apply. The
    * table deliberately declares NO v2 write capability: Spark then
    * plans writes through THIS v1 path, whose driver-side DataFrame is
    * exactly what the commit verbs want — and a first write to a fresh
    * directory needs no pre-existing schema. Append does NOT stamp a
    * `#batch=` header ([[SnapshotLog.append]]): a one-off batch append
    * must never make a later streaming sink's epoch replay skip. */
  override def createRelation(ctx: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-snapshot write needs .option(\"path\", <table dir>)"))
    val spark = data.sparkSession
    val exists = SnapshotLog.versions(spark, dir).nonEmpty
    mode match {
      case SaveMode.Append    => SnapshotLog.append(spark, dir, data)
      case SaveMode.Overwrite => SnapshotLog.commit(spark, dir, data)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"$dir already has committed versions (SaveMode.ErrorIfExists)")
        SnapshotLog.commit(spark, dir, data)
      case SaveMode.Ignore =>
        if (!exists) SnapshotLog.commit(spark, dir, data)
    }
    val schema0 = data.schema
    new org.apache.spark.sql.sources.BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext = ctx
      override def schema: StructType = schema0
    }
  }

  /** The STREAMING sink half (`df.writeStream.format("graft-snapshot")`)
    * — exactly-once by construction: each epoch commits through
    * [[SnapshotLog.commitBatch]] (Append) or
    * [[SnapshotLog.commitBatchReplace]] (Complete), whose `#batch=`
    * replay idempotence makes a restarted query's re-delivered epoch a
    * no-op. Update mode is refused: a snapshot append cannot retract.
    * partitionBy is refused too — a partition-DECLARED table already
    * drives the layout of every appended batch. */
  override def createSink(ctx: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-snapshot sink: the table's DECLARED layout drives batch " +
        "partitioning (commitPartitioned declares it) — drop partitionBy")
    require(outputMode != org.apache.spark.sql.streaming.OutputMode.Update(),
      "graft-snapshot sink supports Append (commitBatch) and Complete " +
        "(commitBatchReplace); Update retracts rows a snapshot append " +
        "cannot express")
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-snapshot sink needs .option(\"path\", <table dir>)"))
    new SnapshotSink(dir,
      outputMode == org.apache.spark.sql.streaming.OutputMode.Complete())
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    def prop(k: String): Option[String] = {
      import scala.jdk.CollectionConverters._
      properties.asScala.collectFirst {
        case (pk, pv) if pk.equalsIgnoreCase(k) => pv }
    }
    new SnapshotStreamTable(schema,
      prop("path").getOrElse(throw new IllegalArgumentException(
        "graft-snapshot needs .option(\"path\", <table dir>)")),
      prop("versionAsOf").map(_.toLong))
  }
}

/** V1 micro-batch sink over a snapshot-log table (the same shape as
  * Spark's own FileStreamSink). The incoming frame is the incremental
  * execution's streaming-marked plan, which a fresh `.write` analysis
  * refuses — so the planned rows rebind as a plain batch frame first
  * (one InternalRow→Row conversion; the batch executes once, inside the
  * commit's own write action). */
private[sources] class SnapshotSink(dir: String, complete: Boolean)
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = {
    val spark = data.sparkSession
    val schema = data.schema
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(schema)
    val rowRdd = data.queryExecution.toRdd
      .map(ir => conv(ir.copy()).asInstanceOf[org.apache.spark.sql.Row])
    val fresh = spark.createDataFrame(rowRdd, schema)
    if (complete) {
      SnapshotLog.requireUnpartitionedForReplace(spark, dir,
        "the graft-snapshot Complete-mode sink")
      SnapshotLog.commitBatchReplace(spark, dir, fresh, batchId)
    } else SnapshotLog.commitBatch(spark, dir, fresh, batchId)
  }
  override def toString: String = s"SnapshotSink($dir)"
}

private[sources] object SnapshotStreamSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "SnapshotStreamSource needs .option(\"path\", <table dir>)")
    p
  }

  /** The version's declared schema (default: latest), validated against
    * the source's scope (decodable types; typed-decodable partition
    * columns). A table with NO committed versions infers as the empty
    * schema — the WRITE path needs getTable to succeed on a fresh
    * directory (Spark infers before deciding read vs write); reads of
    * such a table still fail loudly, at scan planning / stream start. */
  def schemaFor(dir: String, version: Option[Long] = None): StructType = {
    val spark = SparkSession.active
    val vs = SnapshotLog.versions(spark, dir)
    if (vs.isEmpty && version.isEmpty) return new StructType()
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v of $dir does not exist (have ${vs.mkString(",")})")
    val schema = SnapshotLog.schemaOf(spark, dir, v).getOrElse(
      throw new IllegalArgumentException(
        s"$dir has no #schema header — the DSv2 table needs a declared schema"))
    schema.fields.foreach { f =>
      require(decodable(f.dataType),
        s"streaming source supports long/int/short/byte/double/float/" +
          s"boolean/string/date/timestamp/decimal columns and " +
          s"single-level arrays of those; '${f.name}' is " +
          f.dataType.simpleString)
    }
    SnapshotLog.partitionColsOf(spark, dir, v).foreach { c =>
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
    case _: DecimalType => true
    case ArrayType(et, _) if !et.isInstanceOf[ArrayType] => decodable(et)
    case _ => false
  }

  /** `schema` with fields under their PHYSICAL (storage) names per the
    * column mapping — what the executor-side readers resolve footers
    * by. Identity on never-renamed tables. */
  private[sources] def physicalFields(cm: Map[String, String],
      schema: StructType): StructType =
    if (cm.isEmpty) schema
    else StructType(schema.fields.map(f =>
      f.copy(name = cm.getOrElse(f.name, f.name))))
}

private[graft] class SnapshotStreamTable(schema0: StructType,
    private[graft] val dir: String,
    private[graft] val versionAsOf: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot($dir)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      // column pruning pushes down to the PARQUET column chunks: the
      // reader requests only the projected fields from each file, so a
      // 2-of-20-column consumer skips ~90% of the bytes — the same
      // discipline as the batch scan's ReadSchema; applies to BOTH the
      // batch and the streaming scan
      private var pruned: StructType = schema0
      override def pruneColumns(requiredSchema: StructType): Unit = {
        // preserve the DECLARED column order (parquet assembly order is
        // the file's; our row builder follows the schema we pass)
        val want = requiredSchema.fieldNames.toSet
        pruned = StructType(schema0.fields.filter(f => want(f.name)))
      }
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = pruned
        override def toBatch: Batch = {
          // loud, never silently NULL-marked: batch change feeds go
          // through SnapshotLog.changeFeed / the TVF
          require(!java.lang.Boolean.parseBoolean(
            options.getOrDefault("readChangeFeed", "false")),
            "readChangeFeed is a streaming read option; for a batch " +
              "change feed use snapshot_change_feed(path, fromV, toV) " +
              "or SnapshotLog.changeFeed")
          new SnapshotBatch(dir, pruned,
            versionAsOf.orElse(
              Option(options.get("versionAsOf")).map(_.toLong)))
        }
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = {
          require(versionAsOf.isEmpty && options.get("versionAsOf") == null,
            "versionAsOf is a batch-read option; streams start from " +
              "startingVersion instead")
          val cdf = java.lang.Boolean.parseBoolean(
            options.getOrDefault("readChangeFeed", "false"))
          // the marker column must be IN the relation schema — catalog
          // tables declare the plain schema, so CDF reads go through
          // the path-based format whose inferSchema appends it
          require(!cdf || schema0.fieldNames.contains("_change_type"),
            "readChangeFeed streams carry a _change_type column; read " +
              "via spark.readStream.format(\"graft-snapshot\")" +
              ".option(\"path\", <table dir>)" +
              ".option(\"readChangeFeed\", \"true\")")
          new SnapshotMicroBatchStream(dir, pruned,
            Option(options.get("startingVersion")),
            Option(options.get("maxVersionsPerTrigger")).map(_.toLong),
            Option(options.get("maxBytesPerTrigger")).map(_.toLong),
            changeFeed = cdf)
        }
      }
    }
}

/** The batch half: one version's manifest file list (default latest),
  * partition tuples from the manifest, deletion vector applied via
  * per-file bitmaps shipped inside the partitions. */
private[sources] class SnapshotBatch(dir: String, schema: StructType,
    versionAsOf: Option[Long]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val vs = SnapshotLog.versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val v = versionAsOf.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v of $dir does not exist (have ${vs.mkString(",")})")
    val files = SnapshotLog.filesOf(spark, dir, v)
    val parts = if (SnapshotLog.partitionColsOf(spark, dir, v).nonEmpty)
      SnapshotLog.filePartsOf(spark, dir, v)
    else Map.empty[String, Map[String, String]]
    val dvs = SnapshotLog.dvBitmapsOf(spark, dir, v)
    // ship the pruned schema under PHYSICAL names: the executor reader
    // resolves footer fields by name, rows are positional, and renamed
    // columns keep their storage name (partition-tuple keys are
    // un-renameable, so partConsts lookups stay literal)
    val phys = SnapshotStreamSource
      .physicalFields(SnapshotLog.colmapOf(spark, dir, v), schema)
    files.map { p =>
      SnapshotFilePartition(p, phys.json,
        parts.getOrElse(p, Map.empty[String, String]),
        dvs.get(new Path(p).toUri.getPath)): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotFileReaderFactory
}

/** A stream position: "everything up to and including version v".
  * `start` is the stream's FIRST emitted version, carried in the offset
  * JSON so recovery can tell the legitimate initial snapshot apart from
  * a vacuumed predecessor (legacy plain-long offsets parse with
  * start = -1 = unknown → any snapshot boundary fails loudly).
  *
  * `files` is the INITIAL-SNAPSHOT file cursor: while the stream's
  * first version is a genuine full snapshot (no retained predecessor)
  * and a byte budget is set, the snapshot drains in file-grain bites —
  * `files = k ≥ 0` means "k files of version `start` emitted, snapshot
  * incomplete". Everywhere else `files = -1` (complete / not in the
  * snapshot phase) and offsets stay version-grain exactly as before;
  * the field is omitted from the JSON, so old checkpoints parse and
  * new post-snapshot checkpoints stay readable by old code. */
private[sources] final case class VersionOffset(v: Long, start: Long = -1L,
    files: Long = -1L) extends Offset {
  override def json(): String =
    if (files >= 0) s"""{"v":$v,"s":$start,"f":$files}"""
    else s"""{"v":$v,"s":$start}"""
  /** Total order over stream positions: a version with an in-flight
    * file cursor sorts below the same version completed. */
  def pos: (Long, Long) = (v, if (files < 0) Long.MaxValue else files)
}

private[sources] object VersionOffset {
  private val Shape = """\{"v":(-?\d+),"s":(-?\d+)\}""".r
  private val ShapeF = """\{"v":(-?\d+),"s":(-?\d+),"f":(-?\d+)\}""".r
  def parse(json: String): VersionOffset = json.trim match {
    case ShapeF(v, s, f) => VersionOffset(v.toLong, s.toLong, f.toLong)
    case Shape(v, s)     => VersionOffset(v.toLong, s.toLong)
    case legacy          => VersionOffset(legacy.toLong) // pre-r10 plain long
  }
}

private[sources] class SnapshotMicroBatchStream(dir: String,
    schema: StructType, startingVersion: Option[String],
    maxVersionsPerTrigger: Option[Long],
    maxBytesPerTrigger: Option[Long] = None,
    changeFeed: Boolean = false)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  maxVersionsPerTrigger.foreach(m => require(m >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $m"))
  maxBytesPerTrigger.foreach(m => require(m >= 1,
    s"maxBytesPerTrigger must be >= 1, got $m"))
  private def spark = SparkSession.active

  /** `Trigger.AvailableNow` drain target: the latest version AT TRIGGER
    * START, pinned once per run. [[latestOffset(Offset,ReadLimit)*]]
    * then never plans past it — versions committed mid-drain wait for
    * the next scheduled run (the contract's "available now") — while
    * maxVersionsPerTrigger / maxBytesPerTrigger admission still bounds
    * each catch-up bite; the engine stops once the offset reaches the
    * target. Offsets stay version-grain, so a mid-drain restart resumes
    * exactly-once from the checkpoint like any other run. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val vs = SnapshotLog.versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    availableNowTarget = Some(vs.last)
  }

  /** The initial-snapshot version's (file list, per-file bytes),
    * cached once per stream instance: manifests are immutable, and the
    * budgeted bootstrap re-enters the admission walk once per bite —
    * without the cache a 10^6-file snapshot re-parses its manifest and
    * re-stats every file O(bites) times (pure driver-side waste). Size
    * stats load lazily (only the byte-budget path needs them). */
  @volatile private var snapshotCache: Option[(Long, Seq[String])] = None
  @volatile private var snapshotSizes: Option[(Long, Array[Long])] = None

  private def snapshotFilesOf(v: Long): Seq[String] =
    snapshotCache match {
      case Some((cv, fs)) if cv == v => fs
      case _ =>
        val fs = SnapshotLog.filesOf(spark, dir, v)
        snapshotCache = Some((v, fs))
        fs
    }

  private def snapshotSizesOf(v: Long): Array[Long] =
    snapshotSizes match {
      case Some((cv, sz)) if cv == v => sz
      case _ =>
        val f = new Path(dir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val sz = snapshotFilesOf(v)
          .map(p => f.getFileStatus(new Path(p)).getLen).toArray
        snapshotSizes = Some((v, sz))
        sz
    }

  /** Loud guard for the one hole the version-range checks miss: the
    * stream is MID-FILE-CURSOR inside its initial snapshot (some files
    * emitted) and the snapshot version was vacuumed — silently falling
    * through to the version walk would skip the un-emitted tail of the
    * table forever. The not-yet-emitted cases stay with the existing
    * guards: a vacuumed pending start raises the version loop's
    * replay-gap error, and `startingVersion=latest` legitimately
    * points start PAST the log until the next commit arrives. */
  private def requireSnapshotRetained(so: VersionOffset,
      vset: Set[Long]): Unit =
    require(!(so.v == so.start && so.files >= 0) ||
        vset.contains(so.start),
      s"version ${so.start} of $dir (the stream's initial snapshot, " +
        "still draining) is gone (vacuumed?) — continuing would " +
        "silently skip the snapshot's un-emitted files; restart the " +
        "stream from a retained version")

  /** Bytes version `v` would ADD to the stream: sizes of its files not
    * carried from `v-1` (for the stream's initial snapshot, every
    * file). Driver-side `getFileStatus` over the NEW files only — the
    * same listing class FileStreamSource pays per trigger. */
  private def newFileBytes(vs: Set[Long], v: Long): Long = {
    def norm(p: String): String = new Path(p).toUri.getPath
    val prevSet =
      if (vs.contains(v - 1))
        SnapshotLog.filesOf(spark, dir, v - 1).map(norm).toSet
      else Set.empty[String]
    val fresh = SnapshotLog.filesOf(spark, dir, v)
      .filterNot(p => prevSet.contains(norm(p)))
    if (fresh.isEmpty) 0L
    else {
      val f = new Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fresh.map(p => f.getFileStatus(new Path(p)).getLen).sum
    }
  }

  override def initialOffset(): Offset = {
    val vs = SnapshotLog.versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val from = startingVersion match {
      case Some("latest") => vs.last + 1 // only versions after stream start
      case Some(s)        => s.toLong
      case None           => vs.head
    }
    VersionOffset(from - 1, from) // nothing emitted yet; first batch here
  }

  // with SupportsAdmissionControl the engine drives the 2-arg form
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val vs = SnapshotLog.versions(spark, dir)
    // under Trigger.AvailableNow the drain never passes the pinned
    // target (min guards the degenerate restored-log case — the target
    // was a real version when pinned, and commits only append)
    val latest = availableNowTarget
      .map(t => math.min(t, vs.last)).getOrElse(vs.last)
    val so = start.asInstanceOf[VersionOffset]
    // INITIAL-SNAPSHOT admission at FILE grain: the stream's first
    // version IS the whole table when no predecessor is retained — for
    // a 100 TB replica bootstrap, "admit ≥1 version per trigger" means
    // one table-sized batch no matter the byte budget. While that
    // snapshot is draining (and only then — afterwards versions stay
    // the offset grain), split its manifest file list across bites:
    // admit files until the budget is crossed, carry the file cursor in
    // the offset, and resume exactly-once from it after a mid-snapshot
    // restart (manifests are immutable, so the file order is stable).
    // engages only under a byte budget (budget-less streams keep the
    // one-bite snapshot) or when resuming an in-flight file cursor
    // (the budget option may have been dropped across the restart)
    val vset = vs.toSet
    val midSnapshot = so.v == so.start && so.files >= 0
    requireSnapshotRetained(so, vset)
    val snapshotPhase =
      (maxBytesPerTrigger.isDefined || midSnapshot) &&
        vset.contains(so.start) && !vset.contains(so.start - 1) &&
        (so.v < so.start || midSnapshot)
    // bytes the snapshot's own files contribute to THIS bite (a
    // snapshot that completes under budget lets later versions ride in
    // the same batch, exactly like any other admitted version)
    var snapBytes = 0L
    if (snapshotPhase) {
      val files = snapshotFilesOf(so.start)
      val from = if (so.v < so.start) 0L else so.files
      maxBytesPerTrigger match {
        case None => // budget dropped across a restart: finish in one bite
          return VersionOffset(so.start, so.start)
        case Some(budget) =>
          val sizes = snapshotSizesOf(so.start)
          var i = from
          // the first pending file always rides (a single fat file is
          // admitted alone rather than wedging the stream)
          while (i < files.length && snapBytes < budget) {
            snapBytes += sizes(i.toInt)
            i += 1
          }
          if (i < files.length)
            return VersionOffset(so.start, so.start, i)
          if (snapBytes >= budget)
            return VersionOffset(so.start, so.start)
        // else: snapshot completed with budget to spare — fall through
        // and admit versions after it in the same batch
      }
    }
    // version cap first (bounded catch-up bites), then the byte budget
    // tightens it: admit versions until their NEW bytes cross the
    // budget — the crossing version is included, and the FIRST pending
    // version is always admitted (a single fat version rides alone,
    // never wedges the stream). Offsets stay version-grain, so
    // exactly-once replay is untouched.
    val vCap = maxVersionsPerTrigger match {
      case Some(m) => math.min(latest, so.v + m)
      case None    => latest
    }
    val walkFrom = if (snapshotPhase) so.start else so.v
    val end = maxBytesPerTrigger match {
      case None => vCap
      case Some(budget) =>
        var v = walkFrom
        var bytes = snapBytes
        while (v < vCap && bytes < budget) {
          v += 1
          // a vacuumed version in the walk contributes no bytes — the
          // admission must not die on a raw manifest-open error;
          // planInputPartitions raises the GUIDED replay-gap message
          // for the same range
          if (vset.contains(v)) bytes += newFileBytes(vset, v)
        }
        v
    }
    VersionOffset(math.max(end, walkFrom), so.start)
  }

  override def reportLatestOffset(): Offset =
    VersionOffset(SnapshotLog.versions(spark, dir).last)

  override def deserializeOffset(json: String): Offset =
    VersionOffset.parse(json)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[VersionOffset]
    val eo = end.asInstanceOf[VersionOffset]
    val (s, e) = (so.v, eo.v)
    if (Ordering[(Long, Long)].lteq(eo.pos, so.pos)) return Array.empty
    val vs = SnapshotLog.versions(spark, dir)
    val vset = vs.toSet // O(1) membership across the whole version range
    val newFiles = scala.collection.mutable
      .ArrayBuffer[(String, Map[String, String], Long)]()
    // The GENUINE initial snapshot (stream start with no retained
    // predecessor) plans as a slice of the start version's manifest:
    // the whole list in one batch without a byte budget, or the
    // [so.files, eo.files) file-cursor window of a budgeted bootstrap
    // bite (latestOffset's file-grain admission). Manifest order is
    // immutable, so the slice replays exactly-once across restarts.
    // checkpoint recovery replays a stored range through THIS method
    // without a latestOffset call first, so the vacuumed-mid-snapshot
    // guard must live here too — a mid-cursor offset whose snapshot
    // version is gone would otherwise fall through to the version loop
    // and silently skip the snapshot's un-emitted tail
    requireSnapshotRetained(so, vset)
    val genuineSnapshot = vset.contains(so.start) &&
      !vset.contains(so.start - 1)
    val slice: Option[(Int, Int)] =
      if (genuineSnapshot &&
          (so.v < so.start || (so.v == so.start && so.files >= 0)) &&
          eo.v >= so.start) {
        val total = snapshotFilesOf(so.start).length
        val from = if (so.v < so.start) 0 else so.files.toInt
        val until = if (eo.v == so.start && eo.files >= 0) eo.files.toInt
          else total
        Some((from, until))
      } else None
    slice.foreach { case (from, until) =>
      val v = so.start
      require(SnapshotLog.dvOf(spark, dir, v).isEmpty,
        s"version $v of $dir (the stream's initial snapshot) carries a " +
          "deletion vector — MoR positions cannot be applied by an " +
          "append-only stream; compact (optimize) first")
      val files = snapshotFilesOf(v)
      val parts = if (SnapshotLog.partitionColsOf(spark, dir, v).nonEmpty)
        SnapshotLog.filePartsOf(spark, dir, v)
      else Map.empty[String, Map[String, String]]
      newFiles ++= files.slice(from, until)
        .map(p => (p, parts.getOrElse(p, Map.empty[String, String]), v))
    }
    // RECORDED change files ([[SnapshotLog.ChangeFeedProperty]]): the
    // commit's exact row-level rows, `_change_type` materialized inside
    val recordedFiles = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val loopFrom = if (slice.isDefined) so.start + 1 else s + 1
    (loopFrom to e).foreach { v =>
      require(vset.contains(v),
        s"version $v of $dir is gone (vacuumed?) — the stream cannot " +
          s"replay it; restart from a retained version " +
          s"(have ${vs.mkString(",")})")
      // a recorded commit (rewrite verb under graft.changeFeed=true) is
      // described ONLY by its change files — never by its file diff,
      // whose added files mix COW survivors with real changes. The
      // stream's initial version reads its recorded changes too when
      // its predecessor is retained (span-start parity with the batch
      // changeFeed(fromV, toV) view); only a GENUINE initial snapshot
      // (no predecessor — handled by the slice above) is full state.
      val recorded =
        if (changeFeed && (v != so.start || vset.contains(v - 1)))
          SnapshotLog.changeFilesOf(spark, dir, v)
        else None
      if (recorded.isDefined) { recordedFiles ++= recorded.get.map(_ -> v) }
      else {
      val files = SnapshotLog.filesOf(spark, dir, v)
      val prev: Seq[String] =
        if (vset.contains(v - 1)) SnapshotLog.filesOf(spark, dir, v - 1)
        else if (v == so.start) Seq.empty // the stream's initial snapshot
        else throw new IllegalStateException(
          s"version ${v - 1} of $dir (the predecessor of streamed " +
            s"version $v) is gone (vacuumed?) — emitting v$v as a full " +
            "snapshot would re-emit every carried file; restart the " +
            "stream from a retained version")
      // membership via prebuilt hash sets — O(|prev| + |files|), never
      // the O(|prev|·|files|) rebuild-inside-the-lambda shape
      def norm(p: String): String = new Path(p).toUri.getPath
      val prevSet = prev.map(norm).toSet
      val curSet = files.map(norm).toSet
      val removed = prev.filterNot(p => curSet.contains(norm(p)))
      val cdfHint =
        if (changeFeed) "this commit predates the table's change feed " +
          s"(or ran without it) — set TBLPROPERTIES ('" +
          s"${SnapshotLog.ChangeFeedProperty}'='true') so rewrite verbs " +
          "record their changes, or restart past it"
        else "the streaming source is append-only (an emitted row " +
          "cannot be retracted); use SnapshotLog.changesBetween for " +
          "CDC semantics, or readChangeFeed with " +
          s"TBLPROPERTIES ('${SnapshotLog.ChangeFeedProperty}'='true')"
      require(removed.isEmpty,
        s"version $v of $dir removed/rewrote ${removed.size} file(s) — " +
          cdfHint)
      require(SnapshotLog.dvOf(spark, dir, v) ==
        (if (vset.contains(v - 1)) SnapshotLog.dvOf(spark, dir, v - 1)
         else None),
        s"version $v of $dir changed its deletion vector — MoR deletes " +
          s"retract emitted rows; $cdfHint")
      // partition tuples ride with the files (from the MANIFEST — never
      // re-parsed from paths on executors); readers fill the partition
      // columns as typed constants
      val parts = if (SnapshotLog.partitionColsOf(spark, dir, v).nonEmpty)
        SnapshotLog.filePartsOf(spark, dir, v)
      else Map.empty[String, Map[String, String]]
      newFiles ++= files.filterNot(p => prevSet.contains(norm(p)))
        .map(p => (p, parts.getOrElse(p, Map.empty[String, String]), v))
      }
    }
    // physical names for footer lookup, via the LATEST colmap: a name
    // this stream bound BEFORE a later rename is already the storage
    // name (identity fallback); a post-rename stream's new name maps —
    // both directions land on the immutable physical name
    val phys = SnapshotStreamSource.physicalFields(
      SnapshotLog.colmapOf(spark, dir, vs.last), schema)
    // CDF mode: plain data files are pure-append rows — the reader
    // fills `_change_type` ("insert"), `_commit_version` and
    // `_commit_timestamp` (commit-point micros) as typed constants via
    // the partition-tuple mechanism; recorded change files carry the
    // type column for real and version/timestamp as constants
    def cdfConsts(v: Long): Map[String, String] = Map(
      "_commit_version" -> v.toString,
      "_commit_timestamp" ->
        (SnapshotLog.commitTimeMillis(spark, dir, v) * 1000L).toString)
    (newFiles.map { case (p, t, v) =>
      val tuple =
        if (changeFeed) t ++ cdfConsts(v) + ("_change_type" -> "insert")
        else t
      SnapshotFilePartition(p, phys.json, tuple, None): InputPartition
    } ++ recordedFiles.map { case (p, v) =>
      SnapshotFilePartition(p, phys.json, cdfConsts(v), None)
        : InputPartition
    }).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotFileReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final case class SnapshotFilePartition(path: String,
    schemaJson: String,
    partTuple: Map[String, String],
    dvBitmap: Option[Array[Byte]]) extends InputPartition

private[sources] class SnapshotFileReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapshotFilePartition]
    new GroupFileReader(p.path,
      DataType.fromJson(p.schemaJson).asInstanceOf[StructType], p.partTuple,
      p.dvBitmap)
  }
}

/** Executor-side parquet reader: one file → InternalRows through the
  * PUBLIC parquet-hadoop Group API (no SparkSession on executors).
  * Column order follows the DECLARED schema; a column missing from the
  * file reads its PARTITION-tuple constant when the file's manifest
  * tuple carries one (hive layouts strip partition columns from the
  * data files), else null (pre-evolution data). Field indexes and
  * per-column decoders resolve ONCE per file from the projected
  * message type — the row loop does no name lookups. A deletion-vector
  * bitmap, when shipped, suppresses tombstoned row positions. */
private[sources] class GroupFileReader(path: String, schema: StructType,
    partTuple: Map[String, String] = Map.empty,
    dvBitmap: Option[Array[Byte]] = None)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

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
          // constant-fill only (the CDF _commit_timestamp): raw is
          // epoch MICROS, the InternalRow timestamp representation
          case TimestampType => java.lang.Long.parseLong(raw)
          case other => throw new IllegalStateException(
            s"undecodable partition type ${other.simpleString} for '$c'")
        })
    }
  }

  private val projected: org.apache.parquet.schema.MessageType = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val footer = org.apache.parquet.hadoop.ParquetFileReader
      .readFooter(conf, new Path(path),
        org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    val fileSchema = footer.getFileMetaData.getSchema
    val want = schema.fieldNames.toSet
    import scala.jdk.CollectionConverters._
    // parquet-level projection: request only the schema's fields that
    // exist in THIS file (typed from the file's own footer, so INT96 vs
    // INT64 timestamps always match) — unrequested column chunks are
    // never read. An all-partition/pre-evolution projection keeps one
    // anchor field purely to drive the row count.
    val fields = fileSchema.getFields.asScala.filter(f => want(f.getName))
    val anchor = if (fields.nonEmpty) fields
      else Seq(fileSchema.getFields.get(0))
    new org.apache.parquet.schema.MessageType(fileSchema.getName,
      anchor.asJava)
  }

  private val reader = {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projected.toString)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new Path(path))
      .withConf(conf)
      .build()
  }

  /** A decoder for one primitive value at (fi, 0) of a group, chosen
    * once from (spark type, parquet primitive). */
  private def primDecoder(dt: DataType,
      prim: PrimitiveTypeName, fi: Int): Group => Any = dt match {
    case LongType    => g => g.getLong(fi, 0)
    case IntegerType => g => g.getInteger(fi, 0)
    case ShortType   => g => g.getInteger(fi, 0).toShort
    case ByteType    => g => g.getInteger(fi, 0).toByte
    case DoubleType  => g => g.getDouble(fi, 0)
    case FloatType   => g => g.getFloat(fi, 0)
    case BooleanType => g => g.getBoolean(fi, 0)
    case StringType  => g => UTF8String.fromBytes(g.getBinary(fi, 0).getBytes)
    case DateType    => g => g.getInteger(fi, 0) // epoch days, as stored
    case dec: DecimalType => prim match {
      // parquet physical form tracks precision: INT32 (≤9), INT64
      // (≤18), fixed/variable binary beyond — decode whichever the
      // file carries into an unscaled value at the DECLARED scale
      case PrimitiveTypeName.INT32 =>
        g => Decimal(g.getInteger(fi, 0).toLong, dec.precision, dec.scale)
      case PrimitiveTypeName.INT64 =>
        g => Decimal(g.getLong(fi, 0), dec.precision, dec.scale)
      case _ =>
        g => Decimal(BigDecimal(
          BigInt(new java.math.BigInteger(g.getBinary(fi, 0).getBytes)),
          dec.scale), dec.precision, dec.scale)
    }
    case TimestampType | TimestampNTZType => prim match {
      // Spark writes INT96 by default (12 bytes: nanos-of-day LE ++
      // julian-day LE) and TIMESTAMP_MICROS when configured — decode
      // whichever the file carries
      case PrimitiveTypeName.INT96 => g => {
        val b = g.getInt96(fi, 0).getBytes
        val buf = java.nio.ByteBuffer.wrap(b)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanosOfDay = buf.getLong
        val julianDay = buf.getInt
        (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
      }
      case _ => g => g.getLong(fi, 0) // TIMESTAMP_MICROS
    }
    case other => throw new IllegalStateException(
      s"undecodable type ${other.simpleString}")
  }

  /** Per-schema-field decoders, resolved ONCE from the projected
    * message type (missing field → partition constant, the column's
    * frozen EXISTS_DEFAULT when one is declared — the same fill the
    * vectorized batch scan applies — else null). */
  private val decoders: Array[Group => Any] =
    schema.fields.map { f =>
      val fi = if (projected.containsField(f.name))
        projected.getFieldIndex(f.name) else -1
      if (fi < 0) {
        if (partConsts.contains(f.name)) {
          val c = partConsts(f.name); (_: Group) => c
        } else {
          // internal-format constant (UTF8String/Int days/Long micros),
          // resolved ONCE per file — null when no default is declared
          val d = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            .getExistenceDefaultValue(f)
          (_: Group) => d
        }
      } else f.dataType match {
        case ArrayType(et, _) =>
          // Spark's standard 3-level list: optional group (LIST) {
          //   repeated group list { optional <elem> element } };
          // legacy 2-level (repeated <prim> directly) also decodes
          val listGt = projected.getType(fi).asGroupType()
          val inner = listGt.getType(0)
          val threeLevel = !inner.isPrimitive
          val elemPrim =
            if (threeLevel)
              inner.asGroupType().getType(0).asPrimitiveType()
                .getPrimitiveTypeName
            else inner.asPrimitiveType().getPrimitiveTypeName
          val elemDec = primDecoder(et, elemPrim, 0)
          // both decoders resolve ONCE per file — the element loop is
          // allocation-free (the 2-level one takes the index at runtime)
          val legacyDec = if (threeLevel) null else primDecoderAt(et, elemPrim, 0)
          g => {
            if (g.getFieldRepetitionCount(fi) == 0) null
            else {
              val lg = g.getGroup(fi, 0)
              val n = lg.getFieldRepetitionCount(0)
              val arr = new Array[Any](n)
              var j = 0
              while (j < n) {
                arr(j) =
                  if (threeLevel) {
                    val eg = lg.getGroup(0, j)
                    if (eg.getFieldRepetitionCount(0) == 0) null
                    else elemDec(eg)
                  } else legacyDec(lg, j)
                j += 1
              }
              new GenericArrayData(arr)
            }
          }
        case dt =>
          val prim = projected.getType(fi).asPrimitiveType()
            .getPrimitiveTypeName
          val dec = primDecoder(dt, prim, fi)
          g => if (g.getFieldRepetitionCount(fi) == 0) null else dec(g)
      }
    }

  /** [[primDecoder]] with the repetition index as a RUNTIME argument
    * (legacy 2-level lists repeat the primitive directly) — resolved
    * once per file, so the element loop allocates nothing. */
  private def primDecoderAt(dt: DataType, prim: PrimitiveTypeName,
      fi: Int): (Group, Int) => Any = dt match {
    case LongType    => (g, idx) => g.getLong(fi, idx)
    case IntegerType => (g, idx) => g.getInteger(fi, idx)
    case DoubleType  => (g, idx) => g.getDouble(fi, idx)
    case FloatType   => (g, idx) => g.getFloat(fi, idx)
    case BooleanType => (g, idx) => g.getBoolean(fi, idx)
    case StringType  =>
      (g, idx) => UTF8String.fromBytes(g.getBinary(fi, idx).getBytes)
    case other => throw new IllegalStateException(
      s"undecodable legacy-list element ${other.simpleString}")
  }

  // tombstoned positions of THIS file (batch reads of DV-carrying
  // versions); row index advances per parquet record read
  private val dv: Option[org.roaringbitmap.longlong.Roaring64NavigableMap] =
    dvBitmap.map { bytes =>
      val bm = new org.roaringbitmap.longlong.Roaring64NavigableMap()
      bm.deserialize(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      bm
    }
  private var rowIdx: Long = -1L
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    rowIdx += 1
    while (current != null && dv.exists(_.contains(rowIdx))) {
      current = reader.read()
      rowIdx += 1
    }
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      vals(i) = decoders(i)(g)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = reader.close()
}
