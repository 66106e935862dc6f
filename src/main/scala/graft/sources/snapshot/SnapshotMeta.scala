package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}
/** Manifest/header plumbing, schema + column mapping, table properties, change-file plumbing, write plumbing, LogStore seam — carved from the SnapshotLog monolith (round 15 split;
  * pure moves, object facade unchanged). Self-typed to the
  * [[SnapshotLog]] singleton so every member keeps resolving
  * exactly as it did inside the single object. */
private[sources] trait SnapshotMeta { this: SnapshotLog.type =>


  /** Eagerly reclaim `data/<commitId>` after a LOST commit race: the
    * directory's files were written for an attempt that never
    * manifested, so nothing references them (the retry rewrites under a
    * fresh UUID). Best-effort — a failure here just leaves ordinary
    * grace-period-vacuum orphans, the lost-race contract. */
  private[sources] def dropOrphanedCommitDir(spark: SparkSession, dir: String,
      commitId: String): Unit =
    try {
      val p = new Path(dir, s"data/$commitId")
      val f = fs(spark, dir)
      if (f.exists(p)) { f.delete(p, true); () }
    } catch { case scala.util.control.NonFatal(_) => () }

  private[sources] def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[sources] def logDir(dir: String) = new Path(dir, "_log")

  private[sources] val V = """v(\d+)\.manifest""".r

  /** Committed versions, ascending (empty for a fresh/nonexistent table). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val ld = logDir(dir)
    if (!f.exists(ld)) Seq.empty
    else f.listStatus(ld).toSeq.flatMap(s => s.getPath.getName match {
      case V(n) => Some(n.toLong)
      case _    => None
    }).sorted
  }

  private[sources] def manifestPath(dir: String, v: Long) =
    new Path(logDir(dir), s"v$v.manifest")

  private[sources] def manifestLines(spark: SparkSession, dir: String,
      v: Long): Seq[String] = {
    val f = fs(spark, dir)
    val in = f.open(manifestPath(dir, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  private[sources] def filesOf(spark: SparkSession, dir: String, v: Long): Seq[String] =
    manifestLines(spark, dir, v).filterNot(_.startsWith("#"))

  /** The stream batch id a version was committed under, if any
    * (`#batch=<id>` header line — see [[commitBatch]]). */
  def batchOf(spark: SparkSession, dir: String, v: Long): Option[Long] =
    manifestLines(spark, dir, v)
      .collectFirst { case l if l.startsWith("#batch=") =>
        l.stripPrefix("#batch=").toLong }

  /** The replay high-water mark a non-batch commit carries forward
    * (`#lastbatch=` header) so retention can never blind the guard. */
  private[sources] def lastBatchHeaderOf(spark: SparkSession, dir: String,
      v: Long): Option[Long] =
    manifestLines(spark, dir, v)
      .collectFirst { case l if l.startsWith("#lastbatch=") =>
        l.stripPrefix("#lastbatch=").toLong }

  /** The `#lastbatch=` header for a verb's commit: the current
    * high-water mark, re-read inside the verb's retry loop. */
  private[sources] def watermarkHeader(spark: SparkSession,
      dir: String): Seq[String] =
    lastBatch(spark, dir).map(b => s"#lastbatch=$b").toSeq

  /** The newest batch id committed ANYWHERE in the retained log — the
    * MAX over every retained version's `#batch=` (the ingesting commit)
    * and `#lastbatch=` (the high-water mark every non-batch verb carries
    * forward) headers. The replay guard must use this, not
    * `batchOf(latest)`: a non-batch commit (deleteWhere, optimize, plain
    * commit) landing between a batch commit and its at-least-once replay
    * would otherwise blind the guard and the replayed batch's rows would
    * be committed twice — and without the carried watermark, a vacuum
    * that drops every `#batch=`-bearing version after a rewrite would do
    * the same (ReplayGuardSpec pins it). Max, not newest-first: a
    * RESTORE re-publishes an OLD `#batch=` header, and the mark must
    * never move backwards. Cost: one tiny manifest read per retained
    * version, the `history()` class. */
  def lastBatch(spark: SparkSession, dir: String): Option[Long] = {
    val vs = versions(spark, dir)
    val ids = vs.flatMap(v => batchOf(spark, dir, v).toSeq ++
      lastBatchHeaderOf(spark, dir, v).toSeq)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** The table schema as of a version, if the manifest recorded one
    * (`#schema=` header; logs written before schema tracking have none). */
  def schemaOf(spark: SparkSession, dir: String, v: Long): Option[StructType] =
    manifestLines(spark, dir, v)
      .collectFirst { case l if l.startsWith("#schema=") =>
        org.apache.spark.sql.types.DataType
          .fromJson(l.stripPrefix("#schema=")).asInstanceOf[StructType] }

  private[sources] def schemaHeader(s: StructType): String = s"#schema=${s.json}"

  // -------------------------------------------------------------------
  // COLUMN MAPPING — metadata-only RENAME/DROP COLUMN (round 12)
  // -------------------------------------------------------------------
  // The `#schema=` header names columns LOGICALLY (what readers see);
  // parquet files store PHYSICAL names, immutable once a column first
  // materializes. `#colmap=` records every logical→physical pair that
  // differs (RENAME keeps the physical name, so old files need no
  // rewrite), and `#dropped=` records BURNED physical names (a DROP
  // hides the column; its bytes stay in old files, so the name can
  // never be re-used — the Delta column-mapping discipline, with loud
  // refusal where Delta mints fresh ids). Both headers are carried
  // forward by EVERY commit ([[commitFiles]] auto-carries them when the
  // verb's own header doesn't set them), versioned like the schema so
  // time travel across chained renames reads each version under its own
  // names. Names are stat-escaped (the `#filestat=` recipe), pairs
  // tab-separated.

  /** Version `v`'s logical→physical column mapping (empty = identity). */
  def colmapOf(spark: SparkSession, dir: String,
      v: Long): Map[String, String] =
    manifestLines(spark, dir, v)
      .collectFirst { case l if l.startsWith("#colmap=") =>
        val body = l.stripPrefix("#colmap=")
        if (body.isEmpty) Map.empty[String, String]
        else body.split("\t").map { pair =>
          val i = pair.indexOf(':')
          statUnesc(pair.take(i)) -> statUnesc(pair.drop(i + 1))
        }.toMap
      }.getOrElse(Map.empty)

  /** Version `v`'s burned physical names (dropped columns' storage
    * names — reserved forever, see [[dropColumn]]). */
  def droppedOf(spark: SparkSession, dir: String, v: Long): Set[String] =
    manifestLines(spark, dir, v)
      .collectFirst { case l if l.startsWith("#dropped=") =>
        val body = l.stripPrefix("#dropped=")
        if (body.isEmpty) Set.empty[String]
        else body.split("\t").map(statUnesc).toSet
      }.getOrElse(Set.empty)

  /** The two mapping headers — ALWAYS emitted together (an explicitly
    * empty header suppresses [[commitFiles]]' auto-carry, which
    * [[restore]] needs to roll a mapping back). */
  private[sources] def colmapHeaders(cm: Map[String, String],
      dropped: Set[String]): Seq[String] = Seq(
    "#colmap=" + cm.toSeq.sortBy(_._1)
      .map { case (l, p) => s"${statEsc(l)}:${statEsc(p)}" }
      .mkString("\t"),
    "#dropped=" + dropped.toSeq.sorted.map(statEsc).mkString("\t"))

  // -------------------------------------------------------------------
  // TABLE PROPERTIES — versioned key/value metadata (round 12)
  // -------------------------------------------------------------------
  // `#tblprop=` records the table's properties (stat-escaped k:v tab
  // pairs, the #colmap encoding), auto-carried by every commit at the
  // [[commitFiles]] choke point and rolled back by [[restore]] with the
  // rest of the state. The one property the engine itself reads is
  // [[ChangeFeedProperty]].

  /** The property that turns on the RECORDED change feed: when
    * `graft.changeFeed=true`, every row-rewriting verb writes its exact
    * row-level changes (`_change_type` ∈ insert | delete |
    * update_preimage | update_postimage) as parquet change files under
    * `changes/<uuid>/`, registered in the commit's manifest — the Delta
    * CDF design: writers pay the (opt-in) write amplification so
    * readers get exact, survivor-cancelled changes at file grain with
    * no diffing. `readStream.option("readChangeFeed", "true")` then
    * streams them (appends derive their inserts at file grain for
    * free). */
  val ChangeFeedProperty = "graft.changeFeed"

  /** Version `v`'s table properties (empty when none were ever set). */
  def tablePropertiesOf(spark: SparkSession, dir: String,
      v: Long): Map[String, String] =
    manifestLines(spark, dir, v)
      .collectFirst { case l if l.startsWith("#tblprop=") =>
        val body = l.stripPrefix("#tblprop=")
        if (body.isEmpty) Map.empty[String, String]
        else body.split("\t").map { pair =>
          val i = pair.indexOf(':')
          statUnesc(pair.take(i)) -> statUnesc(pair.drop(i + 1))
        }.toMap
      }.getOrElse(Map.empty)

  private[sources] def tblpropHeader(props: Map[String, String]): String =
    "#tblprop=" + props.toSeq.sortBy(_._1)
      .map { case (k, value) => s"${statEsc(k)}:${statEsc(value)}" }
      .mkString("\t")

  /** `ALTER TABLE ... SET TBLPROPERTIES (...)` / `UNSET TBLPROPERTIES`
    * as ONE metadata-only commit (set wins over unset on the same key;
    * unset of an absent key is a no-op, the SQL contract). Everything
    * else the manifest tracks carries forward verbatim. */
  def setTableProperties(spark: SparkSession, dir: String,
      set: Map[String, String], unset: Seq[String] = Seq.empty): Long = {
    require(set.nonEmpty || unset.nonEmpty,
      "setTableProperties needs at least one change")
    (set.keys ++ set.values ++ unset).foreach(s =>
      require(!s.contains('\n') && !s.contains('\t'),
        s"property part '$s' cannot carry a tab or newline"))
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      // fail at ENABLE time when a user column collides with the feed's
      // marker names — not on the first rewrite that records changes
      if (set.get(ChangeFeedProperty).exists(_.equalsIgnoreCase("true")))
        requireCdfNamesFree(spark, dir, latest)
      val props = tablePropertiesOf(spark, dir, latest) -- unset ++ set
      val carried = manifestLines(spark, dir, latest).filter(l =>
        l.startsWith("#schema=") || l.startsWith("#filestat=") ||
          l.startsWith("#dv=") || l.startsWith("#check=") ||
          l.startsWith("#partition=") || l.startsWith("#filepart="))
      commitFiles(spark, dir, filesOf(spark, dir, latest),
        java.util.UUID.randomUUID().toString,
        header = Seq(tblpropHeader(props)) ++ carried ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => () // raced — recompute against the new latest
      }
    }
    -1L // unreachable
  }

  /** Column names the recorded change feed owns in change files, merge
    * frames, and feed OUTPUT. A user column under one of these names
    * would be silently OVERWRITTEN — `_change_type`/`__del` by the
    * recording verbs (corrupting every recorded commit),
    * `_commit_version` by [[changeFeed]]'s shape() and the CDF stream's
    * constant-fill, `_poll_version` by the poll TVF — so every
    * change-recording verb refuses through the central [[cdfEnabled]]
    * check, matching the upstream change-feed convention of reserving
    * the marker names outright. */
  private[sources] val CdfReservedNames =
    Seq("_change_type", "__del", "_commit_version", "_commit_timestamp",
      "_poll_version")

  private[sources] def requireCdfNamesFree(spark: SparkSession, dir: String,
      v: Long): Unit = {
    val clash = schemaOf(spark, dir, v)
      .map(_.fieldNames.toSeq.filter(CdfReservedNames.contains))
      .getOrElse(Seq.empty)
    require(clash.isEmpty,
      s"$dir: the recorded change feed reserves column name(s) " +
        s"${clash.mkString(", ")} — rename the column(s) or keep " +
        s"$ChangeFeedProperty off")
  }

  /** Is the recorded change feed on for the table as of version `v`?
    * When it is, the reserved marker names must be free — checked HERE
    * (the one gate every recording verb passes) so deleteWhere /
    * updateWhere / replaceWhere / overwritePartitions / tombstoneWhere
    * refuse exactly like merge instead of silently overwriting the
    * user's column in their recorded change rows. The creation paths
    * (enabling the feed, ADD/RENAME COLUMN) refuse up front, so this
    * fires only for clashes smuggled past them (a full-replace commit
    * with a clashing schema). Zero-change verbs (optimize /
    * applyDeletionVectors / materialize) pass `requireNamesFree =
    * false`: they record an EMPTY change set and write no marker
    * column, so a clash must not block table maintenance. */
  private[sources] def cdfEnabled(spark: SparkSession, dir: String,
      v: Long, requireNamesFree: Boolean = true): Boolean = {
    val on = tablePropertiesOf(spark, dir, v)
      .get(ChangeFeedProperty).exists(_.equalsIgnoreCase("true"))
    if (on && requireNamesFree) requireCdfNamesFree(spark, dir, v)
    on
  }

  /** Version `v`'s RECORDED change files: `Some(paths)` iff the commit
    * declared its row-level changes (`#cdf=1` — possibly zero files for
    * a net-zero rewrite like [[optimize]]); `None` for ordinary commits
    * (pure appends derive their inserts at file grain; anything else is
    * not CDF-readable). */
  def changeFilesOf(spark: SparkSession, dir: String,
      v: Long): Option[Seq[String]] = {
    val lines = manifestLines(spark, dir, v)
    if (!lines.contains("#cdf=1")) None
    else Some(lines.filter(_.startsWith("#changefile="))
      .map(_.stripPrefix("#changefile=")))
  }

  private[sources] def cdfHeaders(changeFiles: Seq[String]): Seq[String] =
    "#cdf=1" +: changeFiles.map(p => s"#changefile=$p")

  /** Write `df` (table columns + `_change_type`) as this commit's
    * change files under `changes/<changeId>/` — physical column names
    * like every data file (rename-immune), plain layout (change files
    * are read whole, never pruned). */
  private[sources] def writeChangeFiles(spark: SparkSession, dir: String,
      df: DataFrame, changeId: String): Seq[String] = {
    val f = fs(spark, dir)
    val cdir = new Path(dir, s"changes/$changeId")
    toPhysical(spark, dir, df).write.parquet(cdir.toString)
    f.listStatus(cdir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString).sorted
  }

  private[sources] def dropOrphanedChangeDir(spark: SparkSession, dir: String,
      changeId: String): Unit =
    try {
      val p = new Path(dir, s"changes/$changeId")
      val f = fs(spark, dir)
      if (f.exists(p)) { f.delete(p, true); () }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Read freshly written (not yet committed) data files back under
    * `outSchema`'s LOGICAL names — what [[replaceWhere]] records as its
    * insert change rows without re-evaluating the incoming plan.
    * Hive-partitioned files re-attach their partition values via
    * basePath; physical→logical renaming mirrors [[scanWithMeta]]. */
  private[sources] def readBackWritten(spark: SparkSession, dir: String,
      latest: Long, paths: Seq[String], pcs: Seq[String],
      outSchema: StructType): DataFrame = {
    val cm = colmapOf(spark, dir, latest)
    val phys = physicalSchema(cm, outSchema)
    val raw =
      if (pcs.isEmpty) spark.read.schema(phys).parquet(paths: _*)
      else paths.groupBy(commitRootOf).toSeq.sortBy(_._1)
        .map { case (root, ps) =>
          spark.read.schema(phys).option("basePath", root).parquet(ps: _*)
        }.reduce(_.unionByName(_))
    if (cm.isEmpty) raw
    else raw.select(outSchema.fields.toSeq.map(f =>
      col(s"`${cm.getOrElse(f.name, f.name)}`").as(f.name)): _*)
  }

  /** `schema` with every field under its PHYSICAL name — what the
    * parquet layer sees on both the read and the write path. */
  private[sources] def physicalSchema(cm: Map[String, String],
      schema: StructType): StructType =
    if (cm.isEmpty) schema
    else StructType(schema.fields.map(f =>
      f.copy(name = cm.getOrElse(f.name, f.name))))

  /** Rename `df`'s columns logical→physical for a write into `dir`,
    * refusing (loudly) any NEW column whose name is already a physical
    * name another column owns or a burned dropped name — re-using it
    * would make old files' bytes resurrect under the new column. */
  private[sources] def toPhysical(spark: SparkSession, dir: String,
      df: DataFrame): DataFrame = {
    val vOpt = versions(spark, dir).lastOption
    val cm = vOpt.map(colmapOf(spark, dir, _))
      .getOrElse(Map.empty[String, String])
    val burned = vOpt.map(droppedOf(spark, dir, _))
      .getOrElse(Set.empty[String])
    if (cm.isEmpty && burned.isEmpty) df
    else {
      val owned = cm.values.toSet
      df.columns.foreach { c =>
        if (!cm.contains(c))
          require(!owned.contains(c) && !burned.contains(c),
            s"column name '$c' is reserved by an earlier RENAME/DROP " +
              s"COLUMN on $dir (it is a physical storage name old files " +
              "still carry); pick a different name")
      }
      df.select(df.columns.toSeq.map(c =>
        col(s"`$c`").as(cm.getOrElse(c, c))): _*)
    }
  }

  /** [[toPhysical]] for a write SCHEMA (the executor-side v2 streaming
    * write maps before encoding): renames apply, reserved-name re-use
    * refuses loudly. Identity (and validation-free) on unmapped
    * tables. */
  private[sources] def physicalWriteSchema(spark: SparkSession,
      dir: String, schema: StructType): StructType = {
    val vOpt = versions(spark, dir).lastOption
    val cm = vOpt.map(colmapOf(spark, dir, _))
      .getOrElse(Map.empty[String, String])
    val burned = vOpt.map(droppedOf(spark, dir, _))
      .getOrElse(Set.empty[String])
    if (cm.isEmpty && burned.isEmpty) schema
    else {
      val owned = cm.values.toSet
      schema.fieldNames.foreach { c =>
        if (!cm.contains(c))
          require(!owned.contains(c) && !burned.contains(c),
            s"column name '$c' is reserved by an earlier RENAME/DROP " +
              s"COLUMN on $dir (it is a physical storage name old files " +
              "still carry); pick a different name")
      }
      physicalSchema(cm, schema)
    }
  }

  /** Remap RAW (physical-keyed) per-file stats to version `v`'s LOGICAL
    * names: renamed columns' stats follow the rename, burned columns'
    * stats drop (a stale stat attributed to a re-used name would prune
    * WRONGLY — though re-use is refused anyway), untouched names pass
    * through. */
  private[sources] def logicalStats(cm: Map[String, String], dropped: Set[String],
      raw: Map[String, Map[String, ColStat]])
      : Map[String, Map[String, ColStat]] =
    if (cm.isEmpty && dropped.isEmpty) raw
    else {
      val inv = cm.map(_.swap) // physical → logical (injective: owners are unique)
      raw.map { case (p, st) =>
        p -> st.flatMap { case (c, s) =>
          inv.get(c) match {
            case Some(l)                      => Some(l -> s)
            case None if dropped.contains(c)  => None
            case None                         => Some(c -> s)
          }
        }
      }
    }

  /** [[fileStatsOf]] under version `v`'s LOGICAL column names — what
    * every pruning consumer keys by. */
  private[graft] def fileStatsLogicalOf(spark: SparkSession, dir: String,
      v: Long): Map[String, Map[String, ColStat]] =
    logicalStats(colmapOf(spark, dir, v), droppedOf(spark, dir, v),
      fileStatsOf(spark, dir, v))

  /** Widen `prev` with any columns `next` adds. Existing columns must
    * keep their type (a silent type change would corrupt every older
    * file's read); added columns are nullable — older files lack them
    * and read as typed nulls. */
  /** Same type up to NESTED nullability (array containsNull) — an
    * `array<float>` built by `array(...)` (containsNull=false) must
    * insert into a declared `array<float>` column (containsNull=true)
    * and vice versa; element nullability widens, it never "changes the
    * type". */
  private[sources] def sameTypeIgnoreNull(a: DataType, b: DataType): Boolean =
    (a, b) match {
      case (ArrayType(ae, _), ArrayType(be, _)) =>
        sameTypeIgnoreNull(ae, be)
      case _ => a == b
    }

  /** The union type: `a` with nested nullability widened by `b`'s. */
  private[sources] def widenNulls(a: DataType, b: DataType): DataType =
    (a, b) match {
      case (ArrayType(ae, an), ArrayType(be, bn)) =>
        ArrayType(widenNulls(ae, be), an || bn)
      case _ => a
    }

  private[sources] def mergeSchemas(prev: StructType, next: StructType): StructType = {
    val byName = next.fields.map(f => f.name -> f).toMap
    val kept = prev.fields.map { pf =>
      byName.get(pf.name) match {
        case Some(nf) =>
          require(sameTypeIgnoreNull(nf.dataType, pf.dataType),
            s"schema evolution cannot change column '${pf.name}' from " +
              s"${pf.dataType.simpleString} to ${nf.dataType.simpleString}")
          pf.copy(dataType = widenNulls(pf.dataType, nf.dataType))
        case None => pf
      }
    }
    val added = next.fields.filterNot(f => prev.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(kept ++ added)
  }

  /** Write `df` into a fresh immutable commit directory; returns the
    * new part-file paths (not yet visible — nothing references them
    * until a manifest names them). With `partitionCols` the write is
    * hive-layout partitioned (`data/<uuid>/c=v/part-*.parquet`) and
    * every returned file is PARTITION-PURE — one tuple per file, the
    * invariant [[readPartition]]'s manifest-level prune relies on. */
  private[sources] def writeData(spark: SparkSession, dir: String, df0: DataFrame,
      commitId: String,
      partitionCols: Seq[String] = Seq.empty): Seq[String] = {
    val f = fs(spark, dir)
    val dataDir = new Path(dir, s"data/$commitId")
    // files always store PHYSICAL names (no-op on never-renamed tables);
    // partition columns are un-renameable, so the hive layout below
    // stays literal — and a NEW layout may only be declared on
    // storage-named columns (a renamed column's dir names would
    // diverge from the tuples every manifest consumer parses)
    val df = toPhysical(spark, dir, df0)
    if (partitionCols.nonEmpty) {
      val cmP = versions(spark, dir).lastOption
        .map(colmapOf(spark, dir, _)).getOrElse(Map.empty[String, String])
      partitionCols.foreach(c => require(!cmP.contains(c),
        s"partition column '$c' is a RENAMED column on $dir — declare " +
          "partition layouts on storage-named columns only"))
    }
    if (partitionCols.isEmpty) {
      df.write.parquet(dataDir.toString)
      f.listStatus(dataDir).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString).sorted
    } else {
      df.write.partitionBy(partitionCols: _*).parquet(dataDir.toString)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val it = f.listFiles(dataDir, true) // recursive: partition subdirs
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.startsWith("part-"))
          out += s.getPath.toString
      }
      out.toSeq.sorted
    }
  }

  /** The pluggable commit-primitive seam ([[LogStore]]): claim
    * create-exclusive, manifest publish, cursor overwrite. Default =
    * Hadoop FS semantics with a loud refusal on object-store schemes
    * whose rename is not atomic; swap in a conditional-PUT
    * implementation for S3-class stores BEFORE the first commit. */
  @volatile private[sources] var store: LogStore = HadoopFsLogStore
  def setLogStore(ls: LogStore): Unit = { store = ls }
  def logStore: LogStore = store
}
