package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** A minimal multi-version table format: atomic snapshot commits with
  * file-level time travel, no metastore, no dependencies — the property
  * Maintenance's stage-then-swap gives a SINGLE generation, extended to
  * a retained history (the Iceberg/Delta essence in one file).
  *
  * Layout under the table root:
  * {{{
  *   data/<commit-uuid>/part-*.parquet   immutable once committed
  *   _log/v<N>.manifest                  one line per data file (absolute)
  * }}}
  *
  * Manifests may carry `#key=value` header lines before the file list:
  *  - `#batch=<id>`   the stream batch a version was committed under
  *                    ([[commitBatch]] replay idempotence);
  *  - `#schema=<json>` the table schema AS OF that version (Spark
  *    StructType json, single line). Readers plan with this schema, so a
  *    version committed after a column add reads its OLDER files with
  *    typed nulls in the new column — schema evolution is a property of
  *    the format, not of parquet merge luck. Manifests without the
  *    header (pre-schema logs) read schema-inferred as before.
  *
  * The COMMIT POINT is the manifest rename: data files are written first
  * (invisible — readers only open files a manifest names), the manifest
  * is staged as a dot-file and renamed into place. Version ownership is
  * decided BEFORE that rename by an atomic create-exclusive CLAIM file
  * (POSIX O_EXCL via NIO locally, namenode-enforced exclusive create on
  * HDFS), so two committers racing for v<N> cannot both win — the loser
  * waits for the winner's manifest and retries at v<N+1>, never
  * clobbering (SnapshotLogSpec races real concurrent committers). A
  * crash before the rename leaves only unreferenced data files (and a
  * claim that goes stale and is adopted); readers are unaffected and
  * [[vacuum]] reclaims the orphans. Both primitives (and the cursor
  * overwrite) run through the pluggable [[LogStore]] seam — default
  * Hadoop FS semantics, with a loud refusal on object-store schemes
  * whose rename is copy+delete ([[HadoopFsLogStore]]); S3-class stores
  * plug a conditional-PUT implementation via [[setLogStore]].
  *
  * Commits whose body DEPENDS on the previous version ([[commitBatch]]
  * append, [[deleteWhere]], [[optimize]]) are optimistic-concurrency
  * transactions: the claim protocol additionally verifies, while holding
  * the claim, that the latest version is still the one the body was
  * computed against; if another commit slipped in, the attempt aborts
  * and the caller REBASES (re-reads the new latest, recomputes its file
  * list) and retries — the Delta/Iceberg conflict-retry loop. Without
  * this, a concurrent append vs delete would silently drop the other
  * committer's files (lost update).
  *
  * Why manifests and not directory listing at 100 TB: a snapshot read
  * plans from ONE small file instead of a recursive listing over
  * millions of objects; concurrent writers never make a reader see a
  * half-written table (no `_temporary` races, no partial-directory
  * reads); and retention is an explicit, crash-safe operation instead
  * of "hope nobody reads while we delete".
  */
object SnapshotLog extends org.apache.spark.internal.Logging {

  /** Eagerly reclaim `data/<commitId>` after a LOST commit race: the
    * directory's files were written for an attempt that never
    * manifested, so nothing references them (the retry rewrites under a
    * fresh UUID). Best-effort — a failure here just leaves ordinary
    * grace-period-vacuum orphans, the lost-race contract. */
  private def dropOrphanedCommitDir(spark: SparkSession, dir: String,
      commitId: String): Unit =
    try {
      val p = new Path(dir, s"data/$commitId")
      val f = fs(spark, dir)
      if (f.exists(p)) { f.delete(p, true); () }
    } catch { case scala.util.control.NonFatal(_) => () }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(dir: String) = new Path(dir, "_log")

  private val V = """v(\d+)\.manifest""".r

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

  private def manifestPath(dir: String, v: Long) =
    new Path(logDir(dir), s"v$v.manifest")

  private def manifestLines(spark: SparkSession, dir: String,
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
  private def lastBatchHeaderOf(spark: SparkSession, dir: String,
      v: Long): Option[Long] =
    manifestLines(spark, dir, v)
      .collectFirst { case l if l.startsWith("#lastbatch=") =>
        l.stripPrefix("#lastbatch=").toLong }

  /** The `#lastbatch=` header for a verb's commit: the current
    * high-water mark, re-read inside the verb's retry loop. */
  private def watermarkHeader(spark: SparkSession,
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

  private def schemaHeader(s: StructType): String = s"#schema=${s.json}"

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
  private def colmapHeaders(cm: Map[String, String],
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

  private def tblpropHeader(props: Map[String, String]): String =
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

  private def requireCdfNamesFree(spark: SparkSession, dir: String,
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
  private def cdfEnabled(spark: SparkSession, dir: String,
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

  private def cdfHeaders(changeFiles: Seq[String]): Seq[String] =
    "#cdf=1" +: changeFiles.map(p => s"#changefile=$p")

  /** Write `df` (table columns + `_change_type`) as this commit's
    * change files under `changes/<changeId>/` — physical column names
    * like every data file (rename-immune), plain layout (change files
    * are read whole, never pruned). */
  private def writeChangeFiles(spark: SparkSession, dir: String,
      df: DataFrame, changeId: String): Seq[String] = {
    val f = fs(spark, dir)
    val cdir = new Path(dir, s"changes/$changeId")
    toPhysical(spark, dir, df).write.parquet(cdir.toString)
    f.listStatus(cdir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString).sorted
  }

  private def dropOrphanedChangeDir(spark: SparkSession, dir: String,
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
  private def readBackWritten(spark: SparkSession, dir: String,
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
  private def physicalSchema(cm: Map[String, String],
      schema: StructType): StructType =
    if (cm.isEmpty) schema
    else StructType(schema.fields.map(f =>
      f.copy(name = cm.getOrElse(f.name, f.name))))

  /** Rename `df`'s columns logical→physical for a write into `dir`,
    * refusing (loudly) any NEW column whose name is already a physical
    * name another column owns or a burned dropped name — re-using it
    * would make old files' bytes resurrect under the new column. */
  private def toPhysical(spark: SparkSession, dir: String,
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
  private def logicalStats(cm: Map[String, String], dropped: Set[String],
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
  private def sameTypeIgnoreNull(a: DataType, b: DataType): Boolean =
    (a, b) match {
      case (ArrayType(ae, _), ArrayType(be, _)) =>
        sameTypeIgnoreNull(ae, be)
      case _ => a == b
    }

  /** The union type: `a` with nested nullability widened by `b`'s. */
  private def widenNulls(a: DataType, b: DataType): DataType =
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
  private def writeData(spark: SparkSession, dir: String, df0: DataFrame,
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
  @volatile private var store: LogStore = HadoopFsLogStore
  def setLogStore(ls: LogStore): Unit = { store = ls }
  def logStore: LogStore = store

  /** Claim the next version for an explicit file list; returns the
    * version won, or None when `base` is given and the latest version is
    * no longer `base` (the body is stale — the caller must rebase and
    * retry). Protocol per attempt: (1) atomically create the version's
    * CLAIM file — exactly one committer can; (2) the winner verifies the
    * base (see below), stages the manifest and renames it into place
    * (uncontended — only the claim holder writes that name), then drops
    * its claim; (3) a loser waits briefly for the winner's manifest to
    * appear and retries at the next version. A claim whose manifest
    * never appears (claimant crashed mid-commit) is adopted after 60 s
    * of staleness — the adopter deletes it and re-runs the atomic claim,
    * which again has exactly one winner.
    *
    * Base verification: holding the claim for v excludes every other
    * protocol commit at v, and versions are claimed densely (last+1), so
    * re-listing the log WHILE holding the claim gives a stable answer —
    * if the latest differs from `base`, another commit landed after the
    * caller computed its body; abort without manifesting (the claim is
    * dropped, the slot re-claimable) so the caller can rebase. This is
    * the compare-and-swap that makes read-modify-write commits
    * (commitBatch/deleteWhere/optimize) lose-nothing under concurrency. */
  private def commitFiles(spark: SparkSession, dir: String,
      files: Seq[String], commitId: String,
      header: Seq[String] = Seq.empty,
      base: Option[Option[Long]] = None): Option[Long] = {
    val f = fs(spark, dir)
    f.mkdirs(logDir(dir))
    // COLUMN-MAPPING CARRY: rename/drop state is table metadata every
    // commit must keep alive, and this is the one choke point every
    // verb goes through — auto-carry the latest version's #colmap= /
    // #dropped= headers unless the caller set its own (renameColumn /
    // dropColumn / restore do; an explicitly EMPTY header is how
    // restore suppresses the carry). For base-checked verbs a raced
    // carry is impossible (base mismatch aborts before manifesting).
    // ONE listing + ONE read of the previous manifest serves both
    // carries — this is the hot commit path, and each call is an
    // object-store round trip
    val metaCarry: Seq[String] = {
      val hasMap = header.exists(l => l.startsWith("#colmap=") ||
        l.startsWith("#dropped="))
      val hasProp = header.exists(_.startsWith("#tblprop="))
      if (hasMap && hasProp) Seq.empty
      else versions(spark, dir).lastOption.toSeq.flatMap { prev =>
        manifestLines(spark, dir, prev).filter(l =>
          (!hasMap && (l.startsWith("#colmap=") ||
            l.startsWith("#dropped="))) ||
            (!hasProp && l.startsWith("#tblprop=")))
      }
    }
    val body = (header ++ metaCarry ++ files)
      .mkString("\n").getBytes("UTF-8")
    var attempt = 0
    while (attempt < 1000) {
      attempt += 1
      val v = versions(spark, dir).lastOption.getOrElse(0L) + 1
      val claim = new Path(logDir(dir), s".claim.v$v")
      if (store.claimExclusive(f, claim)) {
        // the claim can be WON STALE: the true owner manifested v and
        // dropped its claim before our (older) version listing caught
        // up, and we just re-created the claim file. The owner's
        // manifest rename strictly precedes its claim delete, so the
        // manifest is visible by now — check and step aside.
        if (f.exists(manifestPath(dir, v))) f.delete(claim, false)
        else {
          base.foreach { expected =>
            val latestNow = versions(spark, dir).lastOption
            if (latestNow != expected) { f.delete(claim, false); return None }
          }
          val stage = new Path(logDir(dir), s".v$v.$commitId.staging")
          // publish failure must not strand the claim: the version slot
          // stays immediately re-claimable instead of waiting out the
          // 60 s stale-claim adoption
          try store.publishAtomic(f, stage, manifestPath(dir, v), body)
          catch { case e: Throwable => f.delete(claim, false); throw e }
          f.delete(claim, false) // manifest is live; claim no longer needed
          propagateBlooms(spark, dir, v, files)
          return Some(v)
        }
      }
      // v is claimed: wait for its manifest, or adopt a stale claim
      if (!f.exists(manifestPath(dir, v))) {
        val age = try System.currentTimeMillis() -
          f.getFileStatus(claim).getModificationTime
        catch { case _: java.io.IOException => Long.MaxValue } // claim gone
        if (age > 60000L) f.delete(claim, false) // abandoned — retake v
        else Thread.sleep(20)
      }
    }
    throw new IllegalStateException(s"snapshot commit livelock under $dir")
  }

  /** Carry the previous version's bloom sidecar forward for files the
    * new version SHARES with it: data files are immutable (uuid-named,
    * written once), so a carried file's bloom stays exactly valid —
    * without this, ANY commit (one appended batch, one MoR tombstone)
    * invalidated the whole table's point-lookup skipping until the next
    * full [[analyzeBlooms]] scan. New/rewritten files simply have no
    * entry (kept conservatively by [[readPoint]]/[[readFilter]]); the
    * file-identity argument makes this correct even when the committed
    * version was rebased past v−1. Best-effort by design: the sidecar
    * is advisory (reads stay exact without it), so a failure here must
    * never fail the already-visible commit. Runs AFTER the manifest
    * rename — a reader racing the write sees no sidecar and plans
    * conservatively. Vacuum reclaims per-version sidecars as before. */
  private def propagateBlooms(spark: SparkSession, dir: String, v: Long,
      files: Seq[String]): Unit = {
    if (v <= 1 || files.isEmpty) return
    try {
      val f = fs(spark, dir)
      val prev = bloomPath(dir, v - 1)
      if (!f.exists(prev) || f.exists(bloomPath(dir, v))) return
      val sidecar = spark.read.parquet(prev.toString)
      val keep = files.map(p => new Path(p).toUri.getPath).toSet
      // distinct sidecar paths are bounded by the table's file count
      val carried = sidecar.select("path").distinct().collect()
        .map(_.getString(0))
        .filter(p => keep.contains(new Path(p).toUri.getPath))
      if (carried.nonEmpty)
        sidecar.filter(col("path").isin(carried.toSeq: _*))
          .coalesce(1).write.mode("overwrite")
          .parquet(bloomPath(dir, v).toString)
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Commit `df` as the next version; returns the version number.
    * Data lands in a fresh uuid directory first; the manifest rename is
    * the only visible transition. Replace semantics — the body does not
    * depend on the previous version, so no base check is needed (two
    * racing replaces serialize into two versions, either order valid).
    * A full replace RE-DECIDES the physical layout: committing plain
    * over a partition-declared table writes unpartitioned and drops the
    * declaration for the new version (use [[commitPartitioned]] to keep
    * it); older versions read with their own layout unaffected. */
  def commit(spark: SparkSession, dir: String, df: DataFrame): Long = {
    val commitId = java.util.UUID.randomUUID().toString
    var files: Seq[String] = null
    var validated: Option[Seq[(String, String)]] = None
    while (true) {
      // replace semantics for the DATA (the body never depends on the
      // previous file list) — but constraints are table METADATA this
      // commit carries forward, so the commit is base-checked: a
      // concurrent addCheck must not be silently dropped from the new
      // latest (a metadata lost-update). Validation re-runs only when a
      // rebase actually changed the check set.
      val latest = versions(spark, dir).lastOption
      val checks = latest.map(checksOf(spark, dir, _)).getOrElse(Seq.empty)
      if (files == null) {
        // first attempt: validation rides the write (zero extra passes)
        val (wired, assertChecks) =
          observedChecks(df, checks, commitId, s"commit into $dir")
        files = writeData(spark, dir, wired, commitId)
        assertChecks()
        validated = Some(checks)
      } else if (!validated.contains(checks)) {
        // a rebase changed the check set: dedicated validation pass
        requireChecksPass(checks, df, s"commit into $dir")
        validated = Some(checks)
      }
      commitFiles(spark, dir, files, commitId,
        header = Seq(schemaHeader(df.schema)) ++ checkHeaders(checks) ++
          watermarkHeader(spark, dir),
        base = Some(latest)) match {
        case Some(v) => return v
        case None    => () // raced — re-read the carried metadata
      }
    }
    -1L // unreachable
  }

  /** Streaming-table append commit: version N = EVERYTHING ingested
    * through stream batch `batchId` (the new batch's files plus the
    * previous version's list by reference), stamped with a `#batch=`
    * header. Idempotent under foreachBatch's at-least-once replay: a
    * batchId at or below the newest committed `#batch=` header ANYWHERE
    * in the log (not just the latest version — a deleteWhere/optimize
    * may have landed since) returns the current version untouched
    * (Spark replays only from the last uncommitted batch, in order).
    * Concurrency-safe: the previous version's file list is re-read and
    * the commit re-based whenever another committer lands first, so an
    * append racing a delete loses neither side's files. Gives a
    * streaming sink per-batch snapshot isolation, time travel ("the
    * table as of batch k"), [[vacuum]] retention and [[deleteWhere]] —
    * none of which a plain parquet append sink has. */
  def commitBatch(spark: SparkSession, dir: String, df: DataFrame,
      batchId: Long): Long =
    appendImpl(spark, dir, df, Some(batchId))

  /** Plain APPEND commit — [[commitBatch]] without the `#batch=` replay
    * header (the DSv2/v1 batch-write path): a one-off batch append must
    * NOT stamp a batch id, or a streaming sink later checkpointed at a
    * smaller epoch would silently skip its first batches against this
    * table. Everything else (carried files, DV, partition purity,
    * schema merge, CHECK validation, race rebase) is identical. */
  def append(spark: SparkSession, dir: String, df: DataFrame): Long =
    appendImpl(spark, dir, df, None)

  private def appendImpl(spark: SparkSession, dir: String, df: DataFrame,
      batchId: Option[Long]): Long = {
    val what = batchId.map(b => s"batch $b").getOrElse("append")
    val commitId = java.util.UUID.randomUUID().toString
    var fresh: Seq[String] = null // batch data written once, on first need
    var writtenPcs: Seq[String] = null // partition layout fresh was written in
    var validatedChecks: Option[Seq[(String, String)]] = None
    while (true) {
      val vs = versions(spark, dir)
      batchId.foreach { b =>
        if (lastBatch(spark, dir).exists(b <= _))
          return vs.last // replayed batch: no-op (orphan data vacuumable)
      }
      val latest = vs.lastOption
      val checks = latest.map(checksOf(spark, dir, _)).getOrElse(Seq.empty)
      // a partition-declared table's appends stay partition-pure — the
      // batch inherits the latest version's layout
      val pcs = latest.map(partitionColsOf(spark, dir, _)).getOrElse(Seq.empty)
      if (fresh == null) {
        val (wired, assertChecks) =
          observedChecks(df, checks, commitId, s"$what into $dir")
        fresh = writeData(spark, dir, wired, commitId, pcs)
        writtenPcs = pcs
        assertChecks()
        validatedChecks = Some(checks)
      } else {
        require(writtenPcs == pcs,
          s"partition layout of $dir changed concurrently (was " +
            s"${writtenPcs.mkString(",")}, now ${pcs.mkString(",")}) — " +
            "retry the batch")
        if (!validatedChecks.contains(checks)) {
          requireChecksPass(checks, df, s"$what into $dir")
          validatedChecks = Some(checks)
        }
      }
      val schema = latest.flatMap(schemaOf(spark, dir, _))
        .map(mergeSchemas(_, df.schema)).getOrElse(df.schema)
      val prev = latest.map(filesOf(spark, dir, _)).getOrElse(Seq.empty)
      // a deletion vector on the previous version must ride along —
      // dropping the header here would resurrect MoR-deleted rows
      val dvHeader = latest.flatMap(dvOf(spark, dir, _))
        .map(n => s"#dv=$n").toSeq
      val partLines = latest.map(l => partHeaders(pcs,
        filePartsOf(spark, dir, l), prev, fresh)).getOrElse(Seq.empty)
      // a plain append (no batchId) is a non-batch verb like every
      // other: it must carry the #lastbatch high-water mark forward, or
      // a vacuum retaining only appends would blind the replay guard
      // and a restarted sink's replayed epoch would re-apply
      val replayHeader = batchId.map(b => s"#batch=$b").toSeq match {
        case Seq() => watermarkHeader(spark, dir)
        case bh    => bh
      }
      commitFiles(spark, dir, (prev ++ fresh).sorted, commitId,
        header = replayHeader ++
          Seq(schemaHeader(schema)) ++
          dvHeader ++ partLines ++ checkHeaders(checks),
        base = Some(latest)) match {
        case Some(v) => return v
        case None    => () // lost the race — rebase on the new latest
      }
    }
    -1L // unreachable
  }

  /** Streaming-table REPLACE commit: version N = the full snapshot as of
    * stream batch `batchId` (fresh files only, nothing carried), with
    * the same `#batch=` replay idempotence as [[commitBatch]]. This is
    * the shape a CDC merge wants — each micro-batch produces a complete
    * next state, not an increment — and is what
    * [[graft.streaming.CdcStream]] commits through to give the CDC
    * pillar atomic versions, table-grain time travel and vacuum.
    * Replace semantics re-decide the physical layout per batch (the
    * [[commit]] rule): the new version is unpartitioned regardless of
    * the previous declaration — a partition-preserving stream goes
    * through [[commitBatch]] or [[mergeBatch]] instead. */
  def commitBatchReplace(spark: SparkSession, dir: String, df: DataFrame,
      batchId: Long): Long = {
    val commitId = java.util.UUID.randomUUID().toString
    var files: Seq[String] = null
    var validated: Option[Seq[(String, String)]] = None
    while (true) {
      val vs0 = versions(spark, dir)
      if (lastBatch(spark, dir).exists(batchId <= _)) return vs0.last
      // base-checked for the same metadata-carry reason as [[commit]]
      val checks = vs0.lastOption.map(checksOf(spark, dir, _))
        .getOrElse(Seq.empty)
      if (files == null) {
        val (wired, assertChecks) =
          observedChecks(df, checks, commitId, s"batch $batchId into $dir")
        files = writeData(spark, dir, wired, commitId)
        assertChecks()
        validated = Some(checks)
      } else if (!validated.contains(checks)) {
        requireChecksPass(checks, df, s"batch $batchId into $dir")
        validated = Some(checks)
      }
      commitFiles(spark, dir, files, commitId,
        header = Seq(s"#batch=$batchId", schemaHeader(df.schema)) ++
          checkHeaders(checks),
        base = Some(vs0.lastOption)) match {
        case Some(v) => return v
        case None    => () // raced — re-read the carried metadata
      }
    }
    -1L // unreachable
  }

  /** The committed version carrying stream batch `batchId`'s `#batch=`
    * header, if retained — table-grain time travel by batch id. */
  def versionOfBatch(spark: SparkSession, dir: String,
      batchId: Long): Option[Long] =
    versions(spark, dir).reverseIterator
      .find(v => batchOf(spark, dir, v).contains(batchId))

  /** Commit an EXTERNALLY-MANAGED file set as the next version (replace
    * semantics, `#batch=` replay idempotence, explicit schema). The
    * files are REFERENCED, not copied — the caller produced them (e.g. a
    * bucketed CDC merge generation) and owns their lifecycle; this turns
    * an existing directory-per-generation layout into atomic log
    * versions without a second copy of the data. [[vacuum]] only ever
    * deletes under this table's own `data/` root, so it will drop
    * manifests of expired external versions but never their files — pair
    * caller-side retention with [[referencedFiles]] to know which
    * external files retained versions still need. */
  def commitBatchExternal(spark: SparkSession, dir: String,
      files: Seq[String], schema: StructType, batchId: Long,
      partitionCols: Seq[String] = Seq.empty): Long = {
    var validated: Option[Seq[(String, String)]] = None
    // externally-written hive-layout files: the caller declares the
    // partition columns and the tuples derive from the paths it laid
    // out — recorded in the manifest so readPartition prunes the
    // published table exactly like a commitPartitioned one
    val partLines =
      if (partitionCols.isEmpty) Seq.empty
      else {
        // loud guard: a writer that percent-encoded multi-byte UTF-8 in
        // a partition dir reads back MOJIBAKE under Spark's
        // char-per-byte discovery — recording that tuple would make
        // every equality probe on the real value silently miss. Refuse
        // and tell the writer to lay out raw UTF-8 names (what Spark
        // itself writes).
        files.foreach { p =>
          p.split('/').dropRight(1).filter(_.contains('=')).foreach { seg =>
            val v = seg.drop(seg.indexOf('=') + 1)
            require(hiveUnescape(v) == hiveUnescapeUtf8(v),
              s"external partition segment '$seg' in $p percent-encodes " +
                "multi-byte UTF-8 — Spark partition discovery decodes " +
                "escapes char-per-byte, so this value cannot round-trip; " +
                "publish the layout with raw (unescaped) UTF-8 dir names")
          }
        }
        partHeaders(partitionCols, Map.empty, Seq.empty, files)
      }
    while (true) {
      val vs0 = versions(spark, dir)
      if (lastBatch(spark, dir).exists(batchId <= _)) return vs0.last
      // base-checked for the same metadata-carry reason as [[commit]]
      val checks = vs0.lastOption.map(checksOf(spark, dir, _))
        .getOrElse(Seq.empty)
      if (checks.nonEmpty && files.nonEmpty && !validated.contains(checks)) {
        // partitioned external files: the partition values live in the
        // dirs — a flat explicit-schema read would validate NULLs there.
        // External files carry PHYSICAL names (the v2 streaming write
        // maps before encoding); alias back for the logical checks.
        val cmX = vs0.lastOption.map(colmapOf(spark, dir, _))
          .getOrElse(Map.empty[String, String])
        val phys = physicalSchema(cmX, schema)
        val raw =
          if (partitionCols.isEmpty)
            spark.read.schema(phys).parquet(files: _*)
          else files.groupBy(commitRootOf).toSeq.sortBy(_._1)
            .map { case (root, ps) =>
              spark.read.schema(phys).option("basePath", root)
                .parquet(ps: _*)
            }.reduce(_.unionByName(_))
        val frame =
          if (cmX.isEmpty) raw
          else raw.select(schema.fields.toSeq.map(f =>
            col(s"`${cmX.getOrElse(f.name, f.name)}`").as(f.name)): _*)
        requireChecksPass(checks, frame, s"external batch $batchId into $dir")
        validated = Some(checks)
      }
      commitFiles(spark, dir, files.sorted,
        java.util.UUID.randomUUID().toString,
        header = Seq(s"#batch=$batchId", schemaHeader(schema)) ++
          partLines ++ checkHeaders(checks),
        base = Some(vs0.lastOption)) match {
        case Some(v) => return v
        case None    => () // raced — re-read the carried metadata
      }
    }
    -1L // unreachable
  }

  /** APPEND commit of externally-written parquet files — the executor-
    * side streaming-write registration: version N = the previous
    * version's files by reference PLUS `files` (already on disk, laid
    * out by the caller's own writers), stamped `#batch=` for replay
    * idempotence exactly like [[commitBatch]]. The append twin of
    * [[commitBatchExternal]] (which REPLACES). CHECK constraints
    * validate by reading the files back (one pass, only when checks
    * exist); schema merges under the log's evolution rules; a replayed
    * batch registers nothing (the files become vacuumable orphans —
    * the same contract external replace commits have). Partition-
    * DECLARED tables are refused loudly: a flat external file list
    * cannot be partition-pure, and silently dropping the layout would
    * break every partition-scoped read after it. */
  def appendExternal(spark: SparkSession, dir: String,
      files: Seq[String], schema: StructType, batchId: Long): Long = {
    var validated: Option[Seq[(String, String)]] = None
    while (true) {
      val vs = versions(spark, dir)
      if (lastBatch(spark, dir).exists(batchId <= _)) return vs.last
      val latest = vs.lastOption
      val pcs = latest.map(partitionColsOf(spark, dir, _))
        .getOrElse(Seq.empty)
      require(pcs.isEmpty,
        s"$dir declares partition columns (${pcs.mkString(",")}); " +
          "external appends are flat — stream through " +
          "format(\"graft-snapshot\")'s v1 sink (commitBatch lays out " +
          "partition-pure files) instead")
      val checks = latest.map(checksOf(spark, dir, _)).getOrElse(Seq.empty)
      if (checks.nonEmpty && files.nonEmpty && !validated.contains(checks)) {
        // external files carry PHYSICAL names; alias back for checks
        val cmX = latest.map(colmapOf(spark, dir, _))
          .getOrElse(Map.empty[String, String])
        val raw = spark.read.schema(physicalSchema(cmX, schema))
          .parquet(files: _*)
        val frame =
          if (cmX.isEmpty) raw
          else raw.select(schema.fields.toSeq.map(f =>
            col(s"`${cmX.getOrElse(f.name, f.name)}`").as(f.name)): _*)
        requireChecksPass(checks, frame,
          s"external batch $batchId into $dir")
        validated = Some(checks)
      }
      val merged = latest.flatMap(schemaOf(spark, dir, _))
        .map(mergeSchemas(_, schema)).getOrElse(schema)
      val prev = latest.map(filesOf(spark, dir, _)).getOrElse(Seq.empty)
      val dvHeader = latest.flatMap(dvOf(spark, dir, _))
        .map(n => s"#dv=$n").toSeq
      commitFiles(spark, dir, (prev ++ files).sorted,
        java.util.UUID.randomUUID().toString,
        header = Seq(s"#batch=$batchId", schemaHeader(merged)) ++
          dvHeader ++ checkHeaders(checks),
        base = Some(latest)) match {
        case Some(v) => return v
        case None    => () // raced — re-read the carried metadata
      }
    }
    -1L // unreachable
  }

  /** Loud guard for streaming Complete-mode sinks (v1 [[SnapshotSink]]
    * and the v2 [[SnapshotStreamingWrite]]): their replace commits carry
    * FLAT file sets, so replacing a partition-DECLARED table would
    * silently drop its layout from the manifest — every subsequent
    * readPartition prune and partition-pure append would break. Refuse
    * with guidance instead (the [[appendExternal]] precedent). */
  private[sources] def requireUnpartitionedForReplace(spark: SparkSession,
      dir: String, what: String): Unit = {
    val pcs = versions(spark, dir).lastOption
      .map(partitionColsOf(spark, dir, _)).getOrElse(Seq.empty)
    require(pcs.isEmpty,
      s"$dir declares partition columns (${pcs.mkString(",")}); $what " +
        "replaces the table with a FLAT snapshot, which would silently " +
        "drop the declared layout — stream in Append mode (partition-" +
        "pure commitBatch) or re-publish via commitPartitioned instead")
  }

  /** Every file any RETAINED manifest references — the caller-side
    * retention contract for [[commitBatchExternal]] files: anything not
    * in this set (and not the caller's live copy) is safe to reclaim. */
  def referencedFiles(spark: SparkSession, dir: String): Set[String] =
    versions(spark, dir).flatMap(filesOf(spark, dir, _)).toSet

  /** Wire a stream into a versioned table: one snapshot version per
    * micro-batch via [[commitBatch]]. */
  def sink(df: DataFrame, dir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitBatch(batch.sparkSession, dir, batch, id); ()
      }
      .start()

  /** Streaming UPSERT sink: each micro-batch [[mergeBatch]]es into the
    * table by key — later batches REPLACE earlier rows with the same key
    * instead of appending duplicates (what [[sink]] cannot express), and
    * rows where `deleteWhen` is true are tombstones. The streaming
    * MERGE shape of the Delta/Iceberg world: at-least-once replays
    * no-op via `#batch=`, per-batch write cost is COW (∝ files holding
    * a changed key), and the first batch bootstraps the table. The
    * caller must guarantee one row per key per batch (aggregate or
    * dedup upstream) — merge's duplicate guard fails the batch loudly
    * otherwise. */
  def mergeSink(df: DataFrame, dir: String, checkpointDir: String,
      keys: Seq[String], deleteWhen: Option[Column] = None,
      dropCols: Seq[String] = Seq.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch.sparkSession, dir, batch, keys, id,
          deleteWhen, dropCols); ()
      }
      .start()

  /** Copy-on-write targeted delete: commit a new version with every row
    * matching `pred` removed, REWRITING ONLY the files that contain a
    * match — untouched files are carried into the new manifest by
    * reference (file paths shared across versions; [[vacuum]] already
    * reasons per-file, so sharing is retention-safe). Returns the new
    * version, or the current one unchanged when nothing matches.
    *
    * NULL semantics: a row where `pred` evaluates to NULL was NOT
    * matched for deletion and MUST survive. Survivors are therefore
    * every row where the predicate is not definitely true —
    * `!coalesce(pred, false)` — because under SQL three-valued logic a
    * bare `filter(!pred)` would ALSO drop the NULL rows (both `pred`
    * and `!pred` are NULL there), silently losing data the caller never
    * asked to delete.
    *
    * Concurrency: the affected-file computation is a read-modify-write
    * against the latest version; if another commit lands before ours,
    * the base check aborts the manifest and the WHOLE operation rebases
    * (recomputes affected files against the new latest) — a delete
    * racing an append can never drop the append's files.
    *
    * This is the right-to-be-forgotten shape at 100 TB: locating
    * affected files is one pushdown-filtered scan (parquet footer
    * min/max skips most files without reading rows — pair with
    * [[optimize]] clustering on the delete key to keep the affected
    * set small), and the rewrite cost is proportional to the files the
    * key actually lives in, not the table. Old versions still see the
    * deleted rows until vacuumed — retention policy, not a leak: run
    * `vacuum(keepLast=1)` for hard deletion. */
  def deleteWhere(spark: SparkSession, dir: String,
      pred: Column): Long = {
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val schema = schemaOf(spark, dir, latest)
      val pcs = partitionColsOf(spark, dir, latest)
      val current = filesOf(spark, dir, latest)
      def readCur(paths: Seq[String]) = readFiles(spark, dir, latest, paths)
      // DV-composable: detection and the rewrite both read THROUGH the
      // version's deletion vector (readFiles), so a MoR-dead row can
      // neither mark a file affected nor resurrect in the rewrite; the
      // new version carries the vector minus the rewritten files'
      // entries (prunedDvHeader). Detection pre-prunes at MANIFEST grain
      // (zone maps/blooms/partition tuples) — files the stats prove
      // unaffected never open a footer.
      val candidates = detectionCandidates(spark, dir, latest, pred)
      val affected =
        if (candidates.isEmpty) Set.empty[String]
        else readFilesTagged(spark, dir, latest, candidates, Some("__f"))
          .filter(pred).select("__f")
          .distinct().collect().map(_.getString(0)).toSet
      // scan metadata reports URIs; manifests may store schemeless paths
      def hit(p: String) = affected.contains(p) ||
        affected.contains(new Path(p).toUri.toString) ||
        affected.exists(a => new Path(a).toUri.getPath == new Path(p).toUri.getPath)
      val (rewrite, carry) = current.partition(hit)
      if (rewrite.isEmpty) return latest
      val commitId = java.util.UUID.randomUUID().toString
      val survivors = readCur(rewrite).filter(!coalesce(pred, lit(false)))
      val newFiles =
        if (survivors.isEmpty) Seq.empty
        else writeData(spark, dir, survivors, commitId, pcs)
      // recorded change feed: the deleted pre-images ARE the commit's
      // exact row-level changes — write them as change files
      val cfiles =
        if (!cdfEnabled(spark, dir, latest)) None
        else Some(writeChangeFiles(spark, dir,
          readCur(rewrite).filter(coalesce(pred, lit(false)))
            .withColumn("_change_type", lit("delete")), commitId))
      commitFiles(spark, dir, (carry ++ newFiles).sorted, commitId,
        header = schema.map(schemaHeader).toSeq ++
          cfiles.map(cdfHeaders).getOrElse(Seq.empty) ++
          prunedDvHeader(spark, dir, latest, rewrite) ++
          propagatedStatHeaders(spark, dir, latest, carry, newFiles) ++
          propagatedPartHeaders(spark, dir, latest, carry, newFiles) ++
          checkHeaders(checksOf(spark, dir, latest)) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => // raced — recompute against the new latest; this
          // attempt's survivor rewrite is unreferenced, reclaim eagerly
          if (newFiles.nonEmpty) dropOrphanedCommitDir(spark, dir, commitId)
          if (cfiles.isDefined) dropOrphanedChangeDir(spark, dir, commitId)
      }
    }
    -1L // unreachable
  }

  /** `INSERT INTO ... REPLACE WHERE <pred>` as ONE atomic commit (the
    * Delta replaceWhere shape): the predicate's region is deleted
    * ([[deleteWhere]]'s COW machinery — only files holding a matched
    * row rewrite, survivors kept, DV composed) and `df`'s rows land as
    * fresh files, all in a single version — a reader never sees the
    * region empty. Contract guard (loud, Delta-style): every incoming
    * row must SATISFY the predicate — a row outside the region would
    * make the statement not an overwrite of that region; the guard
    * rides the fresh write as one more observed aggregate (zero extra
    * passes). CHECK constraints validate the same way; partition
    * layouts stay declared and partition-pure; three-valued logic
    * follows [[deleteWhere]] (NULL-pred rows survive). This is the
    * "reload a date range" ETL verb: cost = files intersecting the
    * region + the new data, never the table. */
  def replaceWhere(spark: SparkSession, dir: String, df: DataFrame,
      pred: Column): Long = {
    val commitId = java.util.UUID.randomUUID().toString
    var fresh: Seq[String] = null
    var writtenPcs: Seq[String] = null
    var validated: Option[Seq[(String, String)]] = None
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val schema = schemaOf(spark, dir, latest)
      val pcs = partitionColsOf(spark, dir, latest)
      val current = filesOf(spark, dir, latest)
      def readCur(paths: Seq[String]) = readFiles(spark, dir, latest, paths)
      val checks = checksOf(spark, dir, latest)
      if (fresh == null) {
        val (wired, assertChecks) =
          observedChecks(df, checks, commitId, s"REPLACE WHERE into $dir")
        val obs = new org.apache.spark.sql.Observation(
          s"graft-replwhere-$commitId")
        val guarded =
          try wired.observe(obs,
            sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L))
              .as("__outside"))
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new IllegalArgumentException(
                "REPLACE WHERE predicate must be evaluable on the " +
                  s"incoming rows: ${e.getMessage}")
          }
        fresh = writeData(spark, dir, guarded, commitId, pcs)
        writtenPcs = pcs
        assertChecks()
        val outside = Option(obs.get("__outside"))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        require(outside == 0L,
          s"REPLACE WHERE into $dir: $outside incoming row(s) do NOT " +
            "match the predicate — the statement would write outside " +
            "the replaced region; fix the query or widen the predicate")
        validated = Some(checks)
      } else {
        require(writtenPcs == pcs,
          s"partition layout of $dir changed concurrently (was " +
            s"${writtenPcs.mkString(",")}, now ${pcs.mkString(",")}) — " +
            "retry the statement")
        if (!validated.contains(checks)) {
          requireChecksPass(checks, df, s"REPLACE WHERE into $dir")
          validated = Some(checks)
        }
      }
      // region rewrite — the deleteWhere recipe, same DV composition
      // and the same manifest-grain detection pre-prune
      val candidates = detectionCandidates(spark, dir, latest, pred)
      val affected =
        if (candidates.isEmpty) Set.empty[String]
        else readFilesTagged(spark, dir, latest, candidates, Some("__f"))
          .filter(pred).select("__f")
          .distinct().collect().map(_.getString(0)).toSet
      def hit(p: String) = affected.contains(p) ||
        affected.contains(new Path(p).toUri.toString) ||
        affected.exists(a =>
          new Path(a).toUri.getPath == new Path(p).toUri.getPath)
      val (rewrite, carry) = current.partition(hit)
      var survivorId: String = null
      val rewritten =
        if (rewrite.isEmpty) Seq.empty
        else {
          val survivors = readCur(rewrite)
            .filter(!coalesce(pred, lit(false)))
          if (survivors.isEmpty) Seq.empty
          else {
            // own commit dir: the fresh files already claimed
            // data/<commitId>, and a rebase retry re-rewrites anyway
            survivorId = java.util.UUID.randomUUID().toString
            writeData(spark, dir, survivors, survivorId, pcs)
          }
        }
      val merged = schema.map(mergeSchemas(_, df.schema))
        .getOrElse(df.schema)
      // recorded change feed: the replaced region's pre-images are the
      // deletes; the incoming rows are the inserts — read BACK from the
      // fresh files (never a second evaluation of the incoming plan).
      // Fresh files persist across rebase retries, change dirs don't —
      // one uuid per attempt, reclaimed on a lost race.
      val changeId = java.util.UUID.randomUUID().toString
      val cfiles =
        if (!cdfEnabled(spark, dir, latest)) None
        else {
          val legs = scala.collection.mutable.ArrayBuffer[DataFrame]()
          if (rewrite.nonEmpty)
            legs += alignTo(readCur(rewrite)
              .filter(coalesce(pred, lit(false))), merged)
              .withColumn("_change_type", lit("delete"))
          // an empty incoming frame (delete-the-region idiom) writes no
          // data files — and must not try to read them back
          if (fresh.nonEmpty)
            legs += readBackWritten(spark, dir, latest, fresh,
              writtenPcs, merged).withColumn("_change_type", lit("insert"))
          Some(if (legs.isEmpty) Seq.empty
          else writeChangeFiles(spark, dir,
            legs.reduce(_.unionByName(_)), changeId))
        }
      commitFiles(spark, dir, (carry ++ rewritten ++ fresh).sorted, commitId,
        header = Seq(schemaHeader(merged)) ++
          cfiles.map(cdfHeaders).getOrElse(Seq.empty) ++
          prunedDvHeader(spark, dir, latest, rewrite) ++
          propagatedStatHeaders(spark, dir, latest, carry,
            rewritten ++ fresh) ++
          propagatedPartHeaders(spark, dir, latest, carry,
            rewritten ++ fresh) ++
          checkHeaders(checks) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => // raced — recompute against the new latest. The
          // fresh files are REUSED next attempt, but this attempt's
          // survivor rewrite is unreferenced garbage — reclaim eagerly
          // instead of leaving it to the grace-period vacuum
          if (survivorId != null) dropOrphanedCommitDir(spark, dir, survivorId)
          if (cfiles.isDefined) dropOrphanedChangeDir(spark, dir, changeId)
      }
    }
    -1L // unreachable
  }

  /** DYNAMIC partition overwrite (`INSERT OVERWRITE` under
    * `spark.sql.sources.partitionOverwriteMode=dynamic`): replace
    * exactly the partitions the incoming data TOUCHES, atomically, and
    * carry every other partition by reference. Pure MANIFEST surgery on
    * a partition-declared table: the incoming tuples derive from the
    * fresh files' own partition-pure paths (no second evaluation of
    * `df`), dropped files are the current files whose RECORDED tuple is
    * in that set (partition purity means no row survives them), and no
    * old data is read at all — O(manifest) planning cost regardless of
    * table size, the dynamic-overwrite twin of [[readPartition]]'s
    * manifest-grain prune. CHECK constraints ride the fresh write;
    * DV entries of dropped files are pruned; stats/layout carried. */
  def overwritePartitions(spark: SparkSession, dir: String,
      df: DataFrame): Long = {
    val commitId = java.util.UUID.randomUUID().toString
    var fresh: Seq[String] = null
    var writtenPcs: Seq[String] = null
    var validated: Option[Seq[(String, String)]] = None
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val schema = schemaOf(spark, dir, latest)
      val pcs = partitionColsOf(spark, dir, latest)
      require(pcs.nonEmpty,
        s"$dir declares no partition columns — dynamic partition " +
          "overwrite needs a declared layout (a plain INSERT OVERWRITE " +
          "replaces the whole table)")
      val checks = checksOf(spark, dir, latest)
      if (fresh == null) {
        val (wired, assertChecks) = observedChecks(df, checks, commitId,
          s"dynamic partition overwrite into $dir")
        fresh = writeData(spark, dir, wired, commitId, pcs)
        writtenPcs = pcs
        assertChecks()
        validated = Some(checks)
      } else {
        require(writtenPcs == pcs,
          s"partition layout of $dir changed concurrently (was " +
            s"${writtenPcs.mkString(",")}, now ${pcs.mkString(",")}) — " +
            "retry the statement")
        if (!validated.contains(checks)) {
          requireChecksPass(checks, df,
            s"dynamic partition overwrite into $dir")
          validated = Some(checks)
        }
      }
      val incoming = fresh.map(p => partTupleOfPath(p, pcs)).toSet
      val parts = filePartsOf(spark, dir, latest)
      val current = filesOf(spark, dir, latest)
      val unrecorded = current.filterNot(parts.contains)
      require(unrecorded.isEmpty,
        s"$dir has ${unrecorded.size} file(s) without recorded partition " +
          "tuples — dynamic overwrite decides at manifest grain and " +
          "cannot prove them disjoint from the replaced partitions; " +
          "re-publish the table via commitPartitioned first")
      val (dropped, carried) = current.partition(p =>
        incoming.contains(pcs.map(c => c -> parts(p)(c))))
      val merged = schema.map(mergeSchemas(_, df.schema))
        .getOrElse(df.schema)
      // recorded change feed: replaced partitions' rows (partition-pure
      // dropped files, DV-applied) are the deletes, the fresh files the
      // inserts — without this, a dynamic INSERT OVERWRITE on a CDF
      // table would wedge every feed reader with a misleading refusal.
      // This is the one cost CDF adds here: the verb stays O(manifest)
      // with the feed off, and pays one read of the REPLACED partitions
      // (never the table) when it is on.
      val changeId = java.util.UUID.randomUUID().toString
      val cfiles =
        if (!cdfEnabled(spark, dir, latest)) None
        else {
          val legs = scala.collection.mutable.ArrayBuffer[DataFrame]()
          if (dropped.nonEmpty)
            legs += alignToRead(readFiles(spark, dir, latest, dropped),
              merged).withColumn("_change_type", lit("delete"))
          if (fresh.nonEmpty)
            legs += readBackWritten(spark, dir, latest, fresh,
              writtenPcs, merged)
              .withColumn("_change_type", lit("insert"))
          Some(if (legs.isEmpty) Seq.empty
          else writeChangeFiles(spark, dir,
            legs.reduce(_.unionByName(_)), changeId))
        }
      commitFiles(spark, dir, (carried ++ fresh).sorted, commitId,
        header = Seq(schemaHeader(merged)) ++
          cfiles.map(cdfHeaders).getOrElse(Seq.empty) ++
          prunedDvHeader(spark, dir, latest, dropped) ++
          propagatedStatHeaders(spark, dir, latest, carried, fresh) ++
          propagatedPartHeaders(spark, dir, latest, carried, fresh) ++
          checkHeaders(checks) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => // raced — recompute against the new latest; the
          // fresh files are reused, this attempt's change dir is not
          if (cfiles.isDefined) dropOrphanedChangeDir(spark, dir, changeId)
      }
    }
    -1L // unreachable
  }

  /** UPDATE ... SET ... WHERE as a copy-on-write commit — the third
    * row-level verb beside [[deleteWhere]] and [[merge]]: every row
    * where `pred` is definitely TRUE gets each `set` column replaced by
    * its expression (evaluated against the row — `set` values may
    * reference other columns); NULL-pred rows are untouched (the
    * [[deleteWhere]] three-valued rule, mirrored). Only files holding a
    * matched row are rewritten — everything else carries by reference,
    * so a sparse update against a clustered 100 TB table rewrites a
    * handful of files. Loud guards: `set` may not name an unknown
    * column, and each expression is cast to the column's existing type
    * (an UPDATE must never mutate the schema — that is [[merge]]'s
    * widening job). CHECK constraints validate the POST-IMAGES of
    * matched rows in one fused pass before anything commits. Returns
    * the current version unchanged when nothing matches. DV-composable
    * like every rewriting verb (the [[deleteWhereMoR]] contract). */
  def updateWhere(spark: SparkSession, dir: String, pred: Column,
      set: Map[String, Column]): Long = {
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val schema = schemaOf(spark, dir, latest)
      val pcs = partitionColsOf(spark, dir, latest)
      val current = filesOf(spark, dir, latest)
      def readCur(paths: Seq[String]) = readFiles(spark, dir, latest, paths)
      val tableSchema = schema.getOrElse(readCur(current).schema)
      val unknown = set.keySet.diff(tableSchema.fieldNames.toSet)
      require(unknown.isEmpty,
        s"UPDATE sets unknown column(s) ${unknown.mkString(",")} — " +
          "schema changes go through merge, not updateWhere")
      // DV-composable (the deleteWhere rule): detection + rewrite read
      // through the vector; the commit prunes rewritten files' entries.
      // Manifest-grain pre-prune like deleteWhere's.
      val candidates = detectionCandidates(spark, dir, latest, pred)
      val affected =
        if (candidates.isEmpty) Set.empty[String]
        else readFilesTagged(spark, dir, latest, candidates, Some("__f"))
          .filter(pred).select("__f")
          .distinct().collect().map(_.getString(0)).toSet
      def hitF(p: String) = affected.contains(p) ||
        affected.contains(new Path(p).toUri.toString) ||
        affected.exists(a =>
          new Path(a).toUri.getPath == new Path(p).toUri.getPath)
      val (rewrite, carry) = current.partition(hitF)
      if (rewrite.isEmpty) return latest
      val hit = coalesce(pred, lit(false))
      val rewritten = readCur(rewrite).select(
        tableSchema.fields.toSeq.map { fld =>
          set.get(fld.name) match {
            case Some(e) =>
              when(hit, e.cast(fld.dataType)).otherwise(col(fld.name))
                .as(fld.name)
            case None => col(fld.name)
          }
        }: _*)
      // post-images for validation: filter on the PRE-image predicate
      // first, then apply the SET unconditionally — filtering `rewritten`
      // would re-evaluate the predicate against already-updated rows
      val matchedPost = readCur(rewrite).filter(hit).select(
        tableSchema.fields.toSeq.map { fld =>
          set.get(fld.name).map(_.cast(fld.dataType).as(fld.name))
            .getOrElse(col(fld.name))
        }: _*)
      requireChecksPass(checksOf(spark, dir, latest),
        matchedPost, s"UPDATE post-images in $dir")
      val commitId = java.util.UUID.randomUUID().toString
      val newFiles = writeData(spark, dir, rewritten, commitId, pcs)
      // recorded change feed: matched pre-images + their post-images
      // (both frames the verb already has — checks validate matchedPost)
      val cfiles =
        if (!cdfEnabled(spark, dir, latest)) None
        else Some(writeChangeFiles(spark, dir,
          readCur(rewrite).filter(hit)
            .withColumn("_change_type", lit("update_preimage"))
            .unionByName(matchedPost
              .withColumn("_change_type", lit("update_postimage"))),
          commitId))
      commitFiles(spark, dir, (carry ++ newFiles).sorted, commitId,
        header = schema.map(schemaHeader).toSeq ++
          cfiles.map(cdfHeaders).getOrElse(Seq.empty) ++
          prunedDvHeader(spark, dir, latest, rewrite) ++
          propagatedStatHeaders(spark, dir, latest, carry, newFiles) ++
          propagatedPartHeaders(spark, dir, latest, carry, newFiles) ++
          checkHeaders(checksOf(spark, dir, latest)) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => // raced — recompute against the new latest;
          // this attempt's rewrite files are unreferenced, reclaim
          dropOrphanedCommitDir(spark, dir, commitId)
          if (cfiles.isDefined) dropOrphanedChangeDir(spark, dir, commitId)
      }
    }
    -1L // unreachable
  }

  /** Keyed MERGE INTO as a copy-on-write commit (the Delta/Iceberg
    * upsert shape): every target row whose `keys` match a row of
    * `changes` is REPLACED by that change row (full-row semantics — the
    * change row is the new post-image, not a column patch), change rows
    * matching nothing are INSERTED, and change rows where `deleteWhen`
    * is true DELETE their match (and are never inserted). Returns the
    * new version, or the current one unchanged when the merge is a
    * no-op (only deletes of absent keys; 0 when the table additionally
    * has no committed version at all). Merging into an empty log
    * bootstraps it — the first CDC batch needs no special-case sink.
    *
    * Cost model at 100 TB: locating affected files is ONE column-pruned
    * scan of the key columns semi-joined against the change keys (a
    * small, usually broadcast side), and the rewrite touches ONLY files
    * that contain a matched key — untouched files are carried into the
    * new manifest by reference, inserts land in fresh files without
    * touching anything. Pair with [[optimize]] clustering on the merge
    * key so matched keys concentrate in few files; a random layout makes
    * every file "affected". This is what [[commitBatchReplace]] is not:
    * a sparse CDC batch against a huge table rewrites a handful of
    * files, not the table.
    *
    * Contract guards (Delta-style loud failures, never silent):
    * `changes` must have no NULL merge key (NULL never equals anything
    * under SQL semantics — such a row could only ever insert, which is
    * almost always an upstream bug) and no duplicate key (two change
    * rows matching one target row make the merge ambiguous).
    * `insertOnlyWhen` RELAXES the NULL-key guard for rows it marks:
    * rows the caller can prove are pure inserts (SQL MERGE's
    * `WHEN NOT MATCHED THEN INSERT` leg — a NULL key there is standard
    * SQL, the row simply never matches) ride the insert path with NULL
    * keys intact; NULL-keyed rows NOT so marked (or marked and
    * tombstoned) still refuse loudly. Duplicate-key ambiguity does not
    * exist among NULL-keyed inserts (they match nothing), so two of
    * them are fine.
    *
    * `dropCols` names control columns of `changes` (e.g. a CDC `op`
    * flag) that `deleteWhen` may reference but that must not be stored.
    * Schema evolution: columns `changes` adds beyond the table schema
    * widen it (nullable, [[mergeSchemas]] rules); carried-by-reference
    * and rewritten old files read typed nulls there.
    *
    * Concurrency: same optimistic read-modify-write discipline as
    * [[deleteWhere]] — base-checked commit, full recompute on a lost
    * race. Stats: carried files keep their zone-map stats, rewritten
    * and inserted files get fresh ones over the same columns. */
  def merge(spark: SparkSession, dir: String, changes: DataFrame,
      keys: Seq[String], deleteWhen: Option[Column] = None,
      dropCols: Seq[String] = Seq.empty,
      insertOnlyWhen: Option[Column] = None): Long =
    mergeImpl(spark, dir, changes, keys, deleteWhen, dropCols, Seq.empty,
      insertOnlyWhen)

  /** [[merge]] stamped with a `#batch=` header — the replay-idempotent
    * form for at-least-once stream feeds ([[commitBatch]] semantics): a
    * batch at or below the newest committed `#batch=` anywhere in the
    * log returns the current version untouched. This is the CDC
    * apply-changes sink for a snapshot-logged table: each micro-batch
    * of keyed upserts/tombstones merges in at file grain. */
  def mergeBatch(spark: SparkSession, dir: String, changes: DataFrame,
      keys: Seq[String], batchId: Long,
      deleteWhen: Option[Column] = None,
      dropCols: Seq[String] = Seq.empty,
      insertOnlyWhen: Option[Column] = None): Long = {
    val vs = versions(spark, dir)
    if (lastBatch(spark, dir).exists(batchId <= _)) return vs.last
    mergeImpl(spark, dir, changes, keys, deleteWhen, dropCols,
      Seq(s"#batch=$batchId"), insertOnlyWhen)
  }

  /** Project `df` onto `schema`: present columns cast-free, absent ones
    * as typed nulls (how pre-evolution rows acquire an added column). */
  private def alignTo(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map { fld =>
      if (df.columns.contains(fld.name)) col(fld.name)
      else lit(null).cast(fld.dataType).as(fld.name)
    }: _*)

  /** [[alignTo]] with READ semantics for the absent columns: a
    * pre-evolution row acquires an added column's frozen EXISTS_DEFAULT
    * when one is declared (exactly what the table scan fills for it),
    * NULL otherwise. Change-feed legs use this so the feed never shows
    * NULL where the table shows the default. */
  private def alignToRead(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map { fld =>
      if (df.columns.contains(fld.name)) col(fld.name)
      else readFill(fld)
    }: _*)

  /** An absent column under READ semantics: the frozen EXISTS_DEFAULT
    * when declared, a typed NULL otherwise. */
  private def readFill(fld: StructField): Column = {
    val key = org.apache.spark.sql.catalyst.util
      .ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY
    if (fld.metadata.contains(key))
      expr(fld.metadata.getString(key)).cast(fld.dataType).as(fld.name)
    else lit(null).cast(fld.dataType).as(fld.name)
  }

  /** [[merge]]'s planning-time candidate prune: keep a file iff its
    * recorded zone map for `k` could contain ANY of the sorted change
    * keys (binary search for the first key ≥ file-min, check ≤
    * file-max); stat-less files are conservatively kept. Exposed for
    * the spec to hold the prune accountable. */
  private[graft] def pruneByStats(files: Seq[String],
      stats: Map[String, Map[String, ColStat]], k: String,
      ks: Array[Long]): Seq[String] =
    files.filter { p =>
      stats.get(p).flatMap(_.get(k)) match {
        case Some(LongStat(mn, mx, _)) =>
          val i = java.util.Arrays.binarySearch(ks, mn)
          val from = if (i >= 0) i else -i - 1
          from < ks.length && ks(from) <= mx
        case _ => true // no stat, or a differently-typed one — keep
      }
    }

  /** [[pruneByStats]] for string keys: same first-key-≥-file-min binary
    * search, in UTF-8 order, against the truncated [[StrStat]] range
    * (`hi` None = +∞ keeps the file for any key ≥ its min). */
  private[graft] def pruneByStatsStr(files: Seq[String],
      stats: Map[String, Map[String, ColStat]], k: String,
      ks: Array[String]): Seq[String] =
    files.filter { p =>
      stats.get(p).flatMap(_.get(k)) match {
        case Some(StrStat(mn, mxOpt, _)) =>
          var lo = 0
          var hi = ks.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (utf8Cmp(ks(mid), mn) < 0) lo = mid + 1 else hi = mid
          }
          lo < ks.length && mxOpt.forall(mx => utf8Cmp(ks(lo), mx) <= 0)
        case _ => true
      }
    }

  private def mergeImpl(spark: SparkSession, dir: String,
      changes0: DataFrame, keys: Seq[String], deleteWhen: Option[Column],
      dropCols: Seq[String], extraHeader: Seq[String],
      insertOnlyWhen: Option[Column] = None): Long = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val isDelete = deleteWhen.map(c => coalesce(c, lit(false)))
      .getOrElse(lit(false))
    val isInsertOnly = insertOnlyWhen.map(c => coalesce(c, lit(false)))
      .getOrElse(lit(false))
    // one materialization of the (small) change side; reused across the
    // affected-file scan, the rewrite and any rebase retries
    val changes = changes0.withColumn("__del", isDelete)
      .withColumn("__ins", isInsertOnly)
      .drop(dropCols: _*).persist()
    try {
      val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
      // NULL keys: allowed ONLY on rows the caller declared pure inserts
      // (SQL MERGE's not-matched leg — NULL matches nothing, so the row
      // inserts); everywhere else they are an upstream bug, loudly
      val nullKeyed = changes
        .filter(anyKeyNull && (!col("__ins") || col("__del")))
        .limit(1).count()
      require(nullKeyed == 0,
        s"merge changes carry a NULL key in (${keys.mkString(",")}) — " +
          "NULL matches nothing under SQL equality; only rows marked by " +
          "insertOnlyWhen (SQL's NOT MATCHED INSERT leg) may carry one")
      // ambiguity needs a key two rows could both MATCH — NULL-keyed
      // inserts match nothing, so they are excluded (SQL inserts both)
      val dup = changes.filter(!anyKeyNull).groupBy(keys.map(col): _*)
        .count().filter(col("count") > 1).limit(1).count()
      require(dup == 0,
        "merge changes carry duplicate keys — ambiguous merge " +
          "(collapse the batch to one winning row per key first)")
      val upserts = changes.filter(!col("__del")).drop("__del", "__ins")
      // detection/survivor key set: NULL-keyed rows match nothing and
      // must not reach the stat prune's literal encoding
      val keyFrame = changes.filter(!anyKeyNull).select(keys.map(col): _*)
      while (true) {
        val vs = versions(spark, dir)
        // incoming post-images must honor the table's checks (tombstones
        // remove rows — nothing to validate on them)
        vs.lastOption.foreach { latest =>
          requireChecksPass(checksOf(spark, dir, latest), upserts,
            s"merge into $dir")
        }
        if (vs.isEmpty) {
          // bootstrap: merging into an empty table is just the inserts.
          // 0 = "still no committed version" (deletes against nothing).
          if (upserts.isEmpty) return 0L
          val commitId = java.util.UUID.randomUUID().toString
          commitFiles(spark, dir, writeData(spark, dir, upserts, commitId),
            commitId,
            header = (extraHeader :+ schemaHeader(upserts.schema)) ++
              watermarkHeader(spark, dir),
            base = Some(None)) match {
            case Some(v) => return v
            case None    => // raced a concurrent first commit — remerge;
              // the bootstrap write is recomputed next attempt
              dropOrphanedCommitDir(spark, dir, commitId)
          }
        } else {
          val latest = vs.last
          val tableSchema = schemaOf(spark, dir, latest)
          val pcs = partitionColsOf(spark, dir, latest)
          val current = filesOf(spark, dir, latest)
          def readCur(paths: Seq[String]) = readFiles(spark, dir, latest, paths)
          // ONE key-column-pruned scan finds the files that hold any
          // matched key; everything else is carried by reference. Fast
          // path: a SPARSE single-integer-key batch against a table with
          // manifest zone maps on that key (the optimize-clustered
          // regime this verb is built for) collects the change keys
          // once, prunes candidate files at PLANNING time by each
          // file's recorded [min,max] (binary search over the sorted
          // keys), and scans only the survivors with a literal isin —
          // parquet row-group min/max pushdown then prunes inside them.
          // Cold files are never opened at all, versus the general
          // semi-join path whose join-shaped filter cannot skip files.
          // effective per-file stats: recorded zone maps AUGMENTED with
          // each file's partition tuple as a degenerate [v,v] stat
          // (decoded under the table type) — so a partition-keyed merge
          // prunes at planning time exactly like a clustered one.
          // Null-partition entries are omitted (conservative keep; a
          // change key is never NULL here — the guard above).
          val stats = {
            val recorded = fileStatsLogicalOf(spark, dir, latest)
            if (pcs.isEmpty) recorded
            else {
              val dts = tableSchema.map(s =>
                pcs.flatMap(c => s.find(_.name == c).map(c -> _.dataType))
                  .toMap).getOrElse(Map.empty)
              val parts = filePartsOf(spark, dir, latest).map { case (p, t) =>
                p -> t.flatMap { case (c, raw) =>
                  if (raw == NullPartition) None
                  else dts.get(c).flatMap(decodePartValue(raw, _)).map {
                    case s: String => c -> (StrStat(s, Some(s)): ColStat)
                    case x =>
                      val e = encodeStatLong(x)
                      c -> (LongStat(e, e): ColStat)
                  }
                }
              }
              (recorded.keySet ++ parts.keySet).map(p => p ->
                (recorded.getOrElse(p, Map.empty) ++
                  parts.getOrElse(p, Map.empty))).toMap
            }
          }
          // any stat-encodable single key qualifies: the isin literals
          // keep the column's own type (no cast), so parquet row-group
          // pushdown stays intact, and the planning-time prune runs on
          // the matching stat domain (long encoding, or UTF-8-ordered
          // truncated string ranges)
          val statKey = keys match {
            case Seq(k) if stats.nonEmpty && stats.values.exists(_.contains(k))
              && statEncodable(changes.schema(k).dataType) => Some(k)
            case _ => None
          }
          // candidate prune on one key column: binary-searched range
          // intersection against every file's recorded (or degenerate
          // partition) stat
          def pruneOn(k: String): Seq[String] = {
            val vals = keyFrame.select(col(k)).distinct()
              .collect().map(_.get(0))
            changes.schema(k).dataType match {
              case org.apache.spark.sql.types.StringType =>
                val ks = vals.map(_.asInstanceOf[String])
                java.util.Arrays.sort(ks,
                  (a: String, b: String) => utf8Cmp(a, b))
                pruneByStatsStr(current, stats, k, ks)
              case _ =>
                pruneByStats(current, stats, k,
                  vals.map(encodeStatLong).sorted)
            }
          }
          val sparse = keyFrame.limit(100001).count() <= 100000
          // (candidate files, isin literals) — None when not sparse
          val fastPath: Option[(Seq[String], Array[Any])] =
            statKey.filter(_ => sparse).map { k =>
              (pruneOn(k), keyFrame.select(col(k)).collect().map(_.get(0)))
            }
          // COMPOSITE keys cannot take the isin fast path, but one
          // stat-bearing key column still prunes the candidate set the
          // general semi-join scans — a (region, id) merge against an
          // id-clustered or region-partitioned table skips cold files
          // instead of opening the whole table
          val generalScan: Seq[String] =
            if (statKey.isDefined) current
            else keys.find(k => sparse &&
              stats.values.exists(_.contains(k)) &&
              statEncodable(changes.schema(k).dataType))
              .map(pruneOn).getOrElse(current)
          // DV-composable detection: the tagged read applies the
          // version's deletion vector, so a MoR-dead row cannot mark
          // its file affected (its key is invisible — correctly so)
          def readTagged(paths: Seq[String]) =
            readFilesTagged(spark, dir, latest, paths, Some("__f"))
          val affected = fastPath match {
            case Some((candidates, ks)) =>
              val k = statKey.get
              if (candidates.isEmpty) Set.empty[String]
              else readTagged(candidates)
                .filter(col(k).isin(ks.toSeq: _*))
                .select("__f")
                .distinct().collect().map(_.getString(0)).toSet
            case _ if generalScan.isEmpty => Set.empty[String]
            case _ =>
              readTagged(generalScan)
                .select((col("__f")) +: keys.map(col): _*)
                .join(keyFrame, keys, "left_semi")
                .select("__f").distinct().collect().map(_.getString(0)).toSet
          }
          def hit(p: String) = affected.contains(p) ||
            affected.contains(new Path(p).toUri.toString) ||
            affected.exists(a =>
              new Path(a).toUri.getPath == new Path(p).toUri.getPath)
          val (rewrite, carry) = current.partition(hit)
          if (rewrite.isEmpty && upserts.isEmpty) return latest // all-miss deletes
          val outSchema = mergeSchemas(
            tableSchema.getOrElse(readCur(current).schema),
            upserts.schema)
          // survivors: unmatched rows of the rewritten files (matched
          // rows are replaced or deleted — either way they drop here)
          val survivors =
            if (rewrite.isEmpty) None
            else Some(alignTo(
              readCur(rewrite).join(keyFrame, keys, "left_anti"), outSchema))
          val body = survivors match {
            case Some(s) => s.unionByName(alignTo(upserts, outSchema))
            case None    => alignTo(upserts, outSchema)
          }
          val commitId = java.util.UUID.randomUUID().toString
          val newFiles =
            if (body.isEmpty) Seq.empty
            else writeData(spark, dir, body, commitId, pcs)
          // recorded change feed — the verb knows its exact changes:
          // matched target rows are pre-images ("delete" when the change
          // row tombstones, else "update_preimage"), upserts whose key
          // exists in the rewritten files are post-images, the rest are
          // inserts (NULL-keyed insert-only rows match nothing → insert)
          val cfiles =
            if (!cdfEnabled(spark, dir, latest)) None
            else {
              require(!outSchema.fieldNames.contains("_change_type") &&
                !outSchema.fieldNames.contains("__del"),
                s"$dir: the change feed reserves column names " +
                  "_change_type and __del")
              def tag(df: DataFrame): DataFrame = df.select(
                (outSchema.fields.toSeq.map(fld =>
                  if (df.columns.contains(fld.name)) col(s"`${fld.name}`")
                  else lit(null).cast(fld.dataType).as(fld.name)) :+
                  col("_change_type")): _*)
              val legs = scala.collection.mutable.ArrayBuffer[DataFrame]()
              if (rewrite.nonEmpty) {
                val flags = changes.filter(!anyKeyNull)
                  .select((keys.map(col) :+ col("__del")): _*)
                legs += tag(readCur(rewrite).join(flags, keys, "inner")
                  .withColumn("_change_type",
                    when(col("__del"), lit("delete"))
                      .otherwise(lit("update_preimage"))))
                val tk = readCur(rewrite)
                  .select(keys.map(col): _*).distinct()
                val upA = alignTo(upserts, outSchema)
                legs += tag(upA.join(tk, keys, "left_semi")
                  .withColumn("_change_type", lit("update_postimage")))
                legs += tag(upA.join(tk, keys, "left_anti")
                  .withColumn("_change_type", lit("insert")))
              } else {
                legs += tag(alignTo(upserts, outSchema)
                  .withColumn("_change_type", lit("insert")))
              }
              Some(writeChangeFiles(spark, dir,
                legs.reduce(_.unionByName(_)), commitId))
            }
          commitFiles(spark, dir, (carry ++ newFiles).sorted, commitId,
            header = extraHeader ++ Seq(schemaHeader(outSchema)) ++
              cfiles.map(cdfHeaders).getOrElse(Seq.empty) ++
              prunedDvHeader(spark, dir, latest, rewrite) ++
              propagatedStatHeaders(spark, dir, latest, carry, newFiles) ++
              propagatedPartHeaders(spark, dir, latest, carry, newFiles) ++
              checkHeaders(checksOf(spark, dir, latest)) ++
              watermarkHeader(spark, dir),
            base = Some(Some(latest))) match {
            case Some(v) => return v
            case None    => // lost the race — recompute against new
              // latest; this attempt's body files are unreferenced
              if (newFiles.nonEmpty)
                dropOrphanedCommitDir(spark, dir, commitId)
              if (cfiles.isDefined)
                dropOrphanedChangeDir(spark, dir, commitId)
          }
        }
      }
      0L // unreachable
    } finally changes.unpersist()
  }

  /** Compaction as a commit: rewrite the latest version's SMALL files
    * (length < `smallFileBytes`) into `targetFiles` larger, optionally
    * clustered files, committed as a new version that carries every
    * already-large file by reference. Returns the new version, or the
    * current one when fewer than two files qualify (nothing to gain).
    *
    * Clustering: with `clusterBy` columns the rewrite is
    * range-partitioned and sorted on them, so parquet footer min/max
    * prunes subsequent reads on those columns; with TWO OR MORE numeric
    * columns and `zorder = true` the sort key is the interleaved
    * Z-value ([[graft.functions.ZOrderExprs.zOrderN]] over
    * `width_bucket` cells — one bounded min/max aggregate, no global
    * rank window), so min/max prunes on ANY of the columns, the
    * [[graft.ops.LayoutOps]] q_zorder property applied to table layout.
    *
    * Same no-lost-update discipline as [[deleteWhere]]: base-checked
    * commit, full rebase on a lost race. Prior versions keep referencing
    * the replaced small files until [[vacuum]] reclaims them — compaction
    * never breaks time travel. Rows are bit-identical (a pure rewrite);
    * no `#batch=` header is stamped, and the replay guard scans the whole
    * log, so compacting a streamed table never un-guards replays.
    *
    * `partitionScope` narrows the candidate set to files whose RECORDED
    * manifest tuple equals the given values — the daily-maintenance
    * shape at 100 TB (`OPTIMIZE t WHERE day = yesterday`): only the hot
    * partition's small files rewrite; every other slice carries by
    * reference, untouched on disk. Values render like [[readPartition]]
    * probes (loud on timestamps); scoping a column the table is not
    * partitioned by is an error. */
  def optimize(spark: SparkSession, dir: String,
      smallFileBytes: Long = 128L * 1024 * 1024,
      targetFiles: Int = 1,
      clusterBy: Seq[String] = Seq.empty,
      zorder: Boolean = false,
      partitionScope: Map[String, Any] = Map.empty): Long = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val f = fs(spark, dir)
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val schema = schemaOf(spark, dir, latest)
      val pcs = partitionColsOf(spark, dir, latest)
      val current = filesOf(spark, dir, latest)
      val inScope: String => Boolean =
        if (partitionScope.isEmpty) _ => true
        else {
          partitionScope.keys.foreach(c => require(pcs.contains(c),
            s"table under $dir is not partitioned by '$c' " +
              s"(partition cols: ${pcs.mkString(",")})"))
          val rendered = partitionScope.map { case (c, v) =>
            c -> renderPartValue(v) }
          val tuples = filePartsOf(spark, dir, latest)
          p => tuples.get(p).exists(t =>
            rendered.forall { case (c, r) => t.get(c).contains(r) })
        }
      val (small, large) = current.partition(p =>
        inScope(p) && f.getFileStatus(new Path(p)).getLen < smallFileBytes)
      if (small.size < 2) return latest
      // DV-composable: the compaction reads through the vector, so a
      // MoR-dead row is physically absent from the rewrite; the commit
      // carries the vector minus the compacted files' entries
      val base = readFiles(spark, dir, latest, small)
      // On a hive-partitioned table the writer fans each TASK out across
      // every partition tuple it holds — repartition(targetFiles) would
      // emit up to targetFiles × |touched tuples| files, INCREASING the
      // small-file count compaction set out to reduce. Lead the
      // partitioner with the partition columns so each task holds (at
      // most a boundary-straddle of) one tuple and writes ~1 file into
      // it; clusterBy/z-order then orders WITHIN the tuple.
      val clustered =
        if (clusterBy.isEmpty) {
          if (pcs.isEmpty) base.repartition(targetFiles)
          else base.repartition(pcs.map(col): _*) // ~1 file per tuple
        }
        else if (zorder && clusterBy.size >= 2) {
          // bucket every dim into uniform cells off ONE bounded min/max
          // aggregate (2·ndims driver-side scalars, never a rank
          // window), N-ary interleave (ZOrderN — bit-identical to the
          // historical 2-D path at ndims=2), then range-cluster on the
          // z-value. Cell bits shrink as dims grow (bits·ndims ≤ 63 —
          // 12 bits up to 5 dims, then 63/ndims).
          val nd = clusterBy.size
          val zbits = math.min(12, 63 / nd)
          val cells = 1 << zbits
          val aggs = clusterBy.flatMap(c => Seq(
            min(col(c).cast("double")), max(col(c).cast("double"))))
          val bounds = base.agg(aggs.head, aggs.tail: _*)
            .collect()(0).toSeq.map(v => Option(v).map(_.toString.toDouble)
              .getOrElse(0.0))
          // width_bucket yields 1..cells (upper bound nudged past max so
          // the max value stays in-range); shift to 0..cells-1 so the
          // interleave never wraps the top cell
          val cellCols = clusterBy.zipWithIndex.map { case (c, d) =>
            width_bucket(col(c).cast("double"),
              lit(bounds(2 * d)), lit(bounds(2 * d + 1) + 1e-9),
              lit(cells)) - 1
          }
          val z = graft.functions.ZOrderExprs.zOrderN(cellCols, zbits)
          base.withColumn("__z", z)
            .repartitionByRange(targetFiles, (pcs.map(col) :+ col("__z")): _*)
            .sortWithinPartitions((pcs :+ "__z").map(col): _*).drop("__z")
        } else base
          .repartitionByRange(targetFiles, (pcs ++ clusterBy).map(col): _*)
          .sortWithinPartitions((pcs ++ clusterBy).map(col): _*)
      val commitId = java.util.UUID.randomUUID().toString
      val fresh = writeData(spark, dir, clustered, commitId, pcs)
      // compaction changes ZERO logical rows: with the change feed on,
      // declare that (an EMPTY recorded change set) so CDF streams ride
      // across it instead of refusing the file rewrite
      val cdfMark =
        if (cdfEnabled(spark, dir, latest,
            requireNamesFree = false)) cdfHeaders(Seq.empty)
        else Seq.empty
      commitFiles(spark, dir, (large ++ fresh).sorted, commitId,
        header = schema.map(schemaHeader).toSeq ++ cdfMark ++
          prunedDvHeader(spark, dir, latest, small) ++
          propagatedStatHeaders(spark, dir, latest, large, fresh) ++
          propagatedPartHeaders(spark, dir, latest, large, fresh) ++
          checkHeaders(checksOf(spark, dir, latest)) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => () // raced — rebase (rewrite is vacuumable orphan)
      }
    }
    -1L // unreachable
  }

  /** Read a specific version (default: latest). Plans from the
    * manifest's exact file list — orphaned or in-flight data files are
    * invisible by construction — and, when the manifest recorded a
    * schema, with THAT schema: files written before a column add read
    * typed nulls in the new column. Fails loudly on a vacuumed/unknown
    * version rather than returning a partial table. */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v of $dir does not exist (have ${vs.mkString(",")})")
    val files = filesOf(spark, dir, v)
    require(files.nonEmpty,
      s"version $v of $dir is an empty table (every row was deleted)")
    val f = fs(spark, dir)
    files.foreach(p => require(f.exists(new Path(p)),
      s"manifest v$v names a vacuumed file: $p — version retained but data gone"))
    readFiles(spark, dir, v, files)
  }

  /** The batch-scan substitution [[graft.plans.SnapshotBatchRead]]
    * plans DSv2 relations through: version `v`'s surviving files via
    * Spark's native VECTORIZED parquet scan ([[readFiles]] — deletion
    * vector anti-applied, hive partition values re-attached), instead
    * of the row-at-a-time Group reader the streaming feed uses. None
    * when the substitution does not apply (no committed versions, a
    * version the relation names that does not exist — let the v2 scan
    * surface its own error — or a declared-empty file list, which the
    * v2 scan already reads as zero rows for free). */
  private[graft] def readForScan(spark: SparkSession, dir: String,
      version: Option[Long]): Option[DataFrame] = {
    val vs = versions(spark, dir)
    if (vs.isEmpty) None
    else {
      val v = version.getOrElse(vs.last)
      if (!vs.contains(v)) None
      else {
        val files = filesOf(spark, dir, v)
        if (files.isEmpty) None else Some(readFiles(spark, dir, v, files))
      }
    }
  }

  // -------------------------------------------------------------------
  // Change data feed — row-level diffs between versions at file grain
  // -------------------------------------------------------------------

  /** Row-level changes from version `fromV` (exclusive) to `toV`
    * (inclusive) — the Delta/Iceberg change-data-feed shape, derived
    * purely from the manifests: columns of `toV`'s schema plus
    * `_change_type` ∈ insert|delete (and, when `keys` are given,
    * update_preimage|update_postimage).
    *
    * File-grain cost model: only files ADDED or REMOVED between the two
    * manifests are read — files carried by reference across every
    * intermediate commit (the vast majority at 100 TB under COW
    * merge/delete) are never opened. Within the changed files, a row
    * rewritten verbatim (a COW survivor: its file was rewritten but the
    * row didn't change) cancels out via `exceptAll` between the two row
    * multisets, so survivors don't masquerade as churn:
    * {{{
    *   inserts = rows(added files) exceptAll rows(removed files)
    *   deletes = rows(removed files) exceptAll rows(added files)
    * }}}
    * `exceptAll` here is one hash aggregation over the CHANGED rows only
    * (the count-difference plan the engine's own q_except_all uses) —
    * never a scan of the table.
    *
    * With `keys`, a delete and an insert sharing a key are re-labelled
    * as the pre/post images of an UPDATE (one additional
    * changed-rows-sized join); a consumer applying the feed elsewhere
    * ([[merge]] on a replica) can then upsert post-images and delete
    * true deletes — see the replica-sync law in SnapshotCdfSpec.
    *
    * Schema evolution: both sides are read under their OWN version's
    * schema and aligned to `toV`'s (typed nulls in added columns), so a
    * feed spanning a column add is well-typed. Requires both versions
    * still retained (loud failure otherwise — a vacuumed `fromV` cannot
    * yield a sound diff). */
  def changesBetween(spark: SparkSession, dir: String, fromV: Long,
      toV: Long, keys: Seq[String] = Seq.empty): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.contains(fromV) && vs.contains(toV),
      s"changesBetween needs both versions retained; have ${vs.mkString(",")}")
    require(fromV <= toV, s"fromV $fromV must not exceed toV $toV")
    val outSchema = schemaOf(spark, dir, toV)
      .orElse(schemaOf(spark, dir, fromV))
    // a column RENAMED inside the span keeps its physical name — route
    // each side's logical names through it into toV's, or alignTo would
    // treat the renamed column as absent and null it out of the feed
    val cmTo = colmapOf(spark, dir, toV)
    val physToTo = cmTo.map(_.swap)
    def toEndNames(v: Long, df: DataFrame): DataFrame = {
      val cmV = colmapOf(spark, dir, v)
      if (cmV == cmTo) df
      else df.select(df.columns.toSeq.map { c =>
        val phys = cmV.getOrElse(c, c)
        col(s"`$c`").as(physToTo.getOrElse(phys, phys))
      }: _*)
    }
    def readSide(v: Long, paths: Seq[String]): DataFrame = {
      val raw =
        if (paths.isEmpty) {
          val s = schemaOf(spark, dir, v)
            .getOrElse(read(spark, dir, Some(v)).schema)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
        } else readFiles(spark, dir, v, paths) // applies v's deletion vector
      val named = toEndNames(v, raw)
      // READ fill: a column added after v reads its frozen default here
      // exactly as the toV table scan would (never NULL-vs-default skew)
      outSchema.map(alignToRead(named, _)).getOrElse(named)
    }
    val before = filesOf(spark, dir, fromV)
    val after = filesOf(spark, dir, toV)
    val added = after.filterNot(before.contains(_))
    val removed = before.filterNot(after.contains(_))
    val addedRows = readSide(toV, added)
    val removedRows = readSide(fromV, removed)
    // survivor cancellation only matters when a commit both added AND
    // removed files (a COW rewrite); pure appends and pure drops —
    // streaming's common case — are one scan of the changed files with
    // zero shuffle (removedRows/addedRows is the empty relation there)
    val both = added.nonEmpty && removed.nonEmpty
    val ins = (if (both) addedRows.exceptAll(removedRows) else addedRows)
      .withColumn("_change_type", lit("insert"))
    // MoR deletes change NO files — they grow the deletion vector. Rows
    // tombstoned between the versions (positions in toV's DV but not
    // fromV's) are read back by (file, row_index) and join the delete
    // leg; a compaction that APPLIES a DV is already silent through the
    // file diff (removed files read DV-applied cancel against the
    // rewritten survivors).
    val dvDeletes: Option[DataFrame] = {
      val toDvName = dvOf(spark, dir, toV)
      val fromDvName = dvOf(spark, dir, fromV)
      if (toDvName.isEmpty || toDvName == fromDvName) None
      else {
        val toDv = dvPositions(spark, dir, toDvName.get)
        val fromDv = fromDvName.map(dvPositions(spark, dir, _))
        val delta = fromDv.map(toDv.exceptAll).getOrElse(toDv)
        // only positions in files CARRIED across both versions: a row
        // tombstoned in a file that was itself added/removed within the
        // span is already accounted by the DV-applied file diff above —
        // reading it here would emit the delete twice
        val carried = before.map(p => new Path(p).toUri.getPath).toSet
          .intersect(after.map(p => new Path(p).toUri.getPath).toSet)
        val paths = delta.select("path").distinct()
          .collect().map(_.getString(0))
          .filter(p => carried.contains(new Path(p).toUri.getPath))
        if (paths.isEmpty) None
        else {
          // files carry PHYSICAL names; alias straight to toV's logical
          // (the feed's output names), same translation as readSide
          val cmF = colmapOf(spark, dir, fromV)
          val raw = schemaOf(spark, dir, fromV) match {
            case Some(s0) => spark.read
              .schema(physicalSchema(cmF, s0)).parquet(paths: _*)
            case None     => spark.read.parquet(paths: _*)
          }
          val cols = raw.columns.toSeq
          val rows = raw
            .withColumn("__dv_f", col("_metadata.file_path"))
            .withColumn("__dv_i", col("_metadata.row_index"))
            .join(delta, col("__dv_f") === col("path") &&
              col("__dv_i") === col("row_index"), "left_semi")
            .select(cols.map(c =>
              col(s"`$c`").as(physToTo.getOrElse(c, c))): _*)
          Some(outSchema.map(alignToRead(rows, _)).getOrElse(rows)
            .withColumn("_change_type", lit("delete")))
        }
      }
    }
    val delBase = (if (both) removedRows.exceptAll(addedRows)
      else removedRows)
      .withColumn("_change_type", lit("delete"))
    val del = dvDeletes.map(delBase.unionByName(_)).getOrElse(delBase)
    if (keys.isEmpty) ins.unionByName(del)
    else {
      // a key present on BOTH sides is an update; re-label its images.
      // Both join sides are changed-rows-sized (and key-pruned).
      val updKeys = ins.select(keys.map(col): _*)
        .intersect(del.select(keys.map(col): _*))
      def relabel(side: DataFrame, asUpdate: String) = {
        val flagged = side.join(updKeys.withColumn("__u", lit(true)),
          keys, "left_outer")
        flagged.withColumn("_change_type",
          when(col("__u"), lit(asUpdate)).otherwise(col("_change_type")))
          .drop("__u")
      }
      relabel(ins, "update_postimage")
        .unionByName(relabel(del, "update_preimage"))
    }
  }

  /** Incremental change-feed SUBSCRIPTION over a snapshot log — the
    * "stream the table's changes" verb without a custom streaming
    * source: each [[pollChanges]] call returns the row-level feed since
    * the subscriber's last acknowledged version, and [[ackChanges]]
    * advances the cursor AFTER the subscriber has durably applied the
    * batch — the two-phase shape that makes the loop at-least-once
    * (crash between poll and ack ⇒ the next poll re-delivers; pair with
    * an idempotent apply like [[merge]]'s keyed upsert or [[mergeBatch]]
    * replay guards). The cursor is one tiny text file owned by the
    * SUBSCRIBER (each consumer its own cursor — fan-out without
    * coordination), not by the log.
    *
    * Cost model: a poll reads manifests + only the files ADDED/REMOVED
    * (or DV-delta positions) between cursor and latest — the
    * [[changesBetween]] contract — so an idle poll is one small-file
    * read and a busy poll is ∝ the churn. The cursor version must stay
    * retained ([[vacuum]] keepLast ≥ the subscriber's lag) or the poll
    * fails loudly rather than emit an unsound diff. */
  def pollChanges(spark: SparkSession, dir: String, cursorFile: String,
      keys: Seq[String] = Seq.empty,
      maxVersions: Option[Long] = None,
      maxBytes: Option[Long] = None): Option[(DataFrame, Long)] =
    pollChangesWithLatest(spark, dir, cursorFile, keys, maxVersions,
      maxBytes) match {
      case (Some(feed), latest) => Some((feed, latest))
      case (None, _)            => None
    }

  /** [[pollChanges]] that also returns the log's latest version when
    * CAUGHT UP — a SQL/TVF caller building an empty same-shape
    * response must not pay a second version listing for it (the idle
    * poll is the scheduler-loop common case).
    *
    * `maxVersions` is the cursor protocol's ADMISSION control (the
    * poll/ack twin of the stream's maxVersionsPerTrigger): a
    * subscriber far behind catches up in bounded bites of ≤ m versions
    * per poll instead of one span-sized diff — the returned ack
    * version is the BITE's end, so the loop converges ack by ack. The
    * first poll of a bounded subscription serves the table AS OF the
    * earliest retained version + m − 1 (a bounded initial snapshot),
    * and later polls diff forward from the cursor.
    *
    * `maxBytes` is the BYTE-grain twin (the stream's
    * maxBytesPerTrigger): admit versions until their NEW data-file
    * bytes cross the budget — the crossing version rides (a single fat
    * version is served alone rather than wedging the loop), and the
    * first pending version is always admitted. On the FIRST poll the
    * budget bounds the initial snapshot instead: the bite serves the
    * table AS OF the newest early version whose TOTAL bytes still fit
    * (at least the earliest retained). Both caps compose — versions
    * first, bytes tighten. */
  def pollChangesWithLatest(spark: SparkSession, dir: String,
      cursorFile: String,
      keys: Seq[String] = Seq.empty,
      maxVersions: Option[Long] = None,
      maxBytes: Option[Long] = None): (Option[DataFrame], Long) = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val latest = vs.last
    val f = fs(spark, dir)
    val cp = new Path(cursorFile)
    val from: Option[Long] =
      if (!f.exists(cp)) None
      else {
        // a garbled cursor (external truncation/edit, checksum mismatch —
        // ackChanges itself writes temp-then-rename) must fail
        // ACTIONABLY, not with a bare NumberFormatException or
        // ChecksumException that names nothing
        def unreadable(detail: String, cause: Throwable = null) =
          new IllegalStateException(
            s"subscription cursor $cursorFile is unreadable ($detail) — " +
              "it should hold one version number. Recover by writing " +
              "the last version this subscriber durably APPLIED, or " +
              "delete the file to restart the subscription from a full " +
              "initial feed.", cause)
        val txt =
          try {
            val in = f.open(cp)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          } catch { case scala.util.control.NonFatal(e) =>
            throw unreadable(e.toString, e)
          }
        Some(txt.toLongOption
          .getOrElse(throw unreadable(s"content: '${txt.take(40)}'")))
      }
    maxVersions.foreach(m => require(m >= 1,
      s"maxVersions must be >= 1, got $m"))
    maxBytes.foreach(b => require(b >= 1,
      s"maxBytes must be >= 1, got $b"))
    val vset = vs.toSet
    // Byte-budget admission's metadata cost is bounded PER POLL, not
    // per (version × file): file LISTS cache per version (newBytesOf
    // visits v and v−1, and the admission loop walks consecutive
    // versions — each manifest reads once) and file SIZES cache per
    // path (consecutive versions share most data files — each file
    // stats at most once per poll, not once per referencing version).
    // On a long-history table the bounded bootstrap is O(distinct
    // files) getFileStatus calls instead of O(versions × files).
    val fileListCache =
      scala.collection.mutable.HashMap.empty[Long, Seq[String]]
    def filesCached(v: Long): Seq[String] =
      fileListCache.getOrElseUpdate(v, filesOf(spark, dir, v))
    val sizeCache = scala.collection.mutable.HashMap.empty[String, Long]
    def bytesOf(paths: Seq[String]): Long =
      paths.map(p => sizeCache.getOrElseUpdate(p,
        f.getFileStatus(new Path(p)).getLen)).sum
    // NEW data-file bytes version v contributes over its predecessor
    def newBytesOf(v: Long): Long = {
      def norm(p: String) = new Path(p).toUri.getPath
      val prev =
        if (vset.contains(v - 1)) filesCached(v - 1).map(norm).toSet
        else Set.empty[String]
      bytesOf(filesCached(v).filterNot(p => prev.contains(norm(p))))
    }
    from match {
      case Some(v) if v == latest => (None, latest) // caught up
      case Some(v) =>
        // retention raced past this subscriber: the diff since v cannot
        // be served soundly (deletes between v and the earliest retained
        // version are gone). Refuse HERE, naming the cursor and the
        // recovery path — never a silent empty poll, and never the bare
        // changesBetween message that names neither.
        if (!vs.contains(v)) throw new IllegalStateException(
          s"subscription cursor $cursorFile acknowledges version $v of " +
            s"$dir, which retention has dropped (retained: " +
            s"${vs.mkString(",")}) — the changes since it cannot be " +
            "served soundly (deletes in the vacuumed span are " +
            "unrecoverable). Resync the subscriber: clear/rebuild the " +
            "replica and delete the cursor file to restart from a full " +
            "initial feed (a re-bootstrap over a STALE replica would " +
            "miss those deletes), then vacuum with keepLast >= the " +
            "slowest subscriber's lag to prevent recurrence.")
        val vCap = maxVersions
          .fold(latest)(m => math.min(latest, v + m))
        // byte budget tightens the version cap: the crossing version is
        // included, the first pending version always rides
        val target = maxBytes match {
          case None => vCap
          case Some(budget) =>
            var cur = v; var bytes = 0L
            while (cur < vCap && bytes < budget) {
              cur += 1
              bytes += newBytesOf(cur)
            }
            cur
        }
        (Some(changesBetween(spark, dir, v, target, keys)), target)
      case None =>
        // first poll: the current table is the initial feed — under
        // admission, the table AS OF a bounded early version instead,
        // so the bootstrap bite is proportional to history's start,
        // not to the whole accumulated table
        val vCap0 = maxVersions
          .fold(latest)(m => math.min(latest, vs.head + m - 1))
        // byte budget bounds the initial SNAPSHOT: the newest early
        // version whose total bytes still fit, at least the earliest
        // retained (a single fat first version serves alone)
        val v0 = maxBytes match {
          case None => vCap0
          case Some(budget) =>
            // index walk over the (sorted) retained versions — never an
            // O(n) vs.find per admitted version; file lists/sizes come
            // from the per-poll caches above
            var i = 0 // vs(i) = admitted so far; the head always rides
            while (i + 1 < vs.length && vs(i + 1) <= vCap0 &&
                bytesOf(filesCached(vs(i + 1))) <= budget) i += 1
            vs(i)
        }
        (Some(read(spark, dir, Some(v0))
          .withColumn("_change_type", lit("insert"))), v0)
    }
  }

  /** Advance the subscriber's cursor to `version` — call AFTER the
    * polled batch is durably applied. Temp-write-then-rename (the
    * [[LogStore]] overwrite primitive): a crash mid-ack leaves the OLD
    * cursor intact — the next poll re-delivers (at-least-once, the
    * subscription's contract) — never an empty or torn file. */
  def ackChanges(spark: SparkSession, dir: String, cursorFile: String,
      version: Long): Unit =
    store.overwriteAtomic(fs(spark, dir), new Path(cursorFile),
      version.toString.getBytes("UTF-8"))

  /** Apply a keyed [[changesBetween]] feed to ANOTHER snapshot log — the
    * replica-sync verb. Post-images and inserts upsert, deletes delete,
    * pre-images are informational and ignored; one [[merge]] commit, so
    * the replica advances atomically and the rewrite touches only its
    * files that hold a changed key. `SnapshotCdfSpec` pins the law:
    * replica ∘ applyChanges(feed) == source, version over version. */
  def applyChanges(spark: SparkSession, dir: String, feed: DataFrame,
      keys: Seq[String]): Long =
    merge(spark, dir,
      feed.filter(col("_change_type") =!= "update_preimage")
        .withColumn("__is_del", col("_change_type") === "delete")
        .drop("_change_type"),
      keys,
      deleteWhen = Some(col("__is_del")), dropCols = Seq("__is_del"))

  /** CDC REPLICATION between snapshot tables, end to end over the
    * engine's own machinery: stream `srcDir`'s recorded change feed
    * (`readChangeFeed` — the source table needs
    * [[ChangeFeedProperty]]=true for any rewriting history) and apply
    * each micro-batch to `dstDir` as ONE keyed [[mergeBatch]] commit.
    * Exactly-once end to end: the stream's version-grain offsets replay
    * un-committed ranges, and the `#batch=` header makes the replayed
    * apply a no-op. Default `Trigger.AvailableNow` gives the scheduled
    * "catch up, then exit" job; pass a processing-time trigger for a
    * continuous replica.
    *
    * A batch may span VERSIONS, so same-key changes collapse to the
    * newest `_commit_version` first (within one version a REPLACE WHERE
    * can delete and re-insert a key — the insert is the final state, so
    * deletes order below). NULL-keyed inserts match nothing and all
    * apply. Scale: the collapse window is keyed on the CHANGES, never
    * the table; the apply rewrites only replica files holding a changed
    * key (the merge cost model). */
  def replicate(spark: SparkSession, srcDir: String, dstDir: String,
      keys: Seq[String], checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maxBytesPerTrigger: Option[Long] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(keys.nonEmpty, "replicate needs at least one key column")
    val reader = spark.readStream
      .format("graft.sources.SnapshotStreamSource")
      .option("path", srcDir).option("readChangeFeed", "true")
    // bounds every bite INCLUDING the bootstrap: the initial snapshot
    // splits at file grain under this budget, so a 100 TB source
    // becomes a sequence of bounded merge commits, not one
    maxBytesPerTrigger.foreach(b =>
      reader.option("maxBytesPerTrigger", b.toString))
    reader.load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyChangeBatch(batch.sparkSession, dstDir, batch, keys, id)
        ()
      }
      .start()
  }

  /** One replicated micro-batch: collapse to the newest action per key,
    * then one replay-guarded keyed merge commit ([[replicate]]'s apply
    * half, separable for foreachBatch composition and the spec). */
  def applyChangeBatch(spark: SparkSession, dstDir: String,
      batch: DataFrame, keys: Seq[String], batchId: Long): Long = {
    // pre-images are informational for a keyed applier
    val acts = batch.filter(col("_change_type") =!= "update_preimage")
    val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
    // NULL-keyed inserts match nothing and ALL apply — never collapsed
    // (a key-partitioned window would wrongly fold them into one). A
    // NULL-keyed DELETE/UPDATE cannot be applied BY KEY (NULL matches
    // nothing) — silently skipping it would quietly diverge the
    // replica — so the guard rides THIS slice's evaluation inside the
    // merge's own pass (raise_error, zero dedicated jobs): any
    // non-insert reaching it aborts the batch before anything commits
    val nullIns = acts.filter(anyKeyNull)
      .withColumn("_change_type",
        when(col("_change_type") === "insert", col("_change_type"))
          .otherwise(raise_error(lit(
            "change feed carries a delete/update with a NULL key in " +
              s"(${keys.mkString(",")}) — NULL matches nothing, so the " +
              "change cannot be applied by key; replicate on columns " +
              "the source never rewrites under NULL"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "delete", 0).otherwise(1).desc)
    val winners = acts.filter(!anyKeyNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    mergeBatch(spark, dstDir, winners.unionByName(nullIns), keys, batchId,
      deleteWhen = Some(col("_change_type") === lit("delete")),
      dropCols = Seq("_change_type", "_commit_version",
        "_commit_timestamp"),
      insertOnlyWhen = Some(col("_change_type") === lit("insert")))
  }

  /** The RECORDED change feed as one BATCH DataFrame over versions
    * `[fromV, toV]` (both inclusive) — the Delta `table_changes` shape
    * and the batch twin of `readStream.option("readChangeFeed")`:
    * per-version accumulated changes, columns = toV's schema +
    * `_change_type` + `_commit_version` + `_commit_timestamp`. Per
    * version: a RECORDED commit
    * ([[ChangeFeedProperty]]) contributes exactly its change files, a
    * pure append its added files as inserts, the table's FIRST version
    * its full file list; any other shape refuses loudly. This view
    * differs from [[changesBetween]] by design: changesBetween is an
    * ENDPOINT diff (intra-span churn cancels — the replica-sync view),
    * changeFeed shows every commit's changes (the audit/stream-parity
    * view). Plan size grows with the span — long spans belong on the
    * streaming source. */
  def changeFeed(spark: SparkSession, dir: String, fromV: Long,
      toV: Long): DataFrame = {
    val vs = versions(spark, dir)
    require(fromV <= toV, s"fromV $fromV must not exceed toV $toV")
    require(vs.contains(fromV) && vs.contains(toV),
      s"changeFeed needs both versions retained; have ${vs.mkString(",")}")
    val vset = vs.toSet
    val outSchema = schemaOf(spark, dir, toV)
      .getOrElse(read(spark, dir, Some(toV)).schema)
    val cmTo = colmapOf(spark, dir, toV)
    val physToTo = cmTo.map(_.swap)
    // outSchema + the three feed columns, read-filled (defaults, not
    // NULL). _commit_timestamp = the version's commit point (manifest
    // rename mtime, the same clock history()/TIMESTAMP AS OF read) —
    // the Delta table_changes shape's third marker.
    def shape(df: DataFrame, v: Long): DataFrame =
      df.select(outSchema.fields.toSeq.map { fld =>
        if (df.columns.contains(fld.name)) col(s"`${fld.name}`")
        else readFill(fld)
      } :+ col("_change_type"): _*)
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          lit(new java.sql.Timestamp(commitTimeMillis(spark, dir, v))))
    // walk the RANGE, not the retained list: a vacuumed mid-span
    // version must refuse loudly, never silently drop its changes
    val legs = (fromV to toV).flatMap { v =>
      require(vset.contains(v),
        s"version $v of $dir is gone (vacuumed?) — its changes cannot " +
          s"be served; narrow the span (have ${vs.mkString(",")})")
      changeFilesOf(spark, dir, v) match {
        case Some(cfs) if cfs.isEmpty => None // recorded zero changes
        case Some(cfs) =>
          val cmV = colmapOf(spark, dir, v)
          val sV = schemaOf(spark, dir, v).getOrElse(outSchema)
          val physChange = StructType(physicalSchema(cmV, sV).fields :+
            StructField("_change_type",
              org.apache.spark.sql.types.StringType))
          val raw = spark.read.schema(physChange).parquet(cfs: _*)
          // physical → v's logical → toV's logical names
          val logical = raw.select(sV.fields.toSeq.map { f =>
            val phys = cmV.getOrElse(f.name, f.name)
            col(s"`$phys`").as(physToTo.getOrElse(phys, f.name))
          } :+ col("_change_type"): _*)
          Some(shape(logical, v))
        case None =>
          val files = filesOf(spark, dir, v)
          def norm(p: String): String = new Path(p).toUri.getPath
          val prev: Seq[String] =
            if (vset.contains(v - 1)) filesOf(spark, dir, v - 1)
            // versions are claimed densely from 1, so ONLY v1 is the
            // table's genuine first version — an oldest-RETAINED v>1
            // after a prefix vacuum must refuse, or its accumulated
            // file list would masquerade as that version's inserts
            else if (v == 1L) Seq.empty
            else throw new IllegalStateException(
              s"version ${v - 1} of $dir (the predecessor of feed " +
                s"version $v) is gone (vacuumed?) — its inserts cannot " +
                "be derived; narrow the span to retained versions")
          val prevSet = prev.map(norm).toSet
          val curSet = files.map(norm).toSet
          require(prev.forall(p => curSet.contains(norm(p))),
            s"version $v of $dir rewrote files without recording its " +
              s"changes — set TBLPROPERTIES ('$ChangeFeedProperty'=" +
              "'true') so rewrite verbs record them")
          require(dvOf(spark, dir, v) ==
            (if (vset.contains(v - 1)) dvOf(spark, dir, v - 1) else None),
            s"version $v of $dir grew its deletion vector without " +
              s"recording its changes — set TBLPROPERTIES " +
              s"('$ChangeFeedProperty'='true')")
          val added = files.filterNot(p => prevSet.contains(norm(p)))
          if (added.isEmpty) None
          else {
            val raw = readFiles(spark, dir, v, added)
            val cmV = colmapOf(spark, dir, v)
            val named =
              if (cmV == cmTo) raw
              else raw.select(raw.columns.toSeq.map { c =>
                val phys = cmV.getOrElse(c, c)
                col(s"`$c`").as(physToTo.getOrElse(phys, phys))
              }: _*)
            Some(shape(named.withColumn("_change_type", lit("insert")), v))
          }
      }
    }
    if (legs.isEmpty) {
      val s = StructType(outSchema.fields :+
        StructField("_change_type",
          org.apache.spark.sql.types.StringType) :+
        StructField("_commit_version",
          org.apache.spark.sql.types.LongType) :+
        StructField("_commit_timestamp",
          org.apache.spark.sql.types.TimestampType))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    } else legs.reduce(_.unionByName(_))
  }

  /** Version `v`'s commit point in epoch millis — the manifest's rename
    * mtime, the atomic visibility transition (the clock history(),
    * TIMESTAMP AS OF and the feed's `_commit_timestamp` all share). */
  private[sources] def commitTimeMillis(spark: SparkSession, dir: String,
      v: Long): Long =
    fs(spark, dir).getFileStatus(manifestPath(dir, v)).getModificationTime

  /** [[changeFeed]] with TIMESTAMP bounds — the Delta CDF
    * startingTimestamp/endingTimestamp form: `fromTsMillis` resolves to
    * the EARLIEST version committed at or after it, `toTsMillis` to the
    * NEWEST at or before it ([[versionAsOf]] — a pre-creation instant
    * still refuses loudly: serving history from before the table
    * existed would fabricate it). A window that spans NO commit returns
    * the EMPTY same-shape feed (the caught-up-poll convention): "what
    * changed between 2pm and 3pm" legitimately answers "nothing". Both
    * bounds read the same clock the feed's own `_commit_timestamp`
    * carries.
    *
    * Vacuumed-prefix soundness: when retention has dropped the table's
    * early versions (`vs.head > 1`), a from-bound that predates the
    * earliest RETAINED commit spans changes that no longer exist — the
    * retained head still has recorded change files, so serving from it
    * would silently omit the vacuumed versions' changes. That window
    * REFUSES loudly instead (the same rule [[pollChanges]] applies to a
    * vacuumed cursor and [[changeFeed]] to a vacuumed mid-span), the
    * Delta CDF out-of-range discipline. */
  def changeFeedBetweenTimestamps(spark: SparkSession, dir: String,
      fromTsMillis: Long, toTsMillis: Long): DataFrame = {
    require(fromTsMillis <= toTsMillis,
      s"fromTs $fromTsMillis must not exceed toTs $toTsMillis")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val to = versionAsOf(spark, dir, toTsMillis)
    if (vs.head > 1L && fromTsMillis < commitTimeMillis(spark, dir, vs.head))
      throw new IllegalStateException(
        s"timestamp window [fromTs=$fromTsMillis] starts before the " +
          s"earliest retained commit of $dir (v${vs.head}; versions " +
          "before it were vacuumed) — the window may span vacuumed " +
          "commits whose changes cannot be served soundly. Move fromTs " +
          s"to >= ${commitTimeMillis(spark, dir, vs.head)} (v${vs.head}'s " +
          "commit time) to read retained history, or vacuum with a " +
          "longer retention to keep the span.")
    vs.find(v => commitTimeMillis(spark, dir, v) >= fromTsMillis) match {
      case Some(from) if from <= to => changeFeed(spark, dir, from, to)
      case _ => // no commit inside the window: empty, same shape
        val base = schemaOf(spark, dir, to)
          .getOrElse(read(spark, dir, Some(to)).schema)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(base.fields :+
            StructField("_change_type",
              org.apache.spark.sql.types.StringType) :+
            StructField("_commit_version",
              org.apache.spark.sql.types.LongType) :+
            StructField("_commit_timestamp",
              org.apache.spark.sql.types.TimestampType)))
    }
  }

  // -------------------------------------------------------------------
  // PARTITIONED TABLES — directory-level pruning inside the format
  // -------------------------------------------------------------------

  /** Declared partition columns of a version (`#partition=` header) —
    * empty for an unpartitioned version. Partitioning is per-VERSION
    * state like the schema: every mutating verb carries it forward;
    * only a full-replace [[commit]]/[[commitPartitioned]] re-decides
    * the layout. */
  def partitionColsOf(spark: SparkSession, dir: String,
      v: Long): Seq[String] =
    manifestLines(spark, dir, v).collectFirst {
      case l if l.startsWith("#partition=") =>
        l.stripPrefix("#partition=").split(",").toSeq
    }.getOrElse(Seq.empty)

  /** Per-file partition tuples of a version (`#filepart=` lines):
    * file path → (partition column → rendered value). Readers prune
    * from THESE — never by re-parsing paths at read time. */
  private[graft] def filePartsOf(spark: SparkSession, dir: String,
      v: Long): Map[String, Map[String, String]] =
    manifestLines(spark, dir, v)
      .filter(_.startsWith("#filepart="))
      .map { l =>
        val parts = l.stripPrefix("#filepart=").split("\t")
        parts.head -> parts.tail.map { kv =>
          val i = kv.indexOf('=')
          kv.take(i) -> statUnesc(kv.drop(i + 1))
        }.toMap
      }.toMap

  /** Hive path-segment unescape (Spark percent-encodes `/:=%` etc. in
    * partition dir names); values recorded in the manifest are the RAW
    * values, so probes never need to know the path encoding.
    *
    * Deliberately CHAR-PER-BYTE, matching Spark's own
    * `unescapePathName` — the value partition discovery will attach to
    * the column at read time. Spark's escaping is ASCII-only (non-ASCII
    * values land RAW in dir names and round-trip exactly); a manifest
    * that "fixed" a multi-byte escape to real UTF-8 would disagree with
    * what the scan materializes — prune hits, residual filter misses.
    * External writers that percent-encode UTF-8 are rejected loudly at
    * [[commitBatchExternal]] instead (see [[hiveUnescapeUtf8]]). */
  private def hiveUnescape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { // malformed escape passes through verbatim
          case _: NumberFormatException => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The UTF-8 interpretation of a hive-escaped segment: escaped byte
    * RUNS decode as UTF-8. Used ONLY to DETECT externally-published
    * layouts whose writers percent-encoded multi-byte values — under
    * Spark's char-per-byte discovery such a layout reads back mojibake
    * in the partition column, so [[commitBatchExternal]] refuses it
    * loudly (write raw UTF-8 dir names instead) rather than record a
    * tuple every equality probe would silently miss. */
  private def hiveUnescapeUtf8(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val bos = new java.io.ByteArrayOutputStream(s.length)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def hex(c: Char) = Character.digit(c, 16) >= 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) && hex(s.charAt(i + 2))) {
        bos.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        val end = if (Character.isHighSurrogate(c) && i + 1 < s.length &&
          Character.isLowSurrogate(s.charAt(i + 1))) i + 2 else i + 1
        val b = s.substring(i, end).getBytes(utf8)
        bos.write(b, 0, b.length)
        i = end
      }
    }
    new String(bos.toByteArray, utf8)
  }

  /** The partition marker Spark writes for a NULL partition value. */
  private[graft] val NullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Derive a freshly written file's partition tuple from its hive
    * path segments — exact by construction: [[writeData]] wrote the
    * layout one call ago. */
  private def partTupleOfPath(path: String,
      partCols: Seq[String]): Seq[(String, String)] = {
    val kvs = path.split('/').dropRight(1).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i > 0) Some(hiveUnescape(seg.take(i)) -> hiveUnescape(seg.drop(i + 1)))
      else None
    }.toMap
    partCols.map(c => c -> kvs.getOrElse(c, throw new IllegalStateException(
      s"partitioned data file lacks a '$c=' path segment: $path")))
  }

  private def filePartLine(path: String, tuple: Seq[(String, String)]) =
    s"#filepart=$path" +
      tuple.map { case (c, v) => s"\t$c=${statEsc(v)}" }.mkString

  /** Partition headers for a commit: the declaration plus one
    * `#filepart=` line per file — carried files verbatim from the
    * previous version's recorded tuples, new files derived from their
    * freshly written paths. Empty when the table is unpartitioned. */
  private def partHeaders(partCols: Seq[String],
      prevParts: Map[String, Map[String, String]],
      carried: Seq[String], newFiles: Seq[String]): Seq[String] =
    if (partCols.isEmpty) Seq.empty
    else s"#partition=${partCols.mkString(",")}" +:
      (carried.flatMap(p => prevParts.get(p).map(t =>
        filePartLine(p, partCols.map(c => c -> t(c))))) ++
        newFiles.map(p => filePartLine(p, partTupleOfPath(p, partCols))))

  /** [[partHeaders]] reading the carried state from `prevV`. */
  private def propagatedPartHeaders(spark: SparkSession, dir: String,
      prevV: Long, carried: Seq[String],
      newFiles: Seq[String]): Seq[String] = {
    val pcs = partitionColsOf(spark, dir, prevV)
    if (pcs.isEmpty) Seq.empty
    else partHeaders(pcs, filePartsOf(spark, dir, prevV), carried, newFiles)
  }

  /** Decode a RECORDED partition value string back to the column's JVM
    * type, for range/point pruning on partition columns (their values
    * live only in the manifest tuple — no in-file stats can exist).
    * None = cannot decode under this type (conservative: keep the
    * file), EXCEPT the hive null marker which every caller handles
    * first. Timestamps are deliberately not decoded (their path
    * rendering is timezone-shaped — conservative keep). */
  private def decodePartValue(raw: String,
      dt: org.apache.spark.sql.types.DataType): Option[Any] = {
    import org.apache.spark.sql.types._
    try dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some(java.lang.Long.parseLong(raw))
      case DateType    => Some(java.sql.Date.valueOf(raw))
      case StringType  => Some(raw)
      case d: DecimalType if d.precision <= 18 =>
        Some(new java.math.BigDecimal(raw).setScale(d.scale))
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Render a probe value the way partition tuples are recorded:
    * dates/ints/longs/strings by their canonical string form, null by
    * the hive marker. Must match Spark's own partition-path rendering
    * (which the tuples were derived from) — the types below are the
    * ones that round-trip exactly; use a string probe for anything
    * exotic. */
  private def renderPartValue(v: Any): String = v match {
    case null                    => NullPartition
    case d: java.sql.Date        => d.toString
    case d: java.time.LocalDate  => d.toString
    // a timestamp's toString need not match Spark's partition-dir
    // rendering, and THIS prune is an equality cut — a silent mismatch
    // would return a wrong EMPTY result, not a conservative over-read.
    // Loud beats wrong: probe with the exact recorded string instead.
    case _: java.sql.Timestamp | _: java.time.Instant |
         _: java.time.LocalDateTime =>
      throw new IllegalArgumentException(
        "timestamp partition probes must be passed as the exact recorded " +
          "string (see filePartsOf) — a JVM timestamp's rendering need " +
          "not match the partition-directory encoding")
    case other                   => other.toString
  }

  /** [[commit]] with declared hive partitioning (and optionally
    * zone-map stats): data lands partition-pure under per-tuple dirs,
    * the manifest records the declaration and every file's tuple, and
    * [[readPartition]] prunes at MANIFEST-PARSE time — the first-order
    * prune at 100 TB, before zone maps and before any parquet footer
    * opens. Every mutating verb (merge/deleteWhere/updateWhere/
    * optimize/clone/restore/analyze/commitBatch) preserves the
    * declaration and keeps rewritten files partition-pure. */
  def commitPartitioned(spark: SparkSession, dir: String, df: DataFrame,
      partitionCols: Seq[String],
      statCols: Seq[String] = Seq.empty): Long = {
    require(partitionCols.nonEmpty,
      "commitPartitioned needs at least one partition column (plain " +
        "commit() for an unpartitioned table)")
    val missing = partitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"partition column(s) ${missing.mkString(",")} absent from the frame")
    val commitId = java.util.UUID.randomUUID().toString
    var files: Seq[String] = null
    var validated: Option[Seq[(String, String)]] = None
    while (true) {
      val latest = versions(spark, dir).lastOption
      val checks = latest.map(checksOf(spark, dir, _)).getOrElse(Seq.empty)
      if (files == null) {
        val (wired, assertChecks) =
          observedChecks(df, checks, commitId, s"commit into $dir")
        files = writeData(spark, dir, wired, commitId, partitionCols)
        assertChecks()
        validated = Some(checks)
      } else if (!validated.contains(checks)) {
        requireChecksPass(checks, df, s"commit into $dir")
        validated = Some(checks)
      }
      commitFiles(spark, dir, files, commitId,
        header = Seq(schemaHeader(df.schema)) ++
          partHeaders(partitionCols, Map.empty, Seq.empty, files) ++
          statHeaders(spark, dir, files, statCols) ++ checkHeaders(checks) ++
          watermarkHeader(spark, dir),
        base = Some(latest)) match {
        case Some(v) => return v
        case None    => ()
      }
    }
    -1L // unreachable
  }

  /** Partition-pruned read: rows where each `where` column equals the
    * given value, planning ONLY the files whose RECORDED partition
    * tuple matches — pruning happens while parsing the manifest,
    * before zone maps, blooms, or any file open. Non-partition
    * residual exactness: the equality predicate is applied to the kept
    * rows too, so a stale or partial prune can only over-read, never
    * fabricate. Returns (frame, filesScanned, filesTotal), the
    * [[readBetween]] accountability contract. Probing a column the
    * version is not partitioned by is loud — the caller expected a
    * prune that cannot happen ([[readBetweenValues]] is the tool for
    * value-range predicates). */
  def readPartition(spark: SparkSession, dir: String, where: Map[String, Any],
      version: Option[Long] = None): (DataFrame, Int, Int) = {
    require(where.nonEmpty, "readPartition needs at least one column=value")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v of $dir does not exist (have ${vs.mkString(",")})")
    val pcs = partitionColsOf(spark, dir, v)
    val notPart = where.keySet.filterNot(pcs.contains)
    require(notPart.isEmpty,
      s"version $v of $dir is not partitioned by ${notPart.mkString(",")} " +
        s"(declared: ${if (pcs.isEmpty) "none" else pcs.mkString(",")})")
    val rendered = where.map { case (c, x) => c -> renderPartValue(x) }
    val parts = filePartsOf(spark, dir, v)
    val files = filesOf(spark, dir, v)
    val kept = files.filter { p =>
      parts.get(p) match {
        case Some(t) => rendered.forall { case (c, rv) => t.get(c).contains(rv) }
        case None    => true // unrecorded file — conservative
      }
    }
    val pred = where.map { case (c, x) =>
      if (x == null) col(c).isNull else col(c) === lit(x)
    }.reduce(_ && _)
    val schema = schemaOf(spark, dir, v)
    val df =
      if (kept.nonEmpty) readFiles(spark, dir, v, kept).filter(pred)
      else schema match {
        case Some(s) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
        case None => read(spark, dir, Some(v)).filter(pred).limit(0)
      }
    (df, kept.size, files.size)
  }

  // -------------------------------------------------------------------
  // Per-file column stats (zone maps) — planning-time file skipping
  // -------------------------------------------------------------------

  /** Typed per-file column statistic recorded in the manifest.
    * [[LongStat]] is the ORDER-PRESERVING long encoding shared by every
    * non-string orderable type (ints verbatim, dates as epoch days,
    * timestamps as epoch micros, decimals p≤18 as the unscaled long —
    * all strictly monotone in the column's SQL ordering, so long
    * compares on the encoding decide range intersection exactly).
    * [[StrStat]] is the Iceberg-style truncated string range: `lo` is a
    * ≤[[StatTruncLen]]-codepoint PREFIX of the file minimum (a prefix
    * is ≤ the full string, so always a valid lower bound); `hi` is the
    * truncated maximum with its last code point incremented (strictly >
    * anything sharing the prefix, so a valid upper bound), or None for
    * "+∞" when every retained code point is already U+10FFFF. */
  private[graft] sealed trait ColStat {
    /** Whether the file contains ANY null in this column — `Some(false)`
      * lets an IS NULL probe prune the file EXACTLY; `None` (legacy
      * stats written before the flag existed) keeps it conservatively. */
    def nulls: Option[Boolean]
  }
  private[graft] final case class LongStat(lo: Long, hi: Long,
    nulls: Option[Boolean] = None) extends ColStat
  private[graft] final case class StrStat(lo: String, hi: Option[String],
    nulls: Option[Boolean] = None) extends ColStat

  private[graft] val StatTruncLen = 32

  /** UTF-8 byte order — Spark's UTF8_BINARY string ordering, which the
    * recorded min/max were computed under. Java's String.compareTo is
    * UTF-16 order and disagrees for supplementary characters vs
    * U+E000..U+FFFF, so driver-side prune compares must NOT use it. */
  private[graft] def utf8Cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Truncate a file-minimum to a valid (possibly shorter) lower bound:
    * a prefix never exceeds the original in UTF-8 order. Never splits a
    * surrogate pair (the dangling high surrogate would re-encode as a
    * replacement char and break the bound). */
  private[graft] def truncStatMin(s: String): String =
    if (s.length <= StatTruncLen) s
    else {
      val cut = if (Character.isHighSurrogate(s.charAt(StatTruncLen - 1)))
        StatTruncLen - 1 else StatTruncLen
      s.substring(0, cut)
    }

  /** Truncate a file-maximum to a valid upper bound: take the prefix,
    * then INCREMENT its last incrementable code point (skipping the
    * surrogate gap upward — a larger bound is still a bound) and drop
    * the tail. None = no incrementable code point remains ("+∞"). */
  private[graft] def truncStatMax(s: String): Option[String] =
    if (s.length <= StatTruncLen) Some(s)
    else {
      val cps = truncStatMin(s).codePoints().toArray
      var i = cps.length - 1
      while (i >= 0 && cps(i) >= 0x10FFFF) i -= 1
      if (i < 0) None
      else {
        var next = cps(i) + 1
        if (next >= 0xD800 && next <= 0xDFFF) next = 0xE000
        Some(new String(cps, 0, i) + new String(Array(next), 0, 1))
      }
    }

  /** Stat-domain membership: the orderable types whose per-file ranges
    * the manifest can record. Floats/doubles go through the IEEE-754
    * order-preserving long encoding ([[encodeIeee]]) — the bound is the
    * exact bit pattern, nothing rounds; unbounded decimals are out (no
    * exact long). */
  private[graft] def statEncodable(
      dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType | StringType |
           FloatType | DoubleType => true
      case d: DecimalType => d.precision <= 18
      case _ => false
    }
  }

  /** Order-preserving long encoding of an IEEE-754 double (the classic
    * sign-flip trick: non-negative bit patterns already sort correctly;
    * negative doubles have INVERTED bit order, so map them below zero
    * monotonically). `-0.0` normalizes to `0.0` first (Spark's
    * comparators treat them equal — an encoding that split them could
    * tighten a bound past a matching row); NaN's canonical bit pattern
    * lands above +Infinity, matching Spark's NaN-greatest sort order,
    * so a NaN max bound stays conservative. Floats widen exactly. */
  private[graft] def encodeIeee(d: Double): Long = {
    val n = if (d == 0.0d) 0.0d else d // -0.0 == 0.0 → canonical zero
    val bits = java.lang.Double.doubleToLongBits(n) // canonicalizes NaN
    if (bits >= 0L) bits else java.lang.Long.MIN_VALUE - bits
  }

  /** Order-preserving long encoding of a collected JVM value of a
    * non-string stat-encodable column (see [[ColStat]]). Handles both
    * the java.sql and java.time families (spark.sql.datetime.java8API
    * flips which one `collect` returns). */
  private[graft] def encodeStatLong(v: Any): Long = v match {
    case d: java.sql.Date          => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate    => d.toEpochDay
    case t: java.sql.Timestamp     =>
      Math.addExact(Math.multiplyExact(t.getTime, 1000L),
        (t.getNanos / 1000) % 1000L)
    case i: java.time.Instant      => java.time.temporal.ChronoUnit.MICROS
      .between(java.time.Instant.EPOCH, i)
    case l: java.time.LocalDateTime => java.time.temporal.ChronoUnit.MICROS
      .between(java.time.Instant.EPOCH, l.toInstant(java.time.ZoneOffset.UTC))
    case b: java.math.BigDecimal   => b.unscaledValue().longValueExact()
    case b: scala.math.BigDecimal  => b.underlying.unscaledValue().longValueExact()
    case d: java.lang.Double       => encodeIeee(d.doubleValue())
    case f: java.lang.Float        => encodeIeee(f.doubleValue())
    case n: java.lang.Number       => n.longValue()
    case other => throw new IllegalArgumentException(
      s"no stat encoding for ${other.getClass.getName}")
  }

  /** Resolve a caller's range-probe bound into the stat-long domain of
    * the column's DECLARED type — the domain [[encodeStatLong]] recorded
    * at write time. This closes the silent prune-bug class where e.g. a
    * `100L` probe against a `decimal(12,2)` column compared raw against
    * unscaled-at-scale bounds (10000..) and pruned files that contain
    * matching rows. Rules:
    *  - decimal column: any numeric probe rescales to the column's
    *    scale rounding OUTWARD via `rm` (never tightens);
    *  - integral column: any numeric probe rounds outward to an exact
    *    long;
    *  - float/double column: a Float/Double probe encodes exactly; any
    *    other numeric probe converts and then widens ONE ulp outward
    *    when the conversion was inexact;
    *  - date/timestamp column: the probe must be the matching temporal
    *    family (loud beats silently-empty — the [[renderPartValue]]
    *    rule); raw epoch numbers are ambiguous and rejected;
    *  - unknown column type (legacy table without a #schema header):
    *    the historical raw [[encodeStatLong]] fallback. */
  private def probeLong(dt: Option[org.apache.spark.sql.types.DataType],
      x: Any, rm: java.math.RoundingMode): Long = {
    import org.apache.spark.sql.types._
    def big: java.math.BigDecimal = x match {
      case b: java.math.BigDecimal  => b
      case b: scala.math.BigDecimal => b.underlying
      // via toString: decimal-literal semantics (0.1 → 0.1, not the
      // binary expansion), matching what a user means by the probe
      case d: java.lang.Double      => new java.math.BigDecimal(d.toString)
      case f: java.lang.Float       => new java.math.BigDecimal(f.toString)
      case n: java.lang.Number      =>
        java.math.BigDecimal.valueOf(n.longValue())
      case other => throw new IllegalArgumentException(
        s"cannot resolve a ${other.getClass.getName} probe against a " +
          s"${dt.map(_.simpleString).getOrElse("?")} column")
    }
    dt match {
      case Some(d: DecimalType) =>
        big.setScale(d.scale, rm).unscaledValue().longValueExact()
      case Some(LongType | IntegerType | ShortType | ByteType) =>
        big.setScale(0, rm).longValueExact()
      case Some(FloatType | DoubleType) => x match {
        case d: java.lang.Double => encodeIeee(d.doubleValue())
        case f: java.lang.Float  => encodeIeee(f.doubleValue())
        case _ =>
          val b = big
          val d = b.doubleValue()
          val exact = !d.isInfinite &&
            new java.math.BigDecimal(d).compareTo(b) == 0
          val widened =
            if (exact) d
            else if (rm == java.math.RoundingMode.UNNECESSARY)
              throw new ArithmeticException(s"$b is not a double")
            else if (rm == java.math.RoundingMode.FLOOR) Math.nextDown(d)
            else Math.nextUp(d)
          encodeIeee(widened)
      }
      case Some(DateType) => x match {
        case _: java.sql.Date | _: java.time.LocalDate => encodeStatLong(x)
        case _ => throw new IllegalArgumentException(
          "date-column probes must be java.sql.Date/LocalDate (a raw " +
            "number is ambiguous — epoch-day vs millis); got " +
            x.getClass.getName)
      }
      case Some(TimestampType | TimestampNTZType) => x match {
        case _: java.sql.Timestamp | _: java.time.Instant |
             _: java.time.LocalDateTime => encodeStatLong(x)
        case _ => throw new IllegalArgumentException(
          "timestamp-column probes must be java.sql.Timestamp/Instant/" +
            "LocalDateTime (a raw number is ambiguous — micros vs " +
            "millis; a Date leaves the time-of-day bound unstated); " +
            s"got ${x.getClass.getName}")
      }
      case Some(StringType) => throw new IllegalArgumentException(
        s"string-column probes must be String; got ${x.getClass.getName}")
      case Some(other) => throw new IllegalArgumentException(
        s"no stat probes for ${other.simpleString} columns")
      case None => encodeStatLong(x) // legacy: no #schema header
    }
  }

  /** Equality-probe resolution: `Some(encoded)` when the probe is
    * EXACTLY representable in the column's stat domain, `None` when it
    * is not — in which case no stored value can compare equal under the
    * stat encoding, so a point prune must fall back to keep-everything
    * (the residual equality filter stays exact either way). */
  private def probePoint(dt: Option[org.apache.spark.sql.types.DataType],
      x: Any): Option[Long] =
    try Some(probeLong(dt, x, java.math.RoundingMode.UNNECESSARY))
    catch { case _: ArithmeticException => None }

  // manifest-safe string escaping for StrStat bounds: URL-encode (covers
  // '\t' entry separator, ':' field separator, newlines, '%'), then
  // escape the one URL-safe char the format claims — '*' marks "+∞"
  private def statEsc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("*", "%2A")
  private def statUnesc(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Manifest stat header:
    * `#filestat=<path>\t<col>:L:<min>:<max>` (long-encoded types) or
    * `#filestat=<path>\t<col>:S:<esc(min)>:<esc(maxUpper)|*>` (strings);
    * the null-aware variants `LN`/`SN` append `:<0|1>` — whether the
    * file holds any null in the column (IS NULL pruning). Legacy
    * untagged `<col>:<min>:<max>` lines still parse as L. A column that
    * is all-NULL in a file is omitted (the file is conservatively kept
    * by every prune — correct: an IS NULL probe must keep it). */
  private def statLine(path: String, stats: Seq[(String, ColStat)]) =
    s"#filestat=$path" + stats.map {
      case (c, LongStat(lo, hi, None)) => s"\t$c:L:$lo:$hi"
      case (c, LongStat(lo, hi, Some(n))) =>
        s"\t$c:LN:$lo:$hi:${if (n) 1 else 0}"
      case (c, StrStat(lo, hi, None)) =>
        s"\t$c:S:${statEsc(lo)}:${hi.map(statEsc).getOrElse("*")}"
      case (c, StrStat(lo, hi, Some(n))) =>
        s"\t$c:SN:${statEsc(lo)}:${hi.map(statEsc).getOrElse("*")}:" +
          s"${if (n) 1 else 0}"
    }.mkString

  /** Compute per-file min/max for `statCols` over freshly written
    * `files` — ONE scan of the new files only (the Delta write-time
    * stats rule: cost ∝ the commit, never the table). The collected
    * frame is bounded by the commit's file count (≤ shuffle
    * partitions per write), not by rows. */
  private def statHeaders(spark: SparkSession, dir: String,
      files: Seq[String], statCols0: Seq[String]): Seq[String] = {
    if (statCols0.isEmpty || files.isEmpty) return Seq.empty
    // stat lines record PHYSICAL names (what the files carry; identical
    // to logical on never-renamed tables) — consumers remap back
    // through fileStatsLogicalOf. Callers may pass either form: a
    // logical name maps through the colmap, a physical one is its own
    // fixed point (logical names can never shadow a physical name —
    // the toPhysical/renameColumn refusals).
    val cm = versions(spark, dir).lastOption
      .map(colmapOf(spark, dir, _)).getOrElse(Map.empty[String, String])
    val statCols = statCols0.map(c => cm.getOrElse(c, c))
    val df = spark.read.parquet(files: _*)
    statCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(statEncodable(dt),
        s"file stats support integral/float/double/date/timestamp/" +
          s"decimal(p<=18)/" +
          s"string columns; '$c' is ${dt.simpleString}")
    }
    val aggs = statCols.flatMap(c => Seq(
      min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"),
      // null PRESENCE (not count) per file — lets an IS NULL probe
      // prune a no-null file exactly; same single scan
      max(col(c).isNull).as(s"__nul_$c")))
    val rows = df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect()
    // input_file_name URIs vs manifest path strings: join on the
    // scheme-independent path (the deleteWhere normalization)
    val byPath = rows.map(r => new Path(r.getString(0)).toUri.getPath -> r).toMap
    files.flatMap { p =>
      byPath.get(new Path(p).toUri.getPath).map { r =>
        val stats: Seq[(String, ColStat)] = statCols.flatMap { c =>
          val (lo, hi) = (r.getAs[Any](s"__min_$c"), r.getAs[Any](s"__max_$c"))
          val nul = Some(r.getAs[Boolean](s"__nul_$c"))
          if (lo == null || hi == null) None
          else df.schema(c).dataType match {
            case org.apache.spark.sql.types.StringType => Some(c ->
              StrStat(truncStatMin(lo.asInstanceOf[String]),
                truncStatMax(hi.asInstanceOf[String]), nul))
            case _ => Some(c ->
              LongStat(encodeStatLong(lo), encodeStatLong(hi), nul))
          }
        }
        statLine(p, stats)
      }
      // a file absent from the scan (zero rows) gets no stat line and is
      // conservatively kept by every prune
    }
  }

  /** Stat headers for a version that CARRIES files from `prevV` and adds
    * `newFiles`: carried files keep their recorded stats verbatim, new
    * files get stats computed over the SAME column set — so zone maps
    * survive deleteWhere/optimize instead of dying at the first rewrite.
    * Empty when the previous version had no stats (nothing to keep
    * alive). */
  private def propagatedStatHeaders(spark: SparkSession, dir: String,
      prevV: Long, carried: Seq[String],
      newFiles: Seq[String]): Seq[String] = {
    val prev = fileStatsOf(spark, dir, prevV)
    if (prev.isEmpty) return Seq.empty
    val cols = prev.values.flatMap(_.keys).toSeq.distinct.sorted
    val carriedLines = carried.flatMap { p =>
      prev.get(p).filter(_.nonEmpty).map { st =>
        statLine(p, cols.flatMap(c => st.get(c).map(c -> _)))
      }
    }
    carriedLines ++ statHeaders(spark, dir, newFiles, cols)
  }

  /** [[commit]] with per-file zone-map stats for `statCols` recorded in
    * the manifest, enabling [[readBetween]] to skip files at PLANNING
    * time — before any parquet footer opens. At 100 TB the difference
    * is real: footer min/max still costs one open per file; manifest
    * stats cost one small-file read per TABLE. Pair with a
    * range-clustered write (repartitionByRange + sortWithinPartitions
    * on the stat column, or [[optimize]] clustering) — stats on a
    * randomly-laid-out table prune nothing. */
  def commitWithStats(spark: SparkSession, dir: String, df: DataFrame,
      statCols: Seq[String]): Long = {
    val commitId = java.util.UUID.randomUUID().toString
    var files: Seq[String] = null
    var validated: Option[Seq[(String, String)]] = None
    while (true) {
      // same metadata base-check + ride-the-write validation as [[commit]]
      val latest = versions(spark, dir).lastOption
      val checks = latest.map(checksOf(spark, dir, _)).getOrElse(Seq.empty)
      if (files == null) {
        val (wired, assertChecks) =
          observedChecks(df, checks, commitId, s"commit into $dir")
        files = writeData(spark, dir, wired, commitId)
        assertChecks()
        validated = Some(checks)
      } else if (!validated.contains(checks)) {
        requireChecksPass(checks, df, s"commit into $dir")
        validated = Some(checks)
      }
      commitFiles(spark, dir, files, commitId,
        header = Seq(schemaHeader(df.schema)) ++
          statHeaders(spark, dir, files, statCols) ++ checkHeaders(checks) ++
          watermarkHeader(spark, dir),
        base = Some(latest)) match {
        case Some(v) => return v
        case None    => () // raced — re-read the carried metadata
      }
    }
    -1L // unreachable
  }

  /** RESTORE as a commit (the Delta `RESTORE TABLE ... TO VERSION`
    * verb): re-publish version `toV`'s exact file list, schema and
    * zone-map stats as the NEW latest version — an undo that shares
    * every data file by reference, writes nothing but a manifest, and
    * keeps the botched versions readable for forensics until vacuumed.
    * Fails loudly if `toV` is not retained. Base-checked: a commit
    * racing the restore wins and the caller decides whether the
    * rollback still applies (an undo computed against a stale latest
    * must not silently clobber newer data). */
  def restore(spark: SparkSession, dir: String, toV: Long): Long = {
    val vs = versions(spark, dir)
    require(vs.contains(toV),
      s"cannot restore to version $toV; have ${vs.mkString(",")}")
    val latest = vs.last
    if (toV == latest) return latest // already there
    val files = filesOf(spark, dir, toV)
    val header = manifestLines(spark, dir, toV)
      .filter(l => l.startsWith("#schema=") || l.startsWith("#filestat=") ||
        l.startsWith("#dv=") || // dropping the DV would resurrect deletes
        l.startsWith("#check=") || // constraints travel with the table state
        l.startsWith("#partition=") || l.startsWith("#filepart="))
    // column mapping rolls back WITH the state (the restored version's
    // schema names need the restored colmap — chained renames would
    // otherwise mis-resolve), emitted EXPLICITLY (possibly empty) so
    // commitFiles' auto-carry of the newer mapping is suppressed.
    // Burned physical names are MONOTONE: later drops' storage names
    // stay reserved even after the rollback (their bytes are still in
    // files other retained versions reference).
    val mapHeader = colmapHeaders(colmapOf(spark, dir, toV),
      droppedOf(spark, dir, toV) ++ droppedOf(spark, dir, latest))
    // table properties roll back with the state — explicit (possibly
    // empty) header suppresses the auto-carry of newer properties
    val propHeader = tblpropHeader(tablePropertiesOf(spark, dir, toV))
    commitFiles(spark, dir, files, java.util.UUID.randomUUID().toString,
      header = header ++ mapHeader ++ Seq(propHeader) ++
        watermarkHeader(spark, dir),
      base = Some(Some(latest)))
      .getOrElse(throw new IllegalStateException(
        s"restore to v$toV lost a race with a concurrent commit on $dir — " +
          "re-examine the new latest before retrying the rollback"))
  }

  /** ANALYZE TABLE as a commit: re-publish the latest version's EXACT
    * file list (shared 100% by reference — zero data written) with
    * freshly computed zone-map stats for `statCols`, so an existing
    * table retroactively gains planning-time file skipping
    * ([[readBetween]], [[merge]]'s fast path) without waiting for its
    * next [[commitWithStats]] rewrite. One scan of the table's stat
    * columns (column-pruned), one manifest write. Pair with
    * [[optimize]] clustering first — stats on a random layout prune
    * nothing. Base-checked like every read-modify-write commit: a
    * concurrent append/delete wins and analyze recomputes. */
  def analyze(spark: SparkSession, dir: String,
      statCols: Seq[String]): Long = {
    require(statCols.nonEmpty, "analyze needs at least one column")
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val files = filesOf(spark, dir, latest)
      val commitId = java.util.UUID.randomUUID().toString
      // the DV header must ride along — analyze republished the same
      // file list, and dropping the vector would resurrect MoR deletes
      val dvHeader = dvOf(spark, dir, latest).map(n => s"#dv=$n").toSeq
      commitFiles(spark, dir, files, commitId,
        header = schemaOf(spark, dir, latest).map(schemaHeader).toSeq ++
          dvHeader ++ statHeaders(spark, dir, files, statCols) ++
          propagatedPartHeaders(spark, dir, latest, files, Seq.empty) ++
          checkHeaders(checksOf(spark, dir, latest)) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => () // raced — recompute over the new latest
      }
    }
    0L // unreachable
  }

  private[graft] def fileStatsOf(spark: SparkSession, dir: String,
      v: Long): Map[String, Map[String, ColStat]] =
    manifestLines(spark, dir, v)
      .filter(_.startsWith("#filestat="))
      .map { l =>
        val parts = l.stripPrefix("#filestat=").split("\t")
        // a full ':' split is safe: statEsc URL-encodes ':' inside
        // string bounds, so field separators are unambiguous. limit -1
        // preserves TRAILING empty fields — an escaped empty-string
        // bound ('c:S:lo:' or 'c:S::') must keep its arity, or the
        // 4-ary S entry would collapse into the 3-ary legacy-long
        // pattern and throw on "S".toLong
        val stats: Map[String, ColStat] = parts.tail.map { s =>
          s.split(":", -1) match {
            case Array(c, "L", lo, hi) => c -> LongStat(lo.toLong, hi.toLong)
            case Array(c, "LN", lo, hi, n) =>
              c -> LongStat(lo.toLong, hi.toLong, Some(n == "1"))
            case Array(c, "S", lo, hi) => c -> StrStat(statUnesc(lo),
              if (hi == "*") None else Some(statUnesc(hi)))
            case Array(c, "SN", lo, hi, n) => c -> StrStat(statUnesc(lo),
              if (hi == "*") None else Some(statUnesc(hi)), Some(n == "1"))
            case Array(c, lo, hi) => // legacy untagged long entry
              c -> LongStat(lo.toLong, hi.toLong)
            case bad => throw new IllegalStateException(
              s"unparseable #filestat entry '${bad.mkString(":")}' in v$v")
          }
        }.toMap
        parts.head -> stats
      }.toMap

  /** Range read with manifest-stats file skipping: rows of `column` in
    * [lo, hi], scanning ONLY files whose recorded [min,max] intersects
    * the range (files without stats are kept — prune is always
    * conservative, the residual filter guarantees exactness). Returns
    * (frame, filesScanned, filesTotal) so callers — and the spec — can
    * hold the prune accountable. */
  def readBetween(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long,
      version: Option[Long] = None): (DataFrame, Int, Int) =
    readBetweenValues(spark, dir, column, lo, hi, version)

  /** [[readBetween]] over ANY stat-encodable bound type: pass the range
    * as the column's natural JVM values — `java.sql.Date`/`LocalDate`,
    * `Timestamp`/`Instant`, `BigDecimal`, `String`, or any integral.
    * Non-string bounds prune through the order-preserving long
    * encoding; string bounds compare in UTF-8 order against the
    * truncated [[StrStat]] range (truncation only ever widens the kept
    * set — the residual filter keeps the result exact). Decimal bounds
    * are rescaled to the column's scale OUTWARD (lo floor, hi ceiling),
    * again conservative. */
  def readBetweenValues(spark: SparkSession, dir: String, column: String,
      lo: Any, hi: Any,
      version: Option[Long] = None): (DataFrame, Int, Int) =
    readWhere(spark, dir, Seq((column, lo, hi)), version)

  /** Conjunctive multi-column pruned read — the realistic 100 TB scan
    * predicate (a date range AND a region AND an amount band in ONE
    * statement): every `(column, lo, hi)` range prunes independently
    * at manifest-parse time and a file survives only if ALL ranges
    * keep it (zone maps, truncated string ranges, and degenerate
    * partition tuples all participate per column); the fused residual
    * filter guarantees exactness. Returns (frame, filesScanned,
    * filesTotal), the [[readBetween]] accountability contract. */
  def readWhere(spark: SparkSession, dir: String,
      ranges: Seq[(String, Any, Any)],
      version: Option[Long] = None): (DataFrame, Int, Int) =
    readFilter(spark, dir,
      ranges.map { case (c, lo, hi) => Probe.Range(c, Some(lo), Some(hi)) },
      version)

  /** IN-list pruned read: rows where `column` equals ANY of `values`,
    * planning only files whose zone map admits at least one value —
    * and, when a bloom sidecar covers the version, whose bloom might
    * contain at least one ([[readPoint]]'s skip, set-wise). */
  def readIn(spark: SparkSession, dir: String, column: String,
      values: Seq[Any],
      version: Option[Long] = None): (DataFrame, Int, Int) =
    readFilter(spark, dir, Seq(Probe.In(column, values)), version)

  /** Manifest-prunable probes for [[readFilter]]. Semantics are SQL
    * three-valued: [[Probe.Range]]/[[Probe.In]] are never true on NULL
    * (a null-partition file is pruned exactly), [[Probe.IsNull]]/
    * [[Probe.NotNull]] prune by the recorded null-presence flag or the
    * partition tuple, and every stat-side decision is conservative —
    * keep when unsure; the residual filter guarantees exactness. */
  sealed trait Probe { def column: String }
  object Probe {
    /** Inclusive range; `None` = unbounded on that side (at least one
      * bound required). */
    final case class Range(column: String, lo: Option[Any], hi: Option[Any])
      extends Probe { require(lo.nonEmpty || hi.nonEmpty,
        s"range probe on '$column' needs at least one bound") }
    /** Point-set membership (`col IN (v1, v2, …)`). */
    final case class In(column: String, values: Seq[Any]) extends Probe {
      require(values.nonEmpty, s"IN probe on '$column' needs values") }
    final case class IsNull(column: String) extends Probe
    final case class NotNull(column: String) extends Probe
  }

  /** General pruned read: a conjunction of [[Probe]]s, each pruning
    * independently at manifest-parse time — range probes against zone
    * maps, IN probes against zone maps AND bloom sidecars (a file is
    * kept only if SOME value survives both), IS NULL against the
    * recorded per-file null-presence flag, all four against the
    * partition tuple. Files without the relevant stat are kept
    * conservatively; the fused residual filter guarantees exactness.
    * Returns (frame, filesScanned, filesTotal). */
  def readFilter(spark: SparkSession, dir: String, probes: Seq[Probe],
      version: Option[Long] = None): (DataFrame, Int, Int) =
    readFilterImpl(spark, dir, probes, version, None)

  /** [[readFilter]] from a SQL predicate string: the predicate is
    * parsed, its prunable conjuncts (`BETWEEN`/comparisons, `IN`, `=`,
    * `IS [NOT] NULL`) become [[Probe]]s — string literals coerced under
    * each column's declared type — and the WHOLE original predicate
    * applies as the residual filter, so the result is exact regardless
    * of what pruned.
    *
    * OR trees prune PER DISJUNCT (round 10): the predicate lowers to a
    * conjunction of disjunctions of probe sets — a file survives when
    * every top-level conjunct has SOME disjunct whose probes all keep
    * it — so the retention-scan shape `day < a OR day > b` scans the
    * union of the two ranges' file sets instead of everything, and
    * `region = 'EU' AND (day < a OR day > b)` intersects on top.
    * A disjunct yielding no probes (a function call, a two-column
    * comparison) keeps all files for its conjunct — conservative, and
    * the residual filter still guarantees exactness. */
  def readFilterSql(spark: SparkSession, dir: String, predicate: String,
      version: Option[Long] = None): (DataFrame, Int, Int) = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val v = version.getOrElse(vs.last)
    val schema = schemaOf(spark, dir, v)
    val parsed = spark.sessionState.sqlParser.parseExpression(predicate)
    readFilterCnf(spark, dir, cnfProbes(parsed, schema), version,
      expr(predicate))
  }

  /** Lower a parsed predicate to pruning form: top-level AND-split,
    * then each conjunct OR-split, then each disjunct through
    * [[probesFromExpr]] — a conjunction of disjunctions of probe
    * conjunctions. */
  private[graft] def cnfProbes(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      schema: Option[StructType]): Seq[Seq[Seq[Probe]]] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def conjuncts(x: ce.Expression): Seq[ce.Expression] = x match {
      case ce.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other        => Seq(other)
    }
    def disjuncts(x: ce.Expression): Seq[ce.Expression] = x match {
      case ce.Or(l, r) => disjuncts(l) ++ disjuncts(r)
      case other       => Seq(other)
    }
    conjuncts(e).map(c => disjuncts(c).map(d => probesFromExpr(d, schema)))
  }

  /** Extract prunable [[Probe]]s from a parsed (unresolved) predicate:
    * AND-split, then per conjunct map `IN`/`=`/`IS [NOT] NULL` and
    * one-sided comparisons onto probes. Strict inequalities prune with
    * inclusive bounds (conservative — never drops a matching file).
    * Anything else — OR trees, function calls, column-to-column
    * comparisons — contributes no probe; the caller's residual filter
    * covers it. String literals against date/timestamp/decimal/integral
    * columns coerce to the column's JVM probe family (the SQL-surface
    * affordance; the typed Scala API stays loud on mismatches). */
  private[graft] def probesFromExpr(e: org.apache.spark.sql.catalyst.expressions.Expression,
      schema: Option[StructType]): Seq[Probe] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def attrName(x: ce.Expression): Option[String] = x match {
      case a: UnresolvedAttribute => Some(a.name)
      case _ => None
    }
    // a literal (or foldable cast of one) as an external JVM value,
    // coerced under the column's declared type when it arrives as a
    // bare SQL string ('2024-03-01' against a date column)
    def const(c: String, x: ce.Expression): Option[Any] =
      if (!x.foldable) None
      else Option(org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(x.eval(), x.dataType)).map(coerceProbe(c, _, schema))
    def all(c: String, xs: Seq[ce.Expression]): Option[Seq[Any]] = {
      val cs = xs.map(const(c, _))
      if (cs.forall(_.isDefined)) Some(cs.map(_.get)) else None
    }
    def conjuncts(x: ce.Expression): Seq[ce.Expression] = x match {
      case ce.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other        => Seq(other)
    }
    conjuncts(e).flatMap {
      case ce.In(a, vs) => for { c <- attrName(a); xs <- all(c, vs) }
        yield Probe.In(c, xs)
      // the parser leaves BETWEEN as the unresolved 'between' function
      // (resolved later to the RuntimeReplaceable Between node) — both
      // shapes map to an inclusive range
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("between") &&
            f.arguments.length == 3 && attrName(f.arguments.head).isDefined =>
        for { c <- attrName(f.arguments.head)
              l <- const(c, f.arguments(1)); h <- const(c, f.arguments(2)) }
          yield Probe.Range(c, Some(l), Some(h))
      case ce.Between(a, lo, hi, _) if attrName(a).isDefined =>
        for { c <- attrName(a); l <- const(c, lo); h <- const(c, hi) }
          yield Probe.Range(c, Some(l), Some(h))
      case ce.EqualTo(a, v) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) } yield Probe.In(c, Seq(x))
      case ce.EqualTo(v, a) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) } yield Probe.In(c, Seq(x))
      case ce.IsNull(a)    => attrName(a).map(Probe.IsNull)
      case ce.IsNotNull(a) => attrName(a).map(Probe.NotNull)
      case ce.GreaterThanOrEqual(a, v) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) }
          yield Probe.Range(c, Some(x), None)
      case ce.GreaterThan(a, v) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) }
          yield Probe.Range(c, Some(x), None)
      case ce.LessThanOrEqual(a, v) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) }
          yield Probe.Range(c, None, Some(x))
      case ce.LessThan(a, v) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) }
          yield Probe.Range(c, None, Some(x))
      // reversed one-sided comparisons: `lit OP col` flips the bound
      case ce.GreaterThanOrEqual(v, a) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) }
          yield Probe.Range(c, None, Some(x))
      case ce.GreaterThan(v, a) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) }
          yield Probe.Range(c, None, Some(x))
      case ce.LessThanOrEqual(v, a) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) }
          yield Probe.Range(c, Some(x), None)
      case ce.LessThan(v, a) if attrName(a).isDefined =>
        for { c <- attrName(a); x <- const(c, v) }
          yield Probe.Range(c, Some(x), None)
      case _ => None // unprunable conjunct — residual-only
    }
  }

  /** Resolve a predicate/probe column against the declared schema under
    * the session's resolver (case-INsensitive unless
    * spark.sql.caseSensitive): returns the DECLARED field name — the
    * key every stat/bloom/partition lookup uses — or None when the
    * schema lacks the column (callers keep conservatively; the residual
    * filter, which resolves under the same session rules, decides). */
  private def resolveCol(schema: Option[StructType],
      c: String): Option[String] = schema.flatMap { st =>
    val res = org.apache.spark.sql.internal.SQLConf.get.resolver
    st.fields.collectFirst { case f if res(f.name, c) => f.name }
  }

  /** SQL-surface string→typed coercion for [[probesFromExpr]]: a bare
    * string literal against a non-string column parses under the
    * column's declared type (ISO date/timestamp, decimal, integral);
    * unparseable values throw loudly (never a silent empty result).
    * Column resolution follows the session's case-sensitivity rules. */
  private def coerceProbe(c: String, v: Any,
      schema: Option[StructType]): Any = {
    import org.apache.spark.sql.types._
    (v, resolveCol(schema, c).flatMap(n =>
      schema.flatMap(_.fields.find(_.name == n))).map(_.dataType)) match {
      case (s: String, Some(DateType)) => java.sql.Date.valueOf(s)
      case (s: String, Some(TimestampType | TimestampNTZType)) =>
        java.sql.Timestamp.valueOf(s)
      case (s: String, Some(_: DecimalType)) => new java.math.BigDecimal(s)
      case (s: String, Some(LongType | IntegerType | ShortType | ByteType)) =>
        java.lang.Long.parseLong(s)
      case (s: String, Some(FloatType | DoubleType)) =>
        java.lang.Double.valueOf(s)
      case _ => v
    }
  }

  private def readFilterImpl(spark: SparkSession, dir: String,
      probes: Seq[Probe], version: Option[Long],
      residual: Option[Column]): (DataFrame, Int, Int) = {
    require(probes.nonEmpty || residual.nonEmpty,
      "readFilter needs at least one probe")
    val pred = residual.getOrElse(probes.map {
      case Probe.Range(c, lo, hi) =>
        (lo.map(col(c) >= lit(_)) ++ hi.map(col(c) <= lit(_)))
          .reduce(_ && _)
      case Probe.In(c, vs)   => col(c).isin(vs: _*)
      case Probe.IsNull(c)   => col(c).isNull
      case Probe.NotNull(c)  => col(c).isNotNull
    }.reduce(_ && _))
    // a plain conjunction is the 1-disjunct-per-conjunct CNF
    readFilterCnf(spark, dir, probes.map(p => Seq(Seq(p))), version, pred)
  }

  /** Pruning core over a conjunction of disjunctions of probe
    * conjunctions (see [[cnfProbes]]): a file is kept when EVERY
    * top-level conjunct has SOME disjunct whose probes ALL keep it.
    * An empty disjunct (unprunable expression) keeps all files for its
    * conjunct; `residualPred` applies in full, so the result is exact
    * regardless of what pruned. */
  private def readFilterCnf(spark: SparkSession, dir: String,
      cnf0: Seq[Seq[Seq[Probe]]], version: Option[Long],
      residualPred: Column): (DataFrame, Int, Int) = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v of $dir does not exist (have ${vs.mkString(",")})")
    val schema = schemaOf(spark, dir, v)
    val files = filesOf(spark, dir, v)
    val kept = pruneFilesCnf(spark, dir, v, cnf0)
    val pred = residualPred
    val df =
      if (kept.nonEmpty) readFiles(spark, dir, v, kept).filter(pred)
      else schema match {
        // every file pruned: an empty frame with the version's schema
        case Some(s) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
        case None => read(spark, dir, Some(v)).filter(pred).limit(0)
      }
    (df, kept.size, files.size)
  }

  /** The manifest-grain KEEP decision alone: the subset of version `v`'s
    * files some row of which COULD satisfy the CNF (zone maps ∧ bloom
    * sidecars ∧ partition tuples ∧ null-presence flags, each
    * conservative). This is [[readFilterCnf]]'s core without the read —
    * what the rewriting verbs use to pre-prune their affected-file
    * detection scans. */
  private[graft] def pruneFilesCnf(spark: SparkSession, dir: String,
      v: Long, cnf0: Seq[Seq[Seq[Probe]]]): Seq[String] = {
    val files = filesOf(spark, dir, v)
    val stats = fileStatsLogicalOf(spark, dir, v) // probes use logical names
    val schema = schemaOf(spark, dir, v)
    // canonicalize probe columns to their DECLARED names under the
    // session resolver (case-insensitive by default): stat, bloom and
    // partition lookups key on the declared name, and a case-mismatched
    // SQL predicate must PRUNE, not throw
    val cnf: Seq[Seq[Seq[Probe]]] = cnf0.map(_.map(_.map { p =>
      resolveCol(schema, p.column) match {
        case Some(n) if n != p.column => p match {
          case Probe.Range(_, lo, hi) => Probe.Range(n, lo, hi)
          case Probe.In(_, xs)        => Probe.In(n, xs)
          case Probe.IsNull(_)        => Probe.IsNull(n)
          case Probe.NotNull(_)       => Probe.NotNull(n)
        }
        case _ => p
      }
    }))
    val flatProbes = cnf.flatten.flatten
    val pcs = partitionColsOf(spark, dir, v)
    val parts = if (flatProbes.exists(pr => pcs.contains(pr.column)))
      filePartsOf(spark, dir, v) else Map.empty[String, Map[String, String]]
    // bloom sidecars participate only for IN probes (point-set skipping,
    // the readPoint rule set-wise) — one sidecar read, filtered to the
    // probed columns
    val inCols = flatProbes.collect { case Probe.In(c, _) => c }.distinct
    val blooms: Map[(String, String), Array[Byte]] =
      if (inCols.isEmpty || !fs(spark, dir).exists(bloomPath(dir, v)))
        Map.empty
      else spark.read.parquet(bloomPath(dir, v).toString)
        .filter(col("col").isin(inCols: _*))
        .collect()
        .map(r => (new Path(r.getString(0)).toUri.getPath, r.getString(1)) ->
          r.getAs[Array[Byte]]("bloom")).toMap

    // non-throwing: a column the schema lacks (or a legacy schemaless
    // table) keeps files conservatively — the residual filter decides
    def colDtOf(c: String) =
      schema.flatMap(_.fields.find(_.name == c)).map(_.dataType)
    def partValsOf(c: String): Map[String, String] =
      if (!pcs.contains(c)) Map.empty
      else parts.flatMap { case (p, t) => t.get(c).map(p -> _) }

    // per-probe file predicate: recorded stat ∧ bloom ∧ degenerate
    // partition tuple, each conservative
    def probeKeep(probe: Probe): String => Boolean = probe match {
      case Probe.Range(column, lo, hi) =>
        val colDt = colDtOf(column)
        val isStr = colDt.contains(org.apache.spark.sql.types.StringType) ||
          lo.exists(_.isInstanceOf[String]) || hi.exists(_.isInstanceOf[String])
        val keep: ColStat => Boolean =
          if (isStr) {
            def s(b: Option[Any], side: String): Option[String] = b.map {
              case x: String => x
              case other => throw new IllegalArgumentException(
                s"string-column probes must be String; $side bound of " +
                  s"'$column' is ${other.getClass.getName}")
            }
            val (l, h) = (s(lo, "lo"), s(hi, "hi"))
            st => st match {
              case StrStat(mn, mxOpt, _) =>
                l.forall(lb => mxOpt.forall(mx => utf8Cmp(mx, lb) >= 0)) &&
                h.forall(hb => utf8Cmp(mn, hb) <= 0)
              case _ => true
            }
          } else {
            // every bound resolves into the COLUMN's stat domain
            // (outward rounding — never tightens); mismatched probe
            // families throw loudly rather than silently mis-prune
            val el = lo.map(probeLong(colDt, _, java.math.RoundingMode.FLOOR))
            val eh = hi.map(probeLong(colDt, _, java.math.RoundingMode.CEILING))
            st => st match {
              case LongStat(mn, mx, _) =>
                el.forall(mx >= _) && eh.forall(mn <= _)
              case _ => true
            }
          }
        // a PARTITION column's value is a degenerate [v, v] zone map
        // decoded under the column's type; a null-partition file is
        // pruned EXACTLY (a range predicate is never true on NULL); an
        // undecodable value keeps the file conservatively
        val partVals = partValsOf(column)
        def keepByPart(raw: String): Boolean =
          if (raw == NullPartition) false
          else colDt.flatMap(decodePartValue(raw, _)) match {
            case Some(x: String) => keep(StrStat(x, Some(x)))
            case Some(x)         =>
              val e = encodeStatLong(x); keep(LongStat(e, e))
            case None            => true
          }
        p => {
          val byStat = stats.get(p).flatMap(_.get(column)) match {
            case Some(st) => keep(st)
            case None     => true
          }
          byStat && partVals.get(p).forall(keepByPart)
        }

      case Probe.In(column, values) =>
        val colDt = colDtOf(column)
        val isStr = colDt.contains(org.apache.spark.sql.types.StringType) ||
          values.exists(_.isInstanceOf[String])
        // stat keep: SOME value inside [min,max]. A value not EXACTLY
        // representable in the column's stat domain might still compare
        // equal under Spark's comparison coercion — it disables stat
        // and bloom pruning (keep-everything, the readPoint rule).
        val strVals: Seq[String] =
          if (!isStr) Seq.empty
          else values.map {
            case s: String => s
            case other => throw new IllegalArgumentException(
              s"string-column probes must be String; IN value for " +
                s"'$column' is ${other.getClass.getName}")
          }
        val encVals: Option[Seq[Long]] =
          if (isStr) None
          else {
            val es = values.map(probePoint(colDt, _))
            if (es.forall(_.isDefined)) Some(es.map(_.get)) else None
          }
        val statKeep: ColStat => Boolean =
          if (isStr) {
            case StrStat(mn, mxOpt, _) => strVals.exists(v =>
              utf8Cmp(mn, v) <= 0 && mxOpt.forall(mx => utf8Cmp(mx, v) >= 0))
            case _ => true
          } else encVals match {
            case Some(es) => {
              case LongStat(mn, mx, _) => es.exists(e => e >= mn && e <= mx)
              case _ => true
            }
            case None => _ => true // some value inexact — cannot prune
          }
        // bloom keep: SOME value might be contained (files without a
        // bloom — or inexact values — keep conservatively)
        val bloomKeep: String => Boolean =
          if (blooms.isEmpty || (!isStr && encVals.isEmpty)) _ => true
          else p => blooms.get((new Path(p).toUri.getPath, column)) match {
            case Some(bytes) =>
              val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
              if (isStr) strVals.exists(bf.mightContainString)
              else encVals.get.exists(bf.mightContainLong)
            case None => true
          }
        // partition keep: rendered equality against ANY value (the
        // readPoint rule); NullPartition never matches (IN is never
        // true on NULL)
        val partVals = partValsOf(column)
        lazy val rendered = values.map(renderPartValue)
        p => {
          val byStat = stats.get(p).flatMap(_.get(column)) match {
            case Some(st) => statKeep(st)
            case None     => true
          }
          byStat && bloomKeep(p) &&
            partVals.get(p).forall(raw => rendered.contains(raw))
        }

      case Probe.IsNull(column) =>
        // a recorded nulls=false flag prunes EXACTLY; legacy stats
        // (no flag) and stat-less files keep. An all-NULL column has
        // no stat line at all — kept, as it must be. A non-null
        // partition tuple prunes exactly; the null partition keeps.
        val partVals = partValsOf(column)
        p => {
          val byStat = stats.get(p).flatMap(_.get(column)) match {
            case Some(st) => st.nulls.getOrElse(true)
            case None     => true
          }
          byStat && partVals.get(p).forall(_ == NullPartition)
        }

      case Probe.NotNull(column) =>
        // stats cannot distinguish an all-NULL column (line omitted)
        // from an un-analyzed one — only the partition tuple prunes
        // (exactly: every row of a null-partition file IS null here)
        val partVals = partValsOf(column)
        p => partVals.get(p).forall(_ != NullPartition)
    }

    // CNF evaluation: ∀ conjunct ∃ disjunct ∀ probe — an empty
    // disjunct list cannot occur (disjuncts of a conjunct are ≥1) and
    // an empty PROBE list inside a disjunct keeps the file (vacuous
    // forall), which is exactly the conservative semantics for an
    // unprunable disjunct
    val keeps: Seq[Seq[Seq[String => Boolean]]] =
      cnf.map(_.map(_.map(probeKeep)))
    files.filter(p => keeps.forall(_.exists(_.forall(_(p)))))
  }

  /** Manifest-grain pre-prune for the rewriting verbs' affected-file
    * DETECTION scans: the subset of `v`'s files that could hold a row
    * matching `pred` (everything else is provably carry-by-reference
    * without opening a footer). Strictly an OPTIMIZATION: any failure
    * to lower the predicate — unprunable shapes, probe-family
    * mismatches the SQL surface would refuse loudly — falls back to
    * all files, never fails the verb. */
  private[graft] def detectionCandidates(spark: SparkSession, dir: String,
      v: Long, pred: Column): Seq[String] =
    try {
      import org.apache.spark.sql.catalyst.{expressions => ce}
      import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
      // a Column-DSL tree carries its operators as UnresolvedFunctions
      // (`>=`('k, 3500)) until ANALYSIS — normalize the comparison /
      // boolean shells to the catalyst nodes the probe lowering
      // matches; anything unmapped stays opaque = unprunable =
      // conservative. Resolved attribute refs re-bind by name.
      val e = org.apache.spark.sql.graftshim.ColumnBridge
        .eagerExpression(pred).transformUp {
          case a: ce.AttributeReference => UnresolvedAttribute.quoted(a.name)
          case f: UnresolvedFunction if f.nameParts.length == 1 =>
            (f.nameParts.head.toLowerCase(java.util.Locale.ROOT),
              f.arguments) match {
              case (">=", Seq(l, r))       => ce.GreaterThanOrEqual(l, r)
              case ("<=", Seq(l, r))       => ce.LessThanOrEqual(l, r)
              case (">", Seq(l, r))        => ce.GreaterThan(l, r)
              case ("<", Seq(l, r))        => ce.LessThan(l, r)
              case ("=" | "==", Seq(l, r)) => ce.EqualTo(l, r)
              case ("and", Seq(l, r))      => ce.And(l, r)
              case ("or", Seq(l, r))       => ce.Or(l, r)
              case ("not", Seq(x))         => ce.Not(x)
              case ("isnull", Seq(x))      => ce.IsNull(x)
              case ("isnotnull", Seq(x))   => ce.IsNotNull(x)
              case ("in", l +: rest) if rest.nonEmpty => ce.In(l, rest)
              case _                       => f
            }
        }
      val cnf = cnfProbes(e, schemaOf(spark, dir, v))
      // nothing prunable anywhere → skip the stat parse entirely
      if (cnf.forall(_.exists(_.isEmpty))) filesOf(spark, dir, v)
      else pruneFilesCnf(spark, dir, v, cnf)
    } catch {
      case scala.util.control.NonFatal(e) =>
        // conservative fallback is CORRECT (full detection scan), but a
        // systematically failing probe lowering must not hide as a
        // permanent full-detection slowdown — say so once per call
        logWarning("detectionCandidates: probe lowering failed for " +
          s"$dir v$v — falling back to full detection scan " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage})")
        filesOf(spark, dir, v)
    }

  // -------------------------------------------------------------------
  // Merge-on-read DELETION VECTORS — O(matches) deletes, no file rewrite
  // -------------------------------------------------------------------

  /** The DV sidecar a version references, if any (`#dv=<name>` header;
    * sidecars live under `_log/dv/` with version-independent uuid names
    * so the claim protocol never needs to know its version number before
    * writing). */
  private[sources] def dvOf(spark: SparkSession, dir: String,
      v: Long): Option[String] =
    manifestLines(spark, dir, v)
      .collectFirst { case l if l.startsWith("#dv=") => l.stripPrefix("#dv=") }

  private def dvPath(dir: String, name: String) =
    new Path(logDir(dir), s"dv/$name")

  // --- DV sidecar format -----------------------------------------------
  // Round 9 stores ONE 64-bit roaring bitmap per file — (path: string,
  // bitmap: binary) — the Delta deletion-vector shape: a billion-row MoR
  // delete serializes to KBs per file instead of a billion
  // (path, row_index) parquet rows. The legacy row-per-position shape
  // (path, row_index) stays readable: every consumer goes through
  // [[dvRaw]] (path-grain work — prunes, compaction — needs no
  // expansion) or [[dvPositions]] (join-grain work expands bitmaps in
  // memory from KBs, never re-reading positions off disk).

  private def rbmBytes(
      bm: org.roaringbitmap.longlong.Roaring64NavigableMap): Array[Byte] = {
    bm.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    bm.serialize(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }

  private def rbmFrom(
      bytes: Array[Byte]): org.roaringbitmap.longlong.Roaring64NavigableMap = {
    val bm = new org.roaringbitmap.longlong.Roaring64NavigableMap()
    bm.deserialize(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    bm
  }

  /** The sidecar as stored — bitmap-per-file (round 9) or
    * row-per-position (legacy). Both carry a `path` column, so
    * path-grain consumers need not care which. */
  private def dvRaw(spark: SparkSession, dir: String, name: String) =
    spark.read.parquet(dvPath(dir, name).toString)

  /** A version's DV as serialized per-file bitmaps, keyed by
    * URI-normalized path — for consumers that skip positions
    * file-locally without a SparkSession (the DSv2 batch scan ships
    * these KB-scale blobs inside its input partitions). Legacy
    * row-per-position sidecars fold into bitmaps here. Empty map when
    * the version carries no DV. The collect is sidecar-bounded
    * (KBs/file), never data-bounded. */
  private[sources] def dvBitmapsOf(spark: SparkSession, dir: String,
      v: Long): Map[String, Array[Byte]] =
    dvOf(spark, dir, v) match {
      case None => Map.empty
      case Some(name) =>
        val raw = dvRaw(spark, dir, name)
        if (raw.columns.contains("bitmap"))
          raw.select("path", "bitmap").collect()
            .map(r => new Path(r.getString(0)).toUri.getPath ->
              r.getAs[Array[Byte]](1)).toMap
        else
          raw.select("path", "row_index").collect()
            .groupBy(r => new Path(r.getString(0)).toUri.getPath)
            .map { case (p, rows) =>
              val bm = new org.roaringbitmap.longlong.Roaring64NavigableMap()
              rows.foreach(r => bm.addLong(r.getLong(1)))
              p -> rbmBytes(bm)
            }
    }

  /** The sidecar as the canonical positions relation
    * (path, row_index) — bitmaps expand per partition in memory. */
  private def dvPositions(spark: SparkSession, dir: String,
      name: String): DataFrame = {
    val raw = dvRaw(spark, dir, name)
    if (raw.columns.contains("row_index")) raw.select("path", "row_index")
    else {
      import spark.implicits._
      raw.select("path", "bitmap").as[(String, Array[Byte])]
        .flatMap { case (p, b) =>
          val it = rbmFrom(b).getLongIterator
          new Iterator[(String, Long)] {
            def hasNext = it.hasNext
            def next() = (p, it.next())
          }
        }.toDF("path", "row_index")
    }
  }

  /** Write `positions` (path, row_index) as a bitmap-per-file sidecar:
    * per-partition partial bitmaps OR-merge by path (the analyzeBlooms
    * pattern), so the build is one distributed pass with KB-scale
    * shuffle. */
  private def writeDvSidecar(spark: SparkSession, dir: String, name: String,
      positions: DataFrame): Unit = {
    import spark.implicits._
    val merged = positions.select("path", "row_index").as[(String, Long)]
      .rdd.mapPartitions { it =>
        val per = scala.collection.mutable.Map[String,
          org.roaringbitmap.longlong.Roaring64NavigableMap]()
        it.foreach { case (p, i) => per.getOrElseUpdate(p,
          new org.roaringbitmap.longlong.Roaring64NavigableMap()).addLong(i) }
        per.iterator.map { case (p, bm) => (p, rbmBytes(bm)) }
      }
      .reduceByKey { (a, b) =>
        val x = rbmFrom(a); x.or(rbmFrom(b)); rbmBytes(x)
      }
      .map { case (p, b) => org.apache.spark.sql.Row(p, b) }
    spark.createDataFrame(merged, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bitmap",
        org.apache.spark.sql.types.BinaryType))))
      .coalesce(1)
      .write.mode("overwrite").parquet(dvPath(dir, name).toString)
  }

  /** Read `paths` under version `v`'s schema with that version's
    * deletion vector applied (if any) — THE single read primitive
    * [[read]]/[[readBetween]]/[[readPoint]] share, so no read path can
    * resurrect deleted rows. The DV anti-join keys on the scan's own
    * `_metadata` (file_path, row_index) — deletes are sparse by
    * construction, so AQE broadcasts the DV side. */
  private def readFiles(spark: SparkSession, dir: String, v: Long,
      paths: Seq[String]): DataFrame =
    readFilesTagged(spark, dir, v, paths, None)

  /** [[readFiles]] optionally tagging each row with its source file
    * path (`tag` column, from the scan's own `_metadata` — captured AT
    * SCAN level, so it survives the DV anti-join where
    * `input_file_name()` would not if the join shuffled). The affected-
    * file detection of every rewrite verb uses the tag. */
  /** Scan `paths` under version `v`'s schema (partition columns
    * re-attached on hive layouts) with `extras` metadata-derived
    * columns — each `(name, _metadata field)` attaches AT SCAN level,
    * before any union/select hides the hidden `_metadata` struct. The
    * raw physical view: NO deletion vector applied. */
  private def scanWithMeta(spark: SparkSession, dir: String, v: Long,
      paths: Seq[String], extras: Seq[(String, String)]): DataFrame = {
    def attach(df: DataFrame): DataFrame =
      extras.foldLeft(df) { case (d, (n, m)) => d.withColumn(n, col(m)) }
    // files store PHYSICAL column names; the scan requests those and
    // aliases back to the version's LOGICAL names (identity — and
    // alias-free — on never-renamed tables). Partition columns cannot
    // be renamed, so hive dir names and manifest tuples stay literal.
    val cm = colmapOf(spark, dir, v)
    def relogical(df: DataFrame, s: StructType): DataFrame =
      if (cm.isEmpty) df
      else df.select(s.fields.toSeq.map(f =>
        col(s"`${cm.getOrElse(f.name, f.name)}`").as(f.name)) ++
        extras.map(e => col(s"`${e._1}`")): _*)
    val pcs = partitionColsOf(spark, dir, v)
    if (pcs.nonEmpty) {
      // hive-partitioned files carry the partition values in their DIR
      // names, not in the parquet: re-attach them via basePath-scoped
      // reads, grouped per commit dir (one group per contributing
      // commit — bounded by history, not by files). The version schema
      // types the partition columns; the final select restores its
      // column order.
      val s = schemaOf(spark, dir, v).getOrElse(throw new IllegalStateException(
        s"partitioned version $v of $dir lacks a #schema header"))
      val phys = physicalSchema(cm, s)
      val raw = paths.groupBy(commitRootOf).toSeq.sortBy(_._1)
        .map { case (root, ps) =>
          attach(spark.read.schema(phys).option("basePath", root)
            .parquet(ps: _*))
        }
        .reduce(_.unionByName(_))
      if (cm.isEmpty)
        raw.select((s.fieldNames.toSeq ++ extras.map(_._1)).map(col): _*)
      else relogical(raw, s)
    } else schemaOf(spark, dir, v) match {
      case Some(s) => relogical(attach(
        spark.read.schema(physicalSchema(cm, s)).parquet(paths: _*)), s)
      case None    => attach(spark.read.parquet(paths: _*))
    }
  }

  private def readFilesTagged(spark: SparkSession, dir: String, v: Long,
      paths: Seq[String], tag: Option[String]): DataFrame = {
    val dvName = dvOf(spark, dir, v)
    val extras: Seq[(String, String)] =
      tag.map(_ -> "_metadata.file_path").toSeq ++
        (if (dvName.isDefined)
          Seq("__dv_f" -> "_metadata.file_path",
            "__dv_i" -> "_metadata.row_index")
        else Seq.empty)
    val base = scanWithMeta(spark, dir, v, paths, extras)
    dvName match {
      case None => base
      case Some(name) =>
        val dv = dvPositions(spark, dir, name)
        base
          .join(dv, col("__dv_f") === col("path") &&
            col("__dv_i") === col("row_index"), "left_anti")
          .drop("__dv_f", "__dv_i")
    }
  }

  /** The `#dv=` header for a commit that REWROTE `rewritten` files of
    * version `v`: the old vector minus every entry naming a rewritten
    * file (those rows are gone physically — the rewrite read through
    * the DV, so survivors never resurrect). Entries for CARRIED files
    * stay live in a fresh uuid sidecar (the old one still serves older
    * versions until vacuumed); an emptied vector drops the header
    * entirely. Distinct DV paths are bounded by the table's file
    * count — the collect is metadata-sized. */
  private def prunedDvHeader(spark: SparkSession, dir: String, v: Long,
      rewritten: Seq[String]): Seq[String] =
    dvOf(spark, dir, v) match {
      case None => Seq.empty
      case Some(name) =>
        // path-grain surgery — works on either sidecar shape verbatim,
        // no bitmap expansion
        val dv = dvRaw(spark, dir, name)
        val gone = rewritten.map(p => new Path(p).toUri.getPath).toSet
        val dropPaths = dv.select("path").distinct().collect()
          .map(_.getString(0))
          .filter(p => gone.contains(new Path(p).toUri.getPath))
        val remaining =
          if (dropPaths.isEmpty) dv
          else dv.filter(!col("path").isin(dropPaths.toSeq: _*))
        if (remaining.isEmpty) Seq.empty
        else if (dropPaths.isEmpty) Seq(s"#dv=$name") // untouched: share it
        else {
          val newName = java.util.UUID.randomUUID().toString
          remaining.coalesce(1).write
            .parquet(dvPath(dir, newName).toString)
          Seq(s"#dv=$newName")
        }
    }

  /** The basePath partition discovery needs for a hive-layout file:
    * the longest prefix above every `c=v` segment. Works for this
    * table's own `data/<uuid>/c=v/part-*` files, for borrowed (cloned)
    * files rooted in the SOURCE table, and for EXTERNAL layouts
    * ([[commitBatchExternal]] with partitionCols) wherever the caller
    * wrote them. */
  private def commitRootOf(p: String): String = {
    val segs = p.split('/')
    var end = segs.length - 1 // the filename
    while (end > 0 && segs(end - 1).contains('=')) end -= 1
    segs.take(end).mkString("/")
  }

  private def requireNoDv(spark: SparkSession, dir: String, v: Long,
      verb: String): Unit =
    require(dvOf(spark, dir, v).isEmpty,
      s"$verb cannot run on a version carrying a deletion vector — " +
        "rewriting files while a DV references their row positions would " +
        s"resurrect deleted rows; run applyDeletionVectors($dir) first")

  /** MERGE-ON-READ targeted delete: commit a new version in which every
    * row matching `pred` is dead WITHOUT rewriting any data file — the
    * matches' (file, row_index) positions land in a deletion-vector
    * sidecar the read paths anti-apply. Returns the new version, or the
    * current one unchanged when nothing matches.
    *
    * Cost model vs [[deleteWhere]] (copy-on-write): write cost is
    * O(matched rows) — a 3-row GDPR delete against a 100 TB table
    * writes a 3-row sidecar — while every read pays one sparse anti-join
    * until [[applyDeletionVectors]] compacts. COW inverts that: the
    * delete rewrites whole files, reads stay join-free. Pick per table
    * churn; both share NULL semantics (rows where `pred` is NULL were
    * not matched and survive).
    *
    * Composition contract (round 8 — rewriting verbs now COMPOSE):
    * APPEND commits ([[commitBatch]]) carry the DV forward untouched;
    * the rewriting verbs ([[deleteWhere]], [[updateWhere]], [[merge]],
    * [[optimize]]) read THROUGH the vector (detection and rewrite — a
    * MoR-dead row can neither mark a file affected nor resurrect) and
    * commit the vector MINUS the rewritten files' entries in a fresh
    * sidecar ([[prunedDvHeader]]; the old sidecar keeps serving older
    * versions until vacuumed, an emptied vector drops the header).
    * Only [[materialize]] still refuses — run [[applyDeletionVectors]]
    * before severing a clone. Consecutive MoR deletes accumulate (new
    * sidecar = old ∪ new matches). */
  def deleteWhereMoR(spark: SparkSession, dir: String,
      pred: Column): Long = {
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val current = filesOf(spark, dir, latest)
      // matches are located on the DV-APPLIED view: a row already dead
      // in the current vector must not be re-matched (harmless but
      // inflates the sidecar); metadata rides the same scan — and the
      // scan re-attaches partition values, so a predicate on a
      // partition column matches real values, never schema-read NULLs
      val withMeta = scanWithMeta(spark, dir, latest, current,
        Seq("__dv_f" -> "_metadata.file_path",
          "__dv_i" -> "_metadata.row_index"))
      val priorDv = dvOf(spark, dir, latest)
      val alive = priorDv match {
        case None => withMeta
        case Some(name) =>
          val dv = dvPositions(spark, dir, name)
          withMeta.join(dv, col("__dv_f") === col("path") &&
            col("__dv_i") === col("row_index"), "left_anti")
      }
      val newMatches = alive.filter(coalesce(pred, lit(false)))
        .select(col("__dv_f").as("path"), col("__dv_i").as("row_index"))
      if (newMatches.isEmpty) return latest
      val cumulative = priorDv match {
        case None => newMatches
        case Some(name) => dvPositions(spark, dir, name)
          .unionByName(newMatches)
      }
      val dvName = s"${java.util.UUID.randomUUID().toString}.parquet"
      writeDvSidecar(spark, dir, dvName, cumulative)
      // recorded change feed: the newly tombstoned rows are this
      // commit's exact deletes (the DV-growth commit the append-only
      // stream must otherwise refuse)
      val changeId = java.util.UUID.randomUUID().toString
      val cfiles =
        if (!cdfEnabled(spark, dir, latest)) None
        else Some(writeChangeFiles(spark, dir,
          alive.filter(coalesce(pred, lit(false)))
            .drop("__dv_f", "__dv_i")
            .withColumn("_change_type", lit("delete")), changeId))
      val header = Seq(s"#dv=$dvName") ++
        cfiles.map(cdfHeaders).getOrElse(Seq.empty) ++
        schemaOf(spark, dir, latest).map(schemaHeader).toSeq ++
        manifestLines(spark, dir, latest).filter(l =>
          l.startsWith("#filestat=") || l.startsWith("#check=") ||
            l.startsWith("#partition=") || l.startsWith("#filepart=")) ++
        watermarkHeader(spark, dir)
      commitFiles(spark, dir, current, dvName, header = header,
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => // raced — recompute (orphan sidecar vacuumable)
          if (cfiles.isDefined) dropOrphanedChangeDir(spark, dir, changeId)
      }
    }
    -1L // unreachable
  }

  /** Compact the latest version's deletion vector away: rewrite ONLY the
    * files the DV references (survivor rows), carry every untouched file
    * by reference, and commit a DV-free version — after which the
    * rewriting verbs work again and reads drop the anti-join. Returns
    * the new version (or the current one when no DV exists). */
  def applyDeletionVectors(spark: SparkSession, dir: String): Long = {
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val name = dvOf(spark, dir, latest).getOrElse(return latest)
      val dv = dvRaw(spark, dir, name) // path-grain: either shape
      val dead = dv.select("path").distinct()
        .collect().map(r => new Path(r.getString(0)).toUri.getPath).toSet
      val current = filesOf(spark, dir, latest)
      val (rewrite, carry) = current.partition(p =>
        dead.contains(new Path(p).toUri.getPath))
      val commitId = java.util.UUID.randomUUID().toString
      val survivors = readFiles(spark, dir, latest, rewrite)
      val newFiles =
        if (survivors.isEmpty) Seq.empty
        else writeData(spark, dir, survivors, commitId,
          partitionColsOf(spark, dir, latest))
      // physically dropping already-tombstoned rows changes ZERO
      // logical rows — declare the empty change set for CDF streams
      val cdfMark =
        if (cdfEnabled(spark, dir, latest,
            requireNamesFree = false)) cdfHeaders(Seq.empty)
        else Seq.empty
      commitFiles(spark, dir, (carry ++ newFiles).sorted, commitId,
        header = schemaOf(spark, dir, latest).map(schemaHeader).toSeq ++
          cdfMark ++
          propagatedStatHeaders(spark, dir, latest, carry, newFiles) ++
          propagatedPartHeaders(spark, dir, latest, carry, newFiles) ++
          checkHeaders(checksOf(spark, dir, latest)) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => () // raced — recompute
      }
    }
    -1L // unreachable
  }

  /** TIMESTAMP AS OF resolution (the Delta time-travel twin of
    * version-numbered reads): the newest retained version whose commit
    * point — the manifest's rename mtime, the atomic visibility
    * transition by construction — is at or before `tsMillis`. Loud when
    * the table didn't exist yet at that instant (Delta's
    * "timestamp before earliest version" error): silently returning the
    * oldest version would fabricate pre-creation history. Monotonicity
    * caveat at the edges: commit mtimes come from the filesystem clock,
    * so sub-clock-resolution commits can share a timestamp — resolution
    * takes the NEWEST version at the instant, matching "the table as an
    * observer saw it then". */
  def versionAsOf(spark: SparkSession, dir: String, tsMillis: Long): Long = {
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val at = vs.filter(v =>
      f.getFileStatus(manifestPath(dir, v)).getModificationTime <= tsMillis)
    require(at.nonEmpty,
      s"no version of $dir existed at $tsMillis (earliest committed " +
        s"later); cannot time-travel before table creation")
    at.last
  }

  /** [[read]] at a point in time — `SELECT ... TIMESTAMP AS OF`. */
  def readAsOf(spark: SparkSession, dir: String, tsMillis: Long): DataFrame =
    read(spark, dir, Some(versionAsOf(spark, dir, tsMillis)))

  /** DESCRIBE HISTORY for a snapshot log: one row per retained version —
    * (version, batch_id, n_files, n_columns, has_dv, n_checks,
    * replay_mark, committed_at) —
    * read from
    * manifests alone (no data file opens; committed_at = the manifest's
    * rename time, the commit point by construction). The operational
    * "what happened to this table" view next to [[versions]]. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val f = fs(spark, dir)
    val rows = versions(spark, dir).map { v =>
      val batch = batchOf(spark, dir, v)
      val nFiles = filesOf(spark, dir, v).size.toLong
      val nCols = schemaOf(spark, dir, v).map(_.fields.length.toLong)
      val mtime = f.getFileStatus(manifestPath(dir, v)).getModificationTime
      (v, batch, nFiles, nCols, dvOf(spark, dir, v).isDefined,
        checksOf(spark, dir, v).size.toLong,
        lastBatchHeaderOf(spark, dir, v).orElse(batch),
        new java.sql.Timestamp(mtime))
    }
    import spark.implicits._
    rows.toDF("version", "batch_id", "n_files", "n_columns", "has_dv",
      "n_checks", "replay_mark", "committed_at")
  }

  /** Metadata-only maintenance ADVISOR: the latest version's
    * per-partition file census — file count, total bytes, small-file
    * count under `smallFileBytes` — with a `recommend` flag where a
    * compaction would actually act (≥2 small files to fold). One
    * manifest read plus a driver-side file-status pass over the
    * version's file list (the cost class [[optimize]]'s own detection
    * pays), zero data bytes. At 100 TB this is what a scheduler greps
    * BEFORE spending optimize passes: each recommended row maps
    * one-to-one onto a scoped `optimize(partitionScope)` / Maintain
    * `optimize ... where=col=value` invocation, so the expensive verb
    * runs only where the report says it pays. */
  def compactionReport(spark: SparkSession, dir: String,
      smallFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val latest = vs.last
    val f = fs(spark, dir)
    val pcs = partitionColsOf(spark, dir, latest)
    val parts = if (pcs.nonEmpty) filePartsOf(spark, dir, latest)
      else Map.empty[String, Map[String, String]]
    val byPart = filesOf(spark, dir, latest)
      .map { p =>
        val key =
          if (pcs.isEmpty) ""
          else {
            val t = parts.getOrElse(p, Map.empty[String, String])
            pcs.map(c => s"$c=${t.getOrElse(c, "")}").mkString("/")
          }
        key -> f.getFileStatus(new Path(p)).getLen
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (k, sized) =>
        val nSmall = sized.count(_._2 < smallFileBytes).toLong
        (k, sized.size.toLong, sized.map(_._2).sum, nSmall, nSmall >= 2)
      }
    import spark.implicits._
    byPart.toDF("partition", "n_files", "bytes", "n_small", "recommend")
  }

  // -------------------------------------------------------------------
  // Per-file bloom filters (sidecar) — point-lookup file skipping
  // -------------------------------------------------------------------

  /** Sidecar location for version `v`'s per-file blooms. Blooms live in
    * a parquet SIDECAR, not manifest header lines: a useful filter is
    * tens of KB per (file, column) — fine as one small parquet per
    * version (the Iceberg/Puffin shape), ruinous inlined into the
    * manifest every reader parses. */
  private def bloomPath(dir: String, v: Long) =
    new Path(logDir(dir), s"blooms/v$v.parquet")

  /** Compute per-file bloom filters over `bloomCols` (any
    * stat-encodable column — integrals, dates, timestamps,
    * decimal(p≤18), strings) for the LATEST version and write them as
    * that version's sidecar — the point-lookup complement of
    * [[analyze]]'s zone maps: min/max stats prune RANGE predicates on
    * clustered layouts, blooms prune EQUALITY probes on
    * high-cardinality columns under ANY layout (`fpp` trades sidecar
    * size for false-positive file reads; skipping is planning-time,
    * before any parquet footer opens). Strings hash by UTF-8 bytes
    * (`putString`); every other type hashes its order-preserving long
    * encoding — [[readPoint]] probes through the same encoding so the
    * pair can never disagree. ONE column-pruned scan of the table.
    * Blooms attach to the version — a later COW rewrite commits a new
    * version without a sidecar, and [[readPoint]] degrades to
    * conservative full planning until the next analyzeBlooms. */
  def analyzeBlooms(spark: SparkSession, dir: String,
      bloomCols: Seq[String], expectedItems: Long = 100000L,
      fpp: Double = 0.01): Long = {
    require(bloomCols.nonEmpty, "analyzeBlooms needs at least one column")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val latest = vs.last
    val files = filesOf(spark, dir, latest)
    // files carry PHYSICAL names; alias the probed columns back so the
    // sidecar records LOGICAL names (what readPoint/readFilter probe by)
    val cmB = colmapOf(spark, dir, latest)
    val raw = spark.read.parquet(files: _*)
    val df =
      if (cmB.isEmpty) raw
      else raw.select(bloomCols.map(c =>
        col(s"`${cmB.getOrElse(c, c)}`").as(c)): _*)
    bloomCols.foreach { c =>
      require(statEncodable(df.schema(c).dataType),
        "bloom columns must be integral/float/double/date/timestamp/" +
          "decimal(p<=18)/" +
          s"string; '$c' is ${df.schema(c).dataType.simpleString}")
    }
    val isStr = bloomCols.map(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType).toArray
    val n = expectedItems
    val items = df.select(
      (input_file_name().as("__f")) +: bloomCols.map(col): _*)
    val rows = items.rdd.mapPartitions { it =>
      val perFile = scala.collection.mutable.Map[
        String, Array[org.apache.spark.util.sketch.BloomFilter]]()
      it.foreach { r =>
        val bfs = perFile.getOrElseUpdate(r.getString(0),
          Array.fill(bloomCols.size)(
            org.apache.spark.util.sketch.BloomFilter.create(n, fpp)))
        var i = 0
        while (i < bloomCols.size) {
          if (!r.isNullAt(i + 1)) {
            if (isStr(i)) bfs(i).putString(r.getString(i + 1))
            else bfs(i).putLong(encodeStatLong(r.get(i + 1)))
          }
          i += 1
        }
      }
      perFile.iterator.flatMap { case (f, bfs) =>
        bloomCols.indices.map { i =>
          val bos = new java.io.ByteArrayOutputStream()
          bfs(i).writeTo(bos)
          (f, bloomCols(i), bos.toByteArray)
        }
      }
    }
    // partial blooms (same file seen by several partitions) OR-merge
    val merged = spark.createDataFrame(rows.map {
      case (f, c, b) => org.apache.spark.sql.Row(f, c, b)
    }, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("col",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bloom",
        org.apache.spark.sql.types.BinaryType))))
      .rdd.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case ((f, c), grp) =>
        val it = grp.iterator
        val first = org.apache.spark.util.sketch.BloomFilter
          .readFrom(it.next().getAs[Array[Byte]](2))
        it.foreach { r =>
          first.mergeInPlace(org.apache.spark.util.sketch.BloomFilter
            .readFrom(r.getAs[Array[Byte]](2)))
        }
        val bos = new java.io.ByteArrayOutputStream()
        first.writeTo(bos)
        org.apache.spark.sql.Row(f, c, bos.toByteArray)
      }
    spark.createDataFrame(merged,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("col",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("bloom",
          org.apache.spark.sql.types.BinaryType))))
      .coalesce(1)
      .write.mode("overwrite").parquet(bloomPath(dir, latest).toString)
    latest
  }

  /** Point lookup with bloom file skipping: rows where `column == value`
    * at `version` (default latest), scanning only files whose bloom
    * might contain the probe (files without blooms — or versions without
    * a sidecar — are kept conservatively; the residual filter guarantees
    * exactness). `value` takes the column's natural JVM type — String
    * probes hash by UTF-8 bytes, everything else resolves into the
    * COLUMN's stat domain ([[probeLong]]) — the domain
    * [[analyzeBlooms]] hashed the stored values with — so e.g. a `100L`
    * probe against a `decimal(12,2)` column hashes as unscaled `10000`,
    * never as raw `100` (which would bloom-miss every file and silently
    * return empty). A numerically INEXACT probe (`100.005` at scale 2)
    * disables bloom pruning for the lookup — no stored value can hash
    * equal, and the residual equality filter stays exact either way.
    * Mismatched temporal/string probe families throw loudly, the
    * [[readWhere]] rule. Returns (frame, filesScanned, filesTotal) for
    * accountability, the [[readBetween]] contract.
    *
    * Since round 9 this is the single-value case of [[readFilter]]'s
    * IN probe, so a point lookup also prunes by ZONE MAPS (a clustered
    * table skips on [min,max] even without a bloom sidecar) and the
    * partition tuple — one planning path for every point-set read. */
  def readPoint(spark: SparkSession, dir: String, column: String,
      value: Any, version: Option[Long] = None): (DataFrame, Int, Int) =
    readFilterImpl(spark, dir, Seq(Probe.In(column, Seq(value))), version,
      Some(col(column) === value))

  /** DRY-RUN [[vacuum]]: the point-in-time report of what a vacuum with
    * the same knobs would reclaim — one row per doomed artifact,
    * (kind, path, bytes), kind ∈ {version_manifest, bloom_sidecar,
    * dv_sidecar, data_file, change_file}. Read-only: nothing is
    * deleted, no state changes; the operator reads the blast radius
    * (and sums the bytes) BEFORE committing to retention. Mirrors
    * vacuum's decision rules exactly — VacuumPlanSpec holds the two in
    * lockstep (plan paths == the set vacuum then removes), so the
    * mirror cannot drift silently. Races: artifacts created after the
    * plan are not in it; re-plan after churn. */
  def vacuumPlan(spark: SparkSession, dir: String, keepLast: Int = 1,
      orphanGraceMs: Long = 15L * 60 * 1000,
      minAgeMs: Long = 0L): DataFrame = {
    require(keepLast >= 1, "must retain at least one version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop0, keep0) = vs.splitAt(math.max(vs.size - keepLast, 0))
    val cutoff = System.currentTimeMillis() - minAgeMs
    val (drop, young) = drop0.partition(v =>
      f.getFileStatus(manifestPath(dir, v)).getModificationTime <= cutoff)
    val keep = young ++ keep0
    val droppedRefs = drop.flatMap(filesOf(spark, dir, _)).toSet
    val droppedChangeRefs = drop
      .flatMap(v => changeFilesOf(spark, dir, v).getOrElse(Seq.empty))
      .toSet
    val out = Seq.newBuilder[(String, String, Long)]
    def len(p: Path): Long =
      try f.getFileStatus(p).getLen catch { case _: Throwable => 0L }
    drop.foreach { v =>
      out += (("version_manifest", manifestPath(dir, v).toString,
        len(manifestPath(dir, v))))
      if (f.exists(bloomPath(dir, v)))
        out += (("bloom_sidecar", bloomPath(dir, v).toString,
          len(bloomPath(dir, v))))
    }
    val dvRoot = new Path(logDir(dir), "dv")
    if (f.exists(dvRoot)) {
      val referenced = keep.flatMap(dvOf(spark, dir, _)).toSet
      f.listStatus(dvRoot).foreach { st =>
        if (!referenced(st.getPath.getName))
          out += (("dv_sidecar", st.getPath.toString, st.getLen))
      }
    }
    val live = keep.flatMap(filesOf(spark, dir, _)).toSet
    val now = System.currentTimeMillis()
    val dataRoot = new Path(dir, "data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { d =>
      val it = f.listFiles(d.getPath, true)
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile) {
          val p = s.getPath.toString
          val doomed = !live(p) && (droppedRefs(p) ||
            now - s.getModificationTime > orphanGraceMs)
          if (doomed) out += (("data_file", p, s.getLen))
        }
      }
    }
    val changesRoot = new Path(dir, "changes")
    if (f.exists(changesRoot)) {
      val liveChanges = keep
        .flatMap(v => changeFilesOf(spark, dir, v).getOrElse(Seq.empty))
        .toSet
      f.listStatus(changesRoot).foreach { d =>
        f.listStatus(d.getPath).toSeq.filter(_.isFile).foreach { s =>
          val p = s.getPath.toString
          val doomed = !liveChanges(p) && (droppedChangeRefs(p) ||
            now - s.getModificationTime > orphanGraceMs)
          if (doomed) out += (("change_file", p, s.getLen))
        }
      }
    }
    import spark.implicits._
    out.result().toDF("kind", "path", "bytes")
  }

  /** Drop all but the newest `keepLast` versions and delete every data
    * file no retained manifest references (covers crash orphans too).
    * Deletion order is crash-safe: manifests first (a version stops
    * being readable before its files vanish), then unreferenced data.
    *
    * In-flight-commit safety: a committer writes data files BEFORE its
    * manifest rename, so a file referenced by NO manifest at all may be
    * a commit in flight, not garbage. Such never-referenced files are
    * only reclaimed once older than `orphanGraceMs` (the Delta/Iceberg
    * retention-window rule); files that WERE referenced — by a manifest
    * this vacuum just dropped — are provably dead and reclaimed
    * immediately regardless of age. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1,
      orphanGraceMs: Long = 15L * 60 * 1000,
      minAgeMs: Long = 0L): (Int, Int) = {
    require(keepLast >= 1, "must retain at least one version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop0, keep0) = vs.splitAt(math.max(vs.size - keepLast, 0))
    // age-based retention (the Delta `RETAIN n HOURS` rule): a version
    // younger than minAgeMs survives even beyond keepLast, so readers
    // and time-travelers inside the retention window never lose their
    // snapshot to an eager vacuum. Age = the manifest's rename mtime,
    // the commit point ([[versionAsOf]]'s clock).
    val cutoff = System.currentTimeMillis() - minAgeMs
    val (drop, young) = drop0.partition(v =>
      f.getFileStatus(manifestPath(dir, v)).getModificationTime <= cutoff)
    val keep = young ++ keep0
    // capture dropped manifests' references BEFORE deleting them: these
    // files are known-dead (their last referencing version is going away)
    // and exempt from the orphan grace period
    val droppedRefs = drop.flatMap(filesOf(spark, dir, _)).toSet
    // dropped versions' RECORDED change files — captured before their
    // manifests go away, known-dead like droppedRefs
    val droppedChangeRefs = drop
      .flatMap(v => changeFilesOf(spark, dir, v).getOrElse(Seq.empty))
      .toSet
    drop.foreach { v =>
      f.delete(manifestPath(dir, v), false)
      f.delete(bloomPath(dir, v), true) // version-scoped bloom sidecar
    }
    // DV sidecars are uuid-named and manifest-referenced: reclaim any not
    // referenced by a RETAINED manifest (covers dropped versions, lost
    // commit races and compacted-away vectors)
    val dvRoot = new Path(logDir(dir), "dv")
    if (f.exists(dvRoot)) {
      val referenced = keep.flatMap(dvOf(spark, dir, _)).toSet
      f.listStatus(dvRoot).foreach { st =>
        if (!referenced(st.getPath.getName)) f.delete(st.getPath, true)
      }
    }
    val live = keep.flatMap(filesOf(spark, dir, _)).toSet
    val dataRoot = new Path(dir, "data")
    val now = System.currentTimeMillis()
    var removedFiles = 0
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { d =>
      // recursive: partitioned commits nest files under c=v subdirs
      val parts = {
        val buf = scala.collection.mutable.ArrayBuffer[
          org.apache.hadoop.fs.LocatedFileStatus]()
        val it = f.listFiles(d.getPath, true)
        while (it.hasNext) { val s = it.next(); if (s.isFile) buf += s }
        buf.toSeq
      }
      val (keepP, dropP) = parts.partition { s =>
        val p = s.getPath.toString
        live(p) ||
          (!droppedRefs(p) && now - s.getModificationTime <= orphanGraceMs)
      }
      dropP.foreach { s => f.delete(s.getPath, false); removedFiles += 1 }
      if (keepP.isEmpty) f.delete(d.getPath, true) // whole commit dead
    }
    // recorded change files follow the same rule: referenced by a
    // RETAINED manifest → keep; referenced only by dropped versions →
    // dead now; unreferenced (lost commit races) → grace period
    val changesRoot = new Path(dir, "changes")
    if (f.exists(changesRoot)) {
      val liveChanges = keep
        .flatMap(v => changeFilesOf(spark, dir, v).getOrElse(Seq.empty))
        .toSet
      f.listStatus(changesRoot).foreach { d =>
        val parts = f.listStatus(d.getPath).toSeq.filter(_.isFile)
        val (keepC, dropC) = parts.partition { s =>
          val p = s.getPath.toString
          liveChanges(p) || (!droppedChangeRefs(p) &&
            now - s.getModificationTime <= orphanGraceMs)
        }
        dropC.foreach { s => f.delete(s.getPath, false); removedFiles += 1 }
        if (keepC.isEmpty) f.delete(d.getPath, true)
      }
    }
    (drop.size, removedFiles)
  }

  // -------------------------------------------------------------------
  // CHECK CONSTRAINTS — commit-time row validation (Delta ADD CONSTRAINT)
  // -------------------------------------------------------------------

  /** CHECK constraints of a version, in declaration order: (name, SQL
    * expression). Recorded as `#check=<name>=<expr>` manifest headers,
    * carried by every commit verb like the schema — a constraint is
    * table state, not a side register. */
  def checksOf(spark: SparkSession, dir: String,
      v: Long): Seq[(String, String)] =
    manifestLines(spark, dir, v).collect {
      case l if l.startsWith("#check=") =>
        val body = l.stripPrefix("#check=")
        val i = body.indexOf('=')
        (body.take(i), body.drop(i + 1))
    }

  private def checkHeaders(checks: Seq[(String, String)]): Seq[String] =
    checks.map { case (n, s) => s"#check=$n=$s" }

  /** The latest version's checks — what an incoming commit must honor
    * (empty for a fresh table). */
  private def carriedChecks(spark: SparkSession,
      dir: String): Seq[(String, String)] =
    versions(spark, dir).lastOption
      .map(checksOf(spark, dir, _)).getOrElse(Seq.empty)

  /** Enforce `checks` on `df` — ONE fused aggregation over the commit's
    * rows (the [[graft.Expectations]] cost rule: never a pass per
    * check), loud failure naming every violated constraint with its
    * violation count, nothing committed on failure. SQL CHECK
    * three-valued logic: a row violates only when the expression is
    * definitely FALSE — NULL passes (declare a `col IS NOT NULL` check
    * to forbid nulls), matching Delta/ANSI CHECK semantics. */
  private def requireChecksPass(checks: Seq[(String, String)],
      df: DataFrame, what: String): Unit = {
    if (checks.isEmpty) return
    val aggs = checks.zipWithIndex.map { case ((_, s), i) =>
      sum(when(coalesce(expr(s), lit(true)) === false, 1L)
        .otherwise(0L)).as(s"__c$i")
    }
    val row =
      try df.agg(aggs.head, aggs.tail: _*).collect()(0)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"CHECK constraint references a column absent from $what — " +
              "widen the batch or drop the constraint first: " +
              e.getMessage)
      }
    val viols = checks.zipWithIndex.flatMap { case ((n, s), i) =>
      val c = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (c > 0) Some(s"$n ($s): $c row(s)") else None
    }
    require(viols.isEmpty,
      s"CHECK constraint violated by $what: ${viols.mkString("; ")}")
  }

  /** Free-ride form of [[requireChecksPass]] for verbs that WRITE `df`:
    * the violation counts ride the write action itself via
    * `Dataset.observe` (the [[graft.sources.Observe]] recipe — zero
    * extra passes over the input, where the dedicated pass costs one
    * full read per constrained commit at 100 TB). Returns the
    * instrumented frame plus a thunk to call AFTER the write: it throws
    * the same loud per-constraint report on violation. Refusal then
    * leaves the just-written files as unreferenced orphans (no manifest
    * ever names them — invisible by construction) for the grace-period
    * vacuum, the documented orphan class of every lost-race write. */
  private def observedChecks(df: DataFrame, checks: Seq[(String, String)],
      commitId: String, what: String): (DataFrame, () => Unit) = {
    if (checks.isEmpty) return (df, () => ())
    val obs = new org.apache.spark.sql.Observation(s"graft-checks-$commitId")
    val aggs = checks.zipWithIndex.map { case ((_, s), i) =>
      sum(when(coalesce(expr(s), lit(true)) === false, 1L)
        .otherwise(0L)).as(s"__c$i")
    }
    // a check referencing a column the batch LACKS must refuse here, not
    // slip through: the batch's files would read typed nulls in that
    // column after the schema merge, i.e. rows the constraint forbids
    val wired =
      try df.observe(obs, aggs.head, aggs.tail: _*)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"CHECK constraint references a column absent from $what — " +
              "widen the batch or drop the constraint first: " +
              e.getMessage)
      }
    (wired, () => {
      val m = obs.get
      val viols = checks.zipWithIndex.flatMap { case ((n, s), i) =>
        val c = Option(m(s"__c$i")).map(_.asInstanceOf[Long]).getOrElse(0L)
        if (c > 0) Some(s"$n ($s): $c row(s)") else None
      }
      require(viols.isEmpty,
        s"CHECK constraint violated by $what: ${viols.mkString("; ")}")
    })
  }

  /** ADD CONSTRAINT as a commit: validate that `sqlExpr` already HOLDS
    * on the table (one scan — a constraint that existing data violates
    * would make every future commit of those rows unreproducible), then
    * re-publish the latest version's exact file list with the new
    * `#check=` header — zero data written, base-checked like every
    * read-modify-write commit. Every subsequent row-adding verb
    * ([[commit]], [[commitBatch]], [[commitBatchReplace]],
    * [[commitBatchExternal]], [[merge]]) validates its incoming rows in
    * one fused aggregation and refuses the whole commit on violation —
    * and for the df-writing verbs the aggregation RIDES THE WRITE
    * ([[observedChecks]]), so a constrained ingest pays zero extra
    * passes over its input.
    * [[restore]] rolls back table STATE — data and metadata together —
    * so restoring to a pre-constraint version drops the constraint
    * (Delta semantics; MaintainSpec pins it). */
  /** `ALTER TABLE ... ADD COLUMNS` as a METADATA-ONLY commit: the new
    * version carries the latest file list unchanged under a WIDENED
    * schema header — no data is written or rewritten. Older files (and
    * every older version) simply lack the columns, so they read back as
    * typed NULLs (the same [[mergeSchemas]] evolution rule a widening
    * data commit uses) — or, when a field carries `CURRENT_DEFAULT`
    * metadata (`ADD COLUMN ... DEFAULT <expr>`), as the frozen folded
    * EXISTS_DEFAULT ([[alterCommit]]'s validation + every scan path's
    * file-missing-column fill); the next write carries them for real.
    * Added columns must be nullable, names must be fresh, and
    * everything else the manifest tracks (stats, DV, partition layout,
    * CHECK constraints, replay watermark) is carried forward verbatim —
    * the [[addCheck]] metadata-commit discipline.
    * Cost at 100 TB: one manifest write; zero data bytes. */
  def addColumns(spark: SparkSession, dir: String,
      cols: Seq[StructField]): Long = {
    require(cols.nonEmpty, "addColumns needs at least one column")
    // one path for every schema-changing statement: alterCommit owns
    // the guards (fresh names, nullability, burned physical names)
    alterCommit(spark, dir, cols, Seq.empty, Seq.empty)
  }

  /** One `ALTER TABLE` statement as ONE atomic metadata commit: added
    * columns widen the schema (the [[addColumns]] rules), added CHECKs
    * validate the existing data under the WIDENED schema (a check
    * referencing a column added by the same statement sees exactly what
    * future reads will return there — the frozen DEFAULT when one is
    * declared, else typed NULLs under SQL three-valued logic), dropped
    * CHECKs leave. All-or-nothing: any
    * refused piece fails the whole statement before a single header is
    * staged, and the statement lands as exactly ONE version — never a
    * one-commit-per-change split whose partial failure leaves earlier
    * changes applied ([[graft.sources.GraftCatalog]] routes every
    * `alterTable` here). Zero data written, base-checked like every
    * metadata commit.
    *
    * DEFAULT values: an added column may carry a `CURRENT_DEFAULT`
    * metadata entry (the `ALTER TABLE ADD COLUMN ... DEFAULT <expr>`
    * SQL text). The statement VALIDATES it (constant-foldable, castable
    * to the column type — refused loudly otherwise) and freezes the
    * folded literal as the column's `EXISTS_DEFAULT`: pre-existing rows
    * read THAT value (every scan path fills file-missing columns from
    * it), while future inserts that omit the column evaluate
    * `CURRENT_DEFAULT`. `setDefaults` re-points `CURRENT_DEFAULT` only
    * (`ALTER COLUMN ... SET/DROP DEFAULT` — `None` drops): existing
    * rows keep reading the EXISTS_DEFAULT frozen when the column was
    * added, the standard Delta/Spark split. */
  def alterCommit(spark: SparkSession, dir: String,
      addCols: Seq[StructField],
      addChecks: Seq[(String, String)],
      dropChecks: Seq[String],
      renameCols: Seq[(String, String)] = Seq.empty,
      dropCols: Seq[String] = Seq.empty,
      setDefaults: Seq[(String, Option[String])] = Seq.empty): Long = {
    require(addCols.nonEmpty || addChecks.nonEmpty || dropChecks.nonEmpty ||
      renameCols.nonEmpty || dropCols.nonEmpty || setDefaults.nonEmpty,
      "alterCommit needs at least one change")
    require(setDefaults.map(_._1).distinct.length == setDefaults.length,
      s"duplicate SET DEFAULT columns in ${setDefaults.map(_._1).mkString(",")}")
    addChecks.foreach { case (name, sqlExpr) =>
      require(name.nonEmpty && !name.contains('=') && !name.contains('\n'),
        s"check name '$name' must be non-empty without '=' or newline")
      require(!sqlExpr.contains('\n'),
        "check expression must be a single line")
    }
    require(addChecks.map(_._1).distinct.length == addChecks.length,
      s"duplicate check names in ${addChecks.map(_._1).mkString(",")}")
    require(addCols.map(_.name).distinct.length == addCols.length,
      s"duplicate column names in ${addCols.map(_.name).mkString(",")}")
    (renameCols.flatMap(r => Seq(r._1, r._2)) ++ dropCols).foreach { n =>
      require(n.nonEmpty && !n.contains(':') && !n.contains('\t') &&
        !n.contains('\n') && !n.contains('%'),
        s"column name '$n' cannot carry ':', tab, newline or '%' " +
          "through a RENAME/DROP (the #colmap header encoding)")
    }
    // the recorded change feed owns the marker names — with the feed
    // ON, creating such a column via ADD/RENAME refuses HERE (the
    // creation path), so later recording verbs never meet the clash
    val reservedNew = (addCols.map(_.name) ++ renameCols.map(_._2))
      .filter(CdfReservedNames.contains)
    if (reservedNew.nonEmpty)
      versions(spark, dir).lastOption.foreach { latest =>
        require(!cdfEnabled(spark, dir, latest, requireNamesFree = false),
          s"$dir: the recorded change feed reserves column name(s) " +
            s"${reservedNew.mkString(", ")} — pick another name or keep " +
            s"$ChangeFeedProperty off")
      }
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val schema = schemaOf(spark, dir, latest).getOrElse(
        read(spark, dir, Some(latest)).schema)
      val existing = checksOf(spark, dir, latest)
      dropChecks.foreach { n =>
        require(existing.exists(_._1 == n),
          s"no check named '$n' on $dir " +
            s"(have ${existing.map(_._1).mkString(",")})")
      }
      val kept = existing.filterNot(c => dropChecks.contains(c._1))

      // ---- RENAME / DROP COLUMN: metadata-only, against the column
      // mapping (statement order: renames, then drops, then adds) ----
      val pcsA = partitionColsOf(spark, dir, latest)
      // columns the SURVIVING checks reference (dropped-in-this-
      // statement checks release their columns); unparseable check SQL
      // refuses conservatively
      // lower-cased: Spark resolves CHECK SQL case-insensitively by
      // default, so 'Price > 0' pins column 'price' — a case-sensitive
      // guard would let the rename through and wedge every later write
      lazy val keptRefs: Set[String] = kept.flatMap { case (_, sql) =>
        spark.sessionState.sqlParser.parseExpression(sql).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.head.toLowerCase(java.util.Locale.ROOT)
        }
      }.toSet
      var schema2 = schema
      var cm2 = colmapOf(spark, dir, latest)
      var burned2 = droppedOf(spark, dir, latest)
      renameCols.foreach { case (from, to) =>
        require(schema2.fieldNames.contains(from),
          s"no column '$from' on $dir")
        require(!schema2.fieldNames.contains(to),
          s"column '$to' already exists on $dir")
        require(!pcsA.contains(from),
          s"'$from' is a partition column of $dir — partition columns " +
            "cannot be renamed (hive dir names and manifest tuples are " +
            "literal)")
        require(!keptRefs.contains(from.toLowerCase(java.util.Locale.ROOT)),
          s"column '$from' is referenced by a CHECK constraint on $dir " +
            "— drop the constraint first (its SQL stores the name)")
        val phys = cm2.getOrElse(from, from)
        // '$to' may be a burned/owned physical name ONLY when it is
        // this very column's own (renaming back — a plain identity)
        require(to == phys ||
          (!cm2.removed(from).values.toSet.contains(to) &&
            !burned2.contains(to)),
          s"'$to' is a physical storage name old files of $dir still " +
            "carry — pick a different name")
        cm2 = if (to == phys) cm2 - from
          else (cm2 - from) + (to -> phys)
        schema2 = StructType(schema2.fields.map(f =>
          if (f.name == from) f.copy(name = to) else f))
      }
      dropCols.foreach { n =>
        require(schema2.fieldNames.contains(n), s"no column '$n' on $dir")
        require(!pcsA.contains(n),
          s"'$n' is a partition column of $dir — partition columns " +
            "cannot be dropped")
        require(!keptRefs.contains(n.toLowerCase(java.util.Locale.ROOT)),
          s"column '$n' is referenced by a CHECK constraint on $dir — " +
            "drop the constraint first")
        require(schema2.fields.length > 1,
          s"cannot drop the last column of $dir")
        burned2 = burned2 + cm2.getOrElse(n, n) // the physical name burns
        cm2 = cm2 - n
        schema2 = StructType(schema2.fields.filterNot(_.name == n))
      }
      addCols.foreach { f =>
        require(!schema2.fieldNames.contains(f.name),
          s"column '${f.name}' already exists on $dir")
        require(!cm2.values.toSet.contains(f.name) &&
          !burned2.contains(f.name),
          s"column name '${f.name}' is reserved by an earlier " +
            s"RENAME/DROP COLUMN on $dir (old files still carry it " +
            "physically); pick a different name")
        require(f.nullable,
          s"added column '${f.name}' must be nullable — existing rows " +
            "read it as its DEFAULT (NULL when none is declared)")
      }
      // DEFAULT <expr> on an added column: validate (constant-foldable,
      // castable — Spark's own analyzer check, loud on failure) and
      // freeze the FOLDED literal as EXISTS_DEFAULT — the value every
      // pre-existing row reads, immune to later SET DEFAULT re-points.
      // Folded over the ADDED fields only: re-folding existing columns
      // would overwrite their frozen EXISTS_DEFAULT with today's
      // CURRENT_DEFAULT and silently rewrite history.
      import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      val addCols2 =
        if (addCols.exists(_.metadata.contains(
          ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY)))
          ResolveDefaultColumns.constantFoldCurrentDefaultsToExistDefaults(
            StructType(addCols), "ALTER TABLE ADD COLUMNS").fields.toSeq
        else addCols
      var widened =
        if (addCols2.isEmpty) schema2
        else StructType(schema2.fields ++ addCols2)
      // SET/DROP DEFAULT: re-point CURRENT_DEFAULT (future inserts)
      // only; EXISTS_DEFAULT — what old rows read — stays frozen
      setDefaults.foreach { case (n, sqlOpt) =>
        require(widened.fieldNames.contains(n), s"no column '$n' on $dir")
        widened = StructType(widened.fields.map { f =>
          if (f.name != n) f
          else sqlOpt match {
            case None => f.copy(metadata =
              new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f.metadata)
                .remove(ResolveDefaultColumns
                  .CURRENT_DEFAULT_COLUMN_METADATA_KEY).build())
            case Some(sqlTxt) =>
              require(!sqlTxt.contains('\n'),
                "DEFAULT expression must be a single line")
              val f2 = f.copy(metadata =
                new org.apache.spark.sql.types.MetadataBuilder()
                  .withMetadata(f.metadata)
                  .putString(ResolveDefaultColumns
                    .CURRENT_DEFAULT_COLUMN_METADATA_KEY, sqlTxt).build())
              // loud validation: foldable + type-castable, or refused
              ResolveDefaultColumns.analyze(f2,
                "ALTER TABLE ALTER COLUMN SET DEFAULT")
              f2
          }
        })
      }
      addChecks.foreach { case (n, _) =>
        require(!kept.exists(_._1 == n),
          s"check '$n' already exists on $dir")
      }
      // a declared-empty table (CREATE TABLE before any INSERT) has no
      // rows to validate — the check starts enforced on the first write.
      // Validation sees the POST-statement view: renames applied (so a
      // check on a just-renamed column reads its real data, never a
      // NULL backfill), added columns as typed NULLs.
      if (addChecks.nonEmpty && filesOf(spark, dir, latest).nonEmpty) {
        val renameTo = renameCols.toMap
        val renamed = read(spark, dir, Some(latest)).select(
          schema.fields.toSeq.map(f =>
            col(s"`${f.name}`").as(renameTo.getOrElse(f.name, f.name))): _*)
        // READ-semantics fill: a CHECK declared alongside an
        // ADD COLUMN ... DEFAULT must validate against the frozen
        // default the scans will actually return, never a NULL the
        // three-valued logic would wave through
        requireChecksPass(addChecks,
          alignToRead(renamed.drop(dropCols: _*), widened),
          s"existing data of $dir")
      }
      val carried = manifestLines(spark, dir, latest).filter(l =>
        l.startsWith("#filestat=") || l.startsWith("#dv=") ||
          l.startsWith("#partition=") || l.startsWith("#filepart="))
      commitFiles(spark, dir, filesOf(spark, dir, latest),
        java.util.UUID.randomUUID().toString,
        header = Seq(schemaHeader(widened)) ++ carried ++
          colmapHeaders(cm2, burned2) ++
          checkHeaders(kept ++ addChecks) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => () // raced — revalidate against the new latest
      }
    }
    -1L // unreachable
  }

  /** `ALTER TABLE ... RENAME COLUMN from TO to` as ONE metadata-only
    * commit: the logical name changes in the `#schema=` header, the
    * PHYSICAL name stays (recorded in `#colmap=`), so zero data moves —
    * old versions time-travel under their own names, stats/DV/layout
    * carry verbatim. Refused for partition columns (hive dir names are
    * literal), CHECK-referenced columns (the constraint SQL stores the
    * name), and targets colliding with any live logical or reserved
    * physical name. */
  def renameColumn(spark: SparkSession, dir: String, from: String,
      to: String): Long =
    alterCommit(spark, dir, Seq.empty, Seq.empty, Seq.empty,
      renameCols = Seq(from -> to))

  /** `ALTER TABLE ... DROP COLUMN` as ONE metadata-only commit: the
    * column leaves the `#schema=` header; its bytes stay in old files
    * (invisible — reads project by schema), so its PHYSICAL name is
    * BURNED into `#dropped=` forever and can never be re-used (loud
    * refusal where Delta would mint a fresh mapping id). Old versions
    * still show the column via time travel. Refused for partition and
    * CHECK-referenced columns, and for the last column. */
  def dropColumn(spark: SparkSession, dir: String, name: String): Long =
    alterCommit(spark, dir, Seq.empty, Seq.empty, Seq.empty,
      dropCols = Seq(name))

  /** `ALTER TABLE ... ALTER COLUMN <col> SET DEFAULT <sql>` /
    * `DROP DEFAULT` (`None`) as ONE metadata-only commit. Re-points
    * what FUTURE inserts fill when they omit the column; rows already
    * on disk keep reading the `EXISTS_DEFAULT` frozen when the column
    * was added (or NULL for columns that never had one) — the standard
    * Delta/Spark current-vs-exists split. The expression must be
    * constant-foldable and castable to the column type (refused
    * loudly otherwise). */
  def setColumnDefault(spark: SparkSession, dir: String, name: String,
      defaultSql: Option[String]): Long =
    alterCommit(spark, dir, Seq.empty, Seq.empty, Seq.empty,
      setDefaults = Seq(name -> defaultSql))

  def addCheck(spark: SparkSession, dir: String, name: String,
      sqlExpr: String): Long = {
    require(name.nonEmpty && !name.contains('=') && !name.contains('\n'),
      s"check name '$name' must be non-empty without '=' or newline")
    require(!sqlExpr.contains('\n'),
      "check expression must be a single line")
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val existing = checksOf(spark, dir, latest)
      require(!existing.exists(_._1 == name),
        s"check '$name' already exists on $dir")
      requireChecksPass(Seq((name, sqlExpr)),
        read(spark, dir, Some(latest)), s"existing data of $dir")
      val carried = manifestLines(spark, dir, latest).filter(l =>
        l.startsWith("#schema=") || l.startsWith("#filestat=") ||
          l.startsWith("#dv=") || l.startsWith("#partition=") ||
          l.startsWith("#filepart="))
      commitFiles(spark, dir, filesOf(spark, dir, latest),
        java.util.UUID.randomUUID().toString,
        header = carried ++ checkHeaders(existing :+ (name -> sqlExpr)) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => () // raced — revalidate against the new latest
      }
    }
    -1L // unreachable
  }

  /** DROP CONSTRAINT as a commit — the inverse of [[addCheck]]; loud on
    * an unknown name (dropping a constraint you don't have is a bug). */
  def dropCheck(spark: SparkSession, dir: String, name: String): Long = {
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      val existing = checksOf(spark, dir, latest)
      require(existing.exists(_._1 == name),
        s"no check named '$name' on $dir " +
          s"(have ${existing.map(_._1).mkString(",")})")
      val carried = manifestLines(spark, dir, latest).filter(l =>
        l.startsWith("#schema=") || l.startsWith("#filestat=") ||
          l.startsWith("#dv=") || l.startsWith("#partition=") ||
          l.startsWith("#filepart="))
      commitFiles(spark, dir, filesOf(spark, dir, latest),
        java.util.UUID.randomUUID().toString,
        header = carried ++
          checkHeaders(existing.filterNot(_._1 == name)) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => ()
      }
    }
    -1L // unreachable
  }

  // -------------------------------------------------------------------
  // SHALLOW CLONE — zero-copy table branching
  // -------------------------------------------------------------------

  /** Branch version `version` (default: latest) of the table at
    * `srcDir` into the fresh table directory `dstDir` — the Delta
    * `CREATE TABLE ... SHALLOW CLONE` verb. The clone's v1 manifest
    * names the source's data files BY REFERENCE (manifests store
    * absolute paths), so branching a 100 TB table costs ONE manifest
    * write and zero data movement — the dev/test/staging workflow
    * (experiment on prod data, throw the branch away) at metadata cost.
    *
    * Independence going forward: every mutating verb on the clone
    * ([[commitBatch]], [[deleteWhere]], [[merge]], [[optimize]]) writes
    * its new/rewritten files under the CLONE's own `data/` root and
    * carries the rest by reference, so the source never observes the
    * branch. The clone's [[vacuum]] only sweeps the clone's own data
    * root — borrowed source files are structurally out of its reach.
    *
    * Self-containment details: a `#dv=` deletion-vector sidecar resolves
    * against a table's OWN `_log/dv/`, so the (O(deleted rows)-sized)
    * sidecar is COPIED — the one thing a clone must not borrow. The
    * `#batch=` header rides along so a streaming sink resuming against
    * the branch under the same checkpoint keeps replay idempotence
    * instead of double-applying already-ingested batches. Schema and
    * zone-map stats carry verbatim ([[restore]]'s header rule).
    *
    * THE documented hazard (same as Delta's): the SOURCE's vacuum does
    * not know about clones — if the source drops and vacuums the cloned
    * version's files, the clone's reads fail loudly ([[read]]'s
    * existence check names the vacuumed file). A branch that must
    * outlive the source's retention runs [[materialize]]. */
  def shallowClone(spark: SparkSession, srcDir: String, dstDir: String,
      version: Option[Long] = None): Long = {
    val vs = versions(spark, srcDir)
    require(vs.nonEmpty, s"no committed snapshot under $srcDir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"cannot clone version $v of $srcDir; have ${vs.mkString(",")}")
    require(versions(spark, dstDir).isEmpty,
      s"clone target $dstDir already holds a snapshot log")
    dvOf(spark, srcDir, v).foreach { name =>
      val sf = fs(spark, srcDir)
      val df = fs(spark, dstDir)
      df.mkdirs(new Path(logDir(dstDir), "dv"))
      org.apache.hadoop.fs.FileUtil.copy(sf, dvPath(srcDir, name),
        df, dvPath(dstDir, name), false,
        spark.sparkContext.hadoopConfiguration)
    }
    val header = manifestLines(spark, srcDir, v).filter(l =>
      l.startsWith("#schema=") || l.startsWith("#filestat=") ||
        l.startsWith("#dv=") || l.startsWith("#batch=") ||
        l.startsWith("#check=") ||
        l.startsWith("#colmap=") || l.startsWith("#dropped=") ||
        l.startsWith("#tblprop=") || // properties ARE table state
        l.startsWith("#partition=") || l.startsWith("#filepart="))
    commitFiles(spark, dstDir, filesOf(spark, srcDir, v),
      java.util.UUID.randomUUID().toString,
      header = header ++ watermarkHeader(spark, srcDir)).get
  }

  /** Break a clone's dependence on its source: rewrite every BORROWED
    * data file (one living outside this table's own `data/` root) into
    * fresh local files, carrying the table's own files by reference —
    * cost ∝ borrowed bytes, not table size, so a branch that already
    * rewrote most of its files through churn pays only for the
    * remainder. After materialize the source can vacuum freely. A table
    * with nothing borrowed returns its current version untouched
    * (idempotent). Refuses on a DV-bearing version ([[deleteWhereMoR]]
    * composition contract — rewriting files would shift the row
    * positions the vector names): run [[applyDeletionVectors]] first.
    * Base-checked and rebased on a lost race like every
    * read-modify-write commit. */
  def materialize(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val ownRoot = f.makeQualified(new Path(dir, "data")).toString + "/"
    while (true) {
      val vs = versions(spark, dir)
      require(vs.nonEmpty, s"no committed snapshot under $dir")
      val latest = vs.last
      requireNoDv(spark, dir, latest, "materialize")
      val files = filesOf(spark, dir, latest)
      val (own, borrowed) = files.partition(p =>
        f.makeQualified(new Path(p)).toString.startsWith(ownRoot))
      if (borrowed.isEmpty) return latest
      val schema = schemaOf(spark, dir, latest)
      val base = readFiles(spark, dir, latest, borrowed)
      val commitId = java.util.UUID.randomUUID().toString
      val fresh = writeData(spark, dir, base, commitId,
        partitionColsOf(spark, dir, latest))
      // copying borrowed files changes ZERO logical rows — declare the
      // empty recorded change set so CDF feeds ride across it (the
      // optimize/applyDeletionVectors rule)
      val cdfMark =
        if (cdfEnabled(spark, dir, latest,
            requireNamesFree = false)) cdfHeaders(Seq.empty)
        else Seq.empty
      commitFiles(spark, dir, (own ++ fresh).sorted, commitId,
        header = schema.map(schemaHeader).toSeq ++ cdfMark ++
          propagatedStatHeaders(spark, dir, latest, own, fresh) ++
          propagatedPartHeaders(spark, dir, latest, own, fresh) ++
          checkHeaders(checksOf(spark, dir, latest)) ++
          watermarkHeader(spark, dir),
        base = Some(Some(latest))) match {
        case Some(v) => return v
        case None    => () // raced — recompute against the new latest
      }
    }
    -1L // unreachable
  }
}
