package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * [[vacuum]] reclaims the orphans.
  *
  * Why manifests and not directory listing at 100 TB: a snapshot read
  * plans from ONE small file instead of a recursive listing over
  * millions of objects; concurrent writers never make a reader see a
  * half-written table (no `_temporary` races, no partial-directory
  * reads); and retention is an explicit, crash-safe operation instead
  * of "hope nobody reads while we delete".
  */
object SnapshotLog {

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

  private def filesOf(spark: SparkSession, dir: String, v: Long): Seq[String] =
    manifestLines(spark, dir, v).filterNot(_.startsWith("#"))

  /** The stream batch id a version was committed under, if any
    * (`#batch=<id>` header line — see [[commitBatch]]). */
  def batchOf(spark: SparkSession, dir: String, v: Long): Option[Long] =
    manifestLines(spark, dir, v)
      .collectFirst { case l if l.startsWith("#batch=") =>
        l.stripPrefix("#batch=").toLong }

  /** Write `df` into a fresh immutable commit directory; returns the
    * new part-file paths (not yet visible — nothing references them
    * until a manifest names them). */
  private def writeData(spark: SparkSession, dir: String, df: DataFrame,
      commitId: String): Seq[String] = {
    val f = fs(spark, dir)
    val dataDir = new Path(dir, s"data/$commitId")
    df.write.parquet(dataDir.toString)
    f.listStatus(dataDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString).sorted
  }

  /** Atomic create-exclusive — the one primitive the claim needs.
    * Local paths go through NIO (POSIX O_CREAT|O_EXCL, genuinely
    * atomic; Hadoop's RawLocalFileSystem create(overwrite=false) is a
    * racy exists-then-create). Remote schemes use the filesystem's own
    * exclusive create, which HDFS enforces at the namenode. */
  private def atomicClaim(f: org.apache.hadoop.fs.FileSystem,
      p: Path): Boolean =
    if (f.getScheme == "file") {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(p.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { f.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    }

  /** Claim the next version for an explicit file list; returns the
    * version won. Protocol per attempt: (1) atomically create the
    * version's CLAIM file — exactly one committer can; (2) the winner
    * stages the manifest and renames it into place (uncontended — only
    * the claim holder writes that name), then drops its claim; (3) a
    * loser waits briefly for the winner's manifest to appear and
    * retries at the next version. A claim whose manifest never appears
    * (claimant crashed mid-commit) is adopted after 60 s of staleness —
    * the adopter deletes it and re-runs the atomic claim, which again
    * has exactly one winner. */
  private def commitFiles(spark: SparkSession, dir: String,
      files: Seq[String], commitId: String,
      header: Seq[String] = Seq.empty): Long = {
    val f = fs(spark, dir)
    f.mkdirs(logDir(dir))
    val body = (header ++ files).mkString("\n").getBytes("UTF-8")
    var attempt = 0
    while (attempt < 1000) {
      attempt += 1
      val v = versions(spark, dir).lastOption.getOrElse(0L) + 1
      val claim = new Path(logDir(dir), s".claim.v$v")
      if (atomicClaim(f, claim)) {
        // the claim can be WON STALE: the true owner manifested v and
        // dropped its claim before our (older) version listing caught
        // up, and we just re-created the claim file. The owner's
        // manifest rename strictly precedes its claim delete, so the
        // manifest is visible by now — check and step aside.
        if (f.exists(manifestPath(dir, v))) f.delete(claim, false)
        else {
          val stage = new Path(logDir(dir), s".v$v.$commitId.staging")
          val out = f.create(stage, true)
          try out.write(body) finally out.close()
          require(f.rename(stage, manifestPath(dir, v)),
            s"manifest rename failed for v$v under $dir")
          f.delete(claim, false) // manifest is live; claim no longer needed
          return v
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

  /** Commit `df` as the next version; returns the version number.
    * Data lands in a fresh uuid directory first; the manifest rename is
    * the only visible transition. */
  def commit(spark: SparkSession, dir: String, df: DataFrame): Long = {
    val commitId = java.util.UUID.randomUUID().toString
    commitFiles(spark, dir, writeData(spark, dir, df, commitId), commitId)
  }

  /** Streaming-table append commit: version N = EVERYTHING ingested
    * through stream batch `batchId` (the new batch's files plus the
    * previous version's list by reference), stamped with a `#batch=`
    * header. Idempotent under foreachBatch's at-least-once replay: a
    * batchId at or below the latest committed header returns the
    * existing version untouched (Spark replays only from the last
    * uncommitted batch, in order). Gives a streaming sink per-batch
    * snapshot isolation, time travel ("the table as of batch k"),
    * [[vacuum]] retention and [[deleteWhere]] — none of which a plain
    * parquet append sink has. */
  def commitBatch(spark: SparkSession, dir: String, df: DataFrame,
      batchId: Long): Long = {
    val vs = versions(spark, dir)
    val latest = vs.lastOption
    latest.flatMap(batchOf(spark, dir, _)).foreach { last =>
      if (batchId <= last) return latest.get // replayed batch: no-op
    }
    val commitId = java.util.UUID.randomUUID().toString
    val prev = latest.map(filesOf(spark, dir, _)).getOrElse(Seq.empty)
    val fresh = writeData(spark, dir, df, commitId)
    commitFiles(spark, dir, (prev ++ fresh).sorted, commitId,
      header = Seq(s"#batch=$batchId"))
  }

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

  /** Copy-on-write targeted delete: commit a new version with every row
    * matching `pred` removed, REWRITING ONLY the files that contain a
    * match — untouched files are carried into the new manifest by
    * reference (file paths shared across versions; [[vacuum]] already
    * reasons per-file, so sharing is retention-safe). Returns the new
    * version, or the current one unchanged when nothing matches.
    *
    * This is the right-to-be-forgotten shape at 100 TB: locating
    * affected files is one pushdown-filtered scan (parquet footer
    * min/max skips most files without reading rows — pair with
    * compactZOrdered clustering on the delete key to keep the affected
    * set small), and the rewrite cost is proportional to the files the
    * key actually lives in, not the table. Old versions still see the
    * deleted rows until vacuumed — retention policy, not a leak: run
    * `vacuum(keepLast=1)` for hard deletion. */
  def deleteWhere(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.input_file_name
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val current = filesOf(spark, dir, vs.last)
    val affected = spark.read.parquet(current: _*)
      .filter(pred).select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0)).toSet
    // input_file_name returns URIs; manifests may store schemeless paths
    def hit(p: String) = affected.contains(p) ||
      affected.contains(new Path(p).toUri.toString) ||
      affected.exists(a => new Path(a).toUri.getPath == new Path(p).toUri.getPath)
    val (rewrite, carry) = current.partition(hit)
    if (rewrite.isEmpty) return vs.last
    val commitId = java.util.UUID.randomUUID().toString
    val survivors = spark.read.parquet(rewrite: _*).filter(!pred)
    val newFiles =
      if (survivors.isEmpty) Seq.empty
      else writeData(spark, dir, survivors, commitId)
    commitFiles(spark, dir, (carry ++ newFiles).sorted, commitId)
  }

  /** Read a specific version (default: latest). Plans from the
    * manifest's exact file list — orphaned or in-flight data files are
    * invisible by construction. Fails loudly on a vacuumed/unknown
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
    spark.read.parquet(files: _*)
  }

  /** Drop all but the newest `keepLast` versions and delete every data
    * file no retained manifest references (covers crash orphans too).
    * Deletion order is crash-safe: manifests first (a version stops
    * being readable before its files vanish), then unreferenced data. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): (Int, Int) = {
    require(keepLast >= 1, "must retain at least one version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(vs.size - keepLast, 0))
    drop.foreach(v => f.delete(manifestPath(dir, v), false))
    val live = keep.flatMap(filesOf(spark, dir, _)).toSet
    val dataRoot = new Path(dir, "data")
    var removedFiles = 0
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { d =>
      val parts = f.listStatus(d.getPath).toSeq.filter(_.isFile)
      val (keepP, dropP) = parts.partition(s => live(s.getPath.toString))
      dropP.foreach { s => f.delete(s.getPath, false); removedFiles += 1 }
      if (keepP.isEmpty) f.delete(d.getPath, true) // whole commit dead
    }
    (drop.size, removedFiles)
  }
}
