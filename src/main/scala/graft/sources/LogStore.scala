package graft.sources

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** The commit-primitive seam of the snapshot log (the pluggable-LogStore
  * idea Delta uses for the same problem): every transition that makes a
  * version visible — and every small single-writer bookkeeping file —
  * funnels through these three operations, so the FORMAT's correctness
  * story is written once against this contract and a storage system
  * with different primitives (an object store with conditional PUT
  * instead of atomic rename) plugs in here instead of silently
  * weakening the protocol.
  *
  * Contract:
  *  - [[claimExclusive]]: atomic create-exclusive — of N racing callers
  *    exactly ONE returns true. Version ownership hangs off this.
  *  - [[publishAtomic]]: make `body` visible at `dest` all-or-nothing.
  *    This is the COMMIT POINT of a snapshot version: a reader may see
  *    the full manifest or no manifest, never a prefix, and a failure
  *    must leave `dest` absent (the stage file is the implementation's
  *    own business to clean up).
  *  - [[overwriteAtomic]]: replace a small single-writer file (a
  *    subscription cursor) such that a reader sees the OLD bytes or the
  *    NEW bytes, never a torn write — and a crash mid-call loses
  *    nothing but the in-flight update.
  *
  * Install a custom implementation with [[SnapshotLog.setLogStore]]
  * BEFORE the first commit against the store that needs it.
  */
trait LogStore {
  def claimExclusive(f: FileSystem, p: Path): Boolean
  def publishAtomic(f: FileSystem, stage: Path, dest: Path,
      body: Array[Byte]): Unit
  def overwriteAtomic(f: FileSystem, dest: Path, body: Array[Byte]): Unit
}

/** Default [[LogStore]]: Hadoop filesystem semantics — exclusive
  * create enforced by the filesystem (namenode on HDFS, O_EXCL via NIO
  * locally) and atomic `rename` as the publish primitive. That contract
  * HOLDS on HDFS-class filesystems and fails SILENTLY on S3-class
  * object stores (rename there is copy+delete: non-atomic, and
  * "exclusive" create is last-writer-wins), so this store refuses
  * loudly when pointed at a scheme known to lack atomic rename rather
  * than let two committers both "win" a version. */
object HadoopFsLogStore extends LogStore
    with org.apache.spark.internal.Logging {

  /** Schemes whose rename is copy+delete and whose create ignores the
    * overwrite flag — the documented-unsafe set. Everything else is
    * accepted (HDFS-semantics filesystems are the common case); an
    * UNKNOWN remote scheme gets one warning so an operator on an exotic
    * store knows which contract they are trusting. */
  private val NonAtomicRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "oss", "cos", "swift")
  private val KnownAtomicSchemes =
    Set("file", "hdfs", "viewfs", "webhdfs", "o3fs", "ofs", "abfs", "abfss")
  private val warnedSchemes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** `FileSystem.getScheme` throws on implementations that never
    * override it (RawLocalFileSystem) — fall back to the URI. */
  private def schemeOf(f: FileSystem): String =
    (try Option(f.getScheme)
     catch { case _: UnsupportedOperationException => None })
      .orElse(Option(f.getUri).flatMap(u => Option(u.getScheme)))
      .getOrElse("file").toLowerCase

  private def checkScheme(f: FileSystem): Unit = {
    val scheme = schemeOf(f)
    if (NonAtomicRenameSchemes.contains(scheme))
      throw new IllegalStateException(
        s"snapshot commits need atomic rename + exclusive create, and " +
          s"'$scheme' provides neither (object-store rename is " +
          "copy+delete; create ignores exclusivity) — two committers " +
          "could both win a version. Plug a conditional-PUT LogStore " +
          "for this store via SnapshotLog.setLogStore, or front the " +
          "log directory with an HDFS-semantics filesystem.")
    if (!KnownAtomicSchemes.contains(scheme) && warnedSchemes.add(scheme))
      logWarning(s"scheme '$scheme' is not in the known-atomic-rename " +
        "set; snapshot commit safety assumes its rename is atomic and " +
        "its create(overwrite=false) is exclusive — verify, or plug a " +
        "LogStore via SnapshotLog.setLogStore")
  }

  /** Local paths go through NIO (POSIX O_CREAT|O_EXCL, genuinely
    * atomic; Hadoop's RawLocalFileSystem create(overwrite=false) is a
    * racy exists-then-create). Remote schemes use the filesystem's own
    * exclusive create, which HDFS enforces at the namenode. */
  def claimExclusive(f: FileSystem, p: Path): Boolean = {
    checkScheme(f)
    if (schemeOf(f) == "file") {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(p.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { f.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  /** Stage-then-rename. A rename that returns false (quota, permission,
    * a store quietly degrading) must NOT look like a success or leave
    * the staging file to confuse a later listing — clean up and refuse
    * loudly; the caller's claim/retry protocol handles the rest. */
  def publishAtomic(f: FileSystem, stage: Path, dest: Path,
      body: Array[Byte]): Unit = {
    checkScheme(f)
    // EVERY failure path cleans the stage file — a disk-full write, a
    // rename exception, a rename that reports false: none may leave a
    // partially-written dot-file to confuse a later listing
    try {
      val out = f.create(stage, true)
      try out.write(body) finally out.close()
    } catch { case e: Throwable =>
      try f.delete(stage, false)
      catch { case scala.util.control.NonFatal(_) => () }
      throw e
    }
    val ok =
      try f.rename(stage, dest)
      catch { case e: Throwable => f.delete(stage, false); throw e }
    if (!ok) {
      f.delete(stage, false)
      throw new IllegalStateException(
        s"atomic publish failed: rename($stage -> $dest) returned " +
          "false — the version was NOT committed (no partial state is " +
          "visible); check filesystem permissions/health and retry")
    }
  }

  /** Temp-write then rename-with-OVERWRITE (atomic on POSIX and HDFS
    * via FileContext): a crash before the rename leaves the old file
    * intact, after it the new one — never an empty or torn cursor.
    *
    * The rename deliberately goes through FileContext resolved from
    * the FileSystem's URI rather than `f` itself: `FileSystem.rename`
    * has no overwrite mode (it fails when dest exists on most
    * implementations), and delete-then-rename would open exactly the
    * missing-cursor window this primitive exists to close —
    * `Options.Rename.OVERWRITE` is the one atomic-overwrite rename
    * Hadoop exposes. Consequence: a wrapping/instrumented FileSystem
    * instance sees the write but not the rename; scheme-level
    * semantics are identical for real filesystems. */
  def overwriteAtomic(f: FileSystem, dest: Path,
      body: Array[Byte]): Unit = {
    checkScheme(f)
    val tmp = new Path(dest.getParent,
      s".${dest.getName}.${java.util.UUID.randomUUID().toString}.tmp")
    try {
      val out = f.create(tmp, true)
      try out.write(body) finally out.close()
      val fc = FileContext.getFileContext(f.getUri, f.getConf)
      fc.rename(fc.makeQualified(tmp), fc.makeQualified(dest),
        Options.Rename.OVERWRITE)
    } catch {
      // write OR rename failure: remove the staged temp so a disk-full
      // loop never strands .<cursor>.<uuid>.tmp litter (mirrors
      // publishAtomic's write-failure cleanup)
      case e: Throwable =>
        try f.delete(tmp, false) catch { case _: Throwable => () }
        throw e
    }
  }
}
