package graft.dedup

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The shared mechanics of generation-folding compaction for persisted
  * batch-partitioned stores ([[FingerprintStore]], the
  * [[graft.streaming.SemDedupStream]] accepted-vector store): a
  * whole-store swap staged in a SIBLING directory, a
  * `_compaction_watermark` guard file that rides the swap atomically,
  * and the crashed-swap self-heal every entry point runs. The POLICY —
  * what folds, what stays verbatim, what a replayed or as-of read below
  * the watermark means — stays with each store; this object only owns
  * the filesystem choreography both must get identically right.
  */
private[graft] object StoreCompaction {

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The swap-staging SIBLING of the store dir. Built from the
    * normalized Path, never by string concatenation: a trailing slash
    * in `dir` would otherwise nest the tmp INSIDE the store, and the
    * swap's delete(dir) would destroy the freshly written fold before
    * its rename. */
  def swapTmpPath(dir: String): Path = {
    val p = new Path(dir)
    new Path(p.getParent, p.getName + "__compact_tmp")
  }

  /** Complete a crashed swap: between delete(dir) and rename(tmp → dir)
    * the store is ABSENT while the tmp dir is already COMPLETE (parquet
    * + watermark written before the delete). Without this, a read
    * against the half-swapped store would see an empty standing set and
    * silently accept everything — so every entry point adopts the
    * finished tmp first. Idempotent and race-benign: only a crashed
    * swap leaves this exact (no dir, tmp present) shape. */
  def healSwap(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val tmp = swapTmpPath(dir)
    if (!f.exists(new Path(dir)) && f.exists(tmp)) {
      require(f.rename(tmp, new Path(dir)),
        s"adopting crashed compaction swap failed for $dir — " +
          s"manually rename $tmp to $dir")
      ()
    }
  }

  private def watermarkPath(dir: String) =
    new Path(dir, "_compaction_watermark")

  /** The highest batch id compaction has folded into generation −1 —
    * None for a never-compacted store. Heals a crashed swap first. */
  def watermark(spark: SparkSession, dir: String): Option[Long] = {
    healSwap(spark, dir)
    val f = fs(spark, dir)
    val p = watermarkPath(dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Stamp the watermark INSIDE a not-yet-swapped staging dir, so the
    * rename publishes fold and replay guard in one atomic visibility
    * transition (underscore-prefixed — parquet readers ignore it). */
  def writeWatermarkInto(f: FileSystem, stagingDir: Path, w: Long): Unit = {
    val out = f.create(new Path(stagingDir, "_compaction_watermark"), true)
    try out.write(w.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Swap a fully written staging dir into place: delete(dir) +
    * rename(tmp → dir), tolerating a concurrent reader's [[healSwap]]
    * adopting the finished tmp inside the delete→rename window (same
    * end state, not a failure — anything else IS one). */
  def swapInto(spark: SparkSession, dir: String, tmp: Path): Unit = {
    val f = fs(spark, dir)
    f.delete(new Path(dir), true)
    if (!f.rename(tmp, new Path(dir))) {
      require(f.exists(new Path(dir)) && !f.exists(tmp),
        s"compaction swap rename failed for $dir — the fold is intact " +
          s"at $tmp; re-run compact (it adopts the finished tmp)")
    }
    ()
  }

  /** data files under `root`, recursively (the part-* convention). */
  def countFiles(f: FileSystem, root: Path): Long = {
    var n = 0L
    val it = f.listFiles(root, true)
    while (it.hasNext) {
      if (it.next().getPath.getName.startsWith("part-")) n += 1
    }
    n
  }
}
