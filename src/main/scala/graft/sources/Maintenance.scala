package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operations. The one every streaming sink needs:
  * micro-batches and per-partition writers accumulate small files, and
  * scan cost at 100 TB is dominated by file-open overhead once the
  * average file falls under a few MB (a 1000-executor cluster opening
  * 10 M 100 KB files spends its time in the namenode, not in Tungsten).
  *
  * `compact` rewrites a parquet directory into ⌈bytes / targetBytes⌉
  * evenly-sized files. Sizing comes from the filesystem listing (exact,
  * free), not from sampling rows. The rewrite stages into a sibling
  * `_compact_tmp` directory and swaps via rename, so a crash mid-compact
  * leaves the original table intact (the stale tmp dir is removed on the
  * next run) — same stage-then-swap recipe as CdcBucketed's state writes.
  */
object Maintenance {

  /** One listing yields paths AND sizes — getFileStatus per file would
    * re-ask the namenode for what listStatus already returned, at
    * listing scale (the stated 10 M-file motivating case). */
  private def listData(spark: SparkSession,
                       dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
  }

  /** Data files currently in `dir` (non-recursive, parquet parts only —
    * excludes _SUCCESS and hidden files). */
  def dataFiles(spark: SparkSession, dir: String): Seq[Path] =
    listData(spark, dir).map(_.getPath)

  /** Compact `dir` in place to ~targetBytes-sized files. Returns
    * (filesBefore, filesAfter). No-op (no rewrite at all) if the table
    * already has ≤ the target file count — compaction must be safe to
    * run on a schedule.
    *
    * Crash safety: entry first heals a crash that landed between the two
    * swap renames (table missing, `_compact_old_` present → restore the
    * original). Concurrent writers: if new files appear in `dir` between
    * the initial listing and the swap, the compaction ABORTS untouched —
    * swapping would silently destroy the late arrivals. (A streaming
    * sink that never pauses will keep winning that race; schedule
    * compaction in its idle windows or between micro-batches.) */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20): (Int, Int) =
    compactWith(spark, dir, targetBytes)(() => ())

  /** [[compact]] that also Z-order-clusters the rewrite on two columns
    * ([[graft.functions.ZOrderExprs]]): output files are range-partitioned
    * and sorted by the interleaved z-value, so each lands an axis-aligned
    * box in BOTH columns and parquet min/max footer stats prune point/range
    * predicates on EITHER one (a plain compact preserves arrival order —
    * pruning quality is whatever the writer left behind). Columns are
    * pmod-folded into the 2^bits grid: clustering is a layout heuristic,
    * so folding distant keys to one cell costs locality, never
    * correctness. Same stage-then-swap crash/concurrency story as
    * [[compact]], including its ≤-target-file-count no-op — an
    * already-compact but badly-clustered table re-clusters only if given
    * a smaller targetBytes. */
  def compactZOrdered(spark: SparkSession, dir: String,
                      xCol: String, yCol: String, bits: Int = 16,
                      targetBytes: Long = 128L << 20): (Int, Int) = {
    val lim = lit(1L << bits)
    val z = graft.functions.ZOrderExprs.zOrder2(
      pmod(col(xCol).cast("long"), lim), pmod(col(yCol).cast("long"), lim),
      bits)
    compactWith(spark, dir, targetBytes, Some(z))(() => ())
  }

  /** [[compact]] with a hook that fires between the stage-out rename and
    * the swap-in — the testing seam for the concurrent-writer-recreates-
    * the-directory race (un-stageable deterministically from outside). */
  private[graft] def compactWith(spark: SparkSession, dir: String,
                                 targetBytes: Long,
                                 clusterBy: Option[org.apache.spark.sql.Column]
                                   = None)
                                (afterStageOut: () => Unit): (Int, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new Path(p.getParent, s"_compact_old_${p.getName}")
    // heal a crash between the two renames: table gone, backup present
    if (!fs.exists(p) && fs.exists(bak) && !fs.rename(bak, p))
      sys.error(s"compact: cannot restore $bak to $p")
    val files = listData(spark, dir)
    val totalBytes = files.map(_.getLen).sum
    val want = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (files.size <= want) return (files.size, files.size)

    val tmp = new Path(p.getParent, s"_compact_tmp_${p.getName}")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale from a prior crash
    val snapshot = spark.read.parquet(dir)
    val rewrite = clusterBy match {
      case None => snapshot.repartition(want) // round-robin: even sizes
      case Some(z) =>
        // range-partition + in-partition sort by z: globally z-ordered
        // files (even by ROW count via sampling — clustering trades the
        // byte-perfect sizing of round-robin for prunable layout).
        // A real column named like the scratch key would be silently
        // REPLACED by withColumn and then dropped — data loss, so refuse.
        require(!snapshot.columns.contains("__graft_z"),
          s"compact: $dir already has a __graft_z column; " +
            "rename it before a clustered compaction")
        snapshot.withColumn("__graft_z", z)
          .repartitionByRange(want, col("__graft_z"))
          .sortWithinPartitions("__graft_z")
          .drop("__graft_z")
    }
    rewrite.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(p, bak)) sys.error(s"compact: cannot stage out $p")
    // concurrent-writer guard AFTER the stage-out: anything that landed
    // since the initial listing is now inside bak, so comparing bak's
    // contents to the snapshot catches writers that raced the listing —
    // on a mismatch the original (incl. late arrivals) is renamed back
    val staged = fs.listStatus(bak).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName).toSet
    if (staged != files.map(_.getPath.getName).toSet) {
      if (!fs.rename(bak, p)) sys.error(s"compact: cannot restore $bak")
      fs.delete(tmp, true)
      return (files.size, staged.size)
    }
    afterStageOut()
    // the staged-contents check above cannot see a writer that recreates
    // `dir` AFTER the stage-out rename (its files land in a fresh `dir`,
    // not in bak) — and Hadoop rename(tmp, p) with an existing destination
    // directory nests tmp INSIDE p and returns true, after which deleting
    // bak would discard the original rows. Guard: if `dir` reappeared,
    // merge the staged-out files back next to the late writer's (part-file
    // names are uuid-unique) and abort the compaction.
    val tmpData = fs.listStatus(tmp).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName).toSet
    if (fs.exists(p)) {
      fs.listStatus(bak).foreach { st =>
        val dest = new Path(p, st.getPath.getName)
        if (fs.exists(dest)) {
          // only marker/hidden files (_SUCCESS) can legitimately collide
          if (!st.getPath.getName.startsWith("_")
            && !st.getPath.getName.startsWith("."))
            sys.error(s"compact: restore collision on $dest; " +
              s"original data preserved at $bak")
        } else if (!fs.rename(st.getPath, dest))
          sys.error(s"compact: cannot restore ${st.getPath} into $p; " +
            s"original data preserved at $bak")
      }
      fs.delete(bak, true)
      fs.delete(tmp, true)
      return (files.size, dataFiles(spark, dir).size)
    }
    if (!fs.rename(tmp, p)) { // restore on failure — original is intact
      fs.rename(bak, p)
      sys.error(s"compact: cannot swap in $tmp")
    }
    // only drop the backup once the swap-in verifiably landed as a
    // whole-directory rename: `dir`'s data listing must equal tmp's
    val landed = listData(spark, dir).map(_.getPath.getName).toSet
    if (landed != tmpData)
      sys.error(s"compact: post-swap listing mismatch ($landed vs " +
        s"$tmpData); original data preserved at $bak")
    fs.delete(bak, true)
    (files.size, dataFiles(spark, dir).size)
  }

  /** Persist `df` as a parquet table bucketed AND sorted by `key` — the
    * co-location contract: two tables written this way with the SAME
    * bucket count equi-join on `key` with ZERO Exchange above either
    * scan (Spark's bucketing guarantees hash-compatible layouts, so the
    * join reads both sides in place). At 100 TB this turns the fact⋈fact
    * join — the one shuffle AQE cannot make disappear — into a local
    * merge per bucket pair; re-bucketing cost is paid ONCE at write time
    * and amortized over every subsequent join. Same generalized recipe
    * as [[graft.streaming.CdcBucketed]]'s state tables (which add the
    * stage/swap crash protocol); MaintenanceSpec asserts the
    * zero-Exchange plan and row parity with the plain join.
    *
    * Bucket count is capacity math, exactly as for CDC state: one bucket
    * ≈ one 100 MB–1 GB object at the target scale. Also drops any
    * orphaned files at the table location first — the in-memory catalog
    * forgets a crashed write, the filesystem does not. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new Path(spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Persist `df` hive-partitioned by `partCol` — directory-level layout
    * for LOW-cardinality routing columns (source, date, lang): a filter
    * on `partCol` prunes whole directories at PLANNING time
    * (PartitionFilters on the scan — zero I/O for pruned partitions,
    * before parquet footers are even opened). Cardinality discipline:
    * every partition value costs a directory and at least one file per
    * writing task — partition by the column queries FILTER on, bucket
    * ([[writeBucketed]]) or Z-order ([[compactZOrdered]]) by the columns
    * they JOIN or range-scan on. MaintenanceSpec proves the pruning via
    * the scan's numFiles metric, not just the plan string. */
  def writePartitioned(df: DataFrame, dir: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(dir)
}
