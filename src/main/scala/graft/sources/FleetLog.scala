package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table consistent snapshots over a fleet of snapshot-logged
  * tables — the reference's "hundreds of source tables per scheduled
  * run" deployment [upstream `README.md`, SURVEY §3.1] given the
  * guarantee single-table logs cannot: a reader joining CUSTOMER to
  * ORDERS sees both AS OF THE SAME run, even while the next run is
  * mid-flight or one table's merge failed.
  *
  * Layout under the fleet root:
  * {{{
  *   _runs/run<K>.manifest     one line per table: <name>\t<logDir>\t<version>
  * }}}
  *
  * A run manifest pins, for every configured table, the
  * [[SnapshotLog]] version its batch-K merge committed. The commit
  * point is the manifest rename (SnapshotLog's stage-then-rename
  * recipe), and [[commitRun]] refuses to manifest an INCOMPLETE run —
  * if any table has no version for batch K (its merge failed, timed
  * out, or was abandoned by the Pipeline.runAll timeout machinery),
  * nothing becomes visible and readers keep resolving run K−1. The
  * healed table's re-run plus a commitRun retry completes the run
  * later; replaying a committed run is a no-op (manifests are
  * immutable once named).
  *
  * At 100 TB / hundreds of tables this is the missing consistency
  * contract of a per-table lakehouse: per-table logs give atomic
  * TABLE states, but a scheduled fleet needs atomic RUN states —
  * cross-table joins over half-advanced fleets silently mix batch K
  * and K−1 rows (exactly the FK-skew a CDC deployment cannot detect
  * downstream). One small manifest per run buys the fix; no data is
  * copied or rewritten.
  */
object FleetLog {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def runsDir(fleetDir: String) = new Path(fleetDir, "_runs")

  private val R = """run(\d+)\.manifest""".r

  private def runPath(fleetDir: String, runId: Long) =
    new Path(runsDir(fleetDir), s"run$runId.manifest")

  /** Committed run ids, ascending (empty for a fresh fleet). */
  def runs(spark: SparkSession, fleetDir: String): Seq[Long] = {
    val f = fs(spark, fleetDir)
    val rd = runsDir(fleetDir)
    if (!f.exists(rd)) Seq.empty
    else f.listStatus(rd).toSeq.flatMap(s => s.getPath.getName match {
      case R(n) => Some(n.toLong)
      case _    => None
    }).sorted
  }

  /** Newest committed (complete) run, if any. */
  def latestRun(spark: SparkSession, fleetDir: String): Option[Long] =
    runs(spark, fleetDir).lastOption

  /** Pin batch `runId` across the fleet: resolve, for every table, the
    * snapshot-log version carrying `#batch=runId`, and commit the run
    * manifest atomically. Returns true when the run is (now) committed;
    * false when ANY table lacks a batch-`runId` version — the
    * incomplete-fleet case, in which NOTHING becomes visible (readers
    * keep resolving the previous run). Idempotent: a manifest that
    * already exists is left untouched (same content by construction —
    * versionOfBatch is a pure function of the immutable per-table
    * logs). */
  def commitRun(spark: SparkSession, fleetDir: String, runId: Long,
                tables: Map[String, String]): Boolean = {
    require(tables.nonEmpty, "a fleet run needs at least one table")
    val f = fs(spark, fleetDir)
    if (f.exists(runPath(fleetDir, runId))) return true // replay no-op
    val pinned = tables.toSeq.sortBy(_._1).map { case (name, logDir) =>
      SnapshotLog.versionOfBatch(spark, logDir, runId)
        .map(v => s"$name\t$logDir\t$v")
    }
    if (pinned.exists(_.isEmpty)) return false // incomplete — stay invisible
    f.mkdirs(runsDir(fleetDir))
    val stage = new Path(runsDir(fleetDir),
      s".run$runId.${java.util.UUID.randomUUID()}.staging")
    val out = f.create(stage, true)
    try out.write(pinned.flatten.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // two committers of the same run race benignly: content is identical
    // (a pure function of the immutable per-table logs), so losing the
    // rename to the winner still leaves the run committed — but a rename
    // that failed with NO manifest in place is a real fault, not a race
    if (!f.rename(stage, runPath(fleetDir, runId))) {
      f.delete(stage, false)
      require(f.exists(runPath(fleetDir, runId)),
        s"run manifest rename failed for run$runId under $fleetDir")
    }
    true
  }

  /** The (logDir, version) pins of a committed run. */
  def tablesOfRun(spark: SparkSession, fleetDir: String,
                  runId: Long): Map[String, (String, Long)] = {
    val f = fs(spark, fleetDir)
    val in = f.open(runPath(fleetDir, runId))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    lines.map { l =>
      val Array(name, logDir, v) = l.split("\t", 3)
      name -> ((logDir, v.toLong))
    }.toMap
  }

  /** Read every table of a run at its pinned version — the cross-table
    * consistent view. Each frame plans from its table's manifest (no
    * listing) and can never see a half-advanced fleet. */
  def readRun(spark: SparkSession, fleetDir: String,
              runId: Long): Map[String, DataFrame] =
    tablesOfRun(spark, fleetDir, runId).map { case (name, (logDir, v)) =>
      name -> SnapshotLog.read(spark, logDir, Some(v))
    }

  /** Fleet retention: drop run manifests beyond the newest `keepRuns`,
    * then vacuum each member log down to its oldest still-referenced
    * version (never fewer than the log's own latest). Run manifests go
    * FIRST — a run must become unreadable before the versions it pins
    * can go, the same delete order SnapshotLog.vacuum uses internally
    * for manifests vs data files. */
  def vacuumFleet(spark: SparkSession, fleetDir: String,
                  keepRuns: Int): Unit = {
    require(keepRuns >= 1, "keepRuns must be >= 1")
    val f = fs(spark, fleetDir)
    val all = runs(spark, fleetDir)
    val (drop, keep) = all.splitAt((all.size - keepRuns) max 0)
    drop.foreach(r => f.delete(runPath(fleetDir, r), false))
    // per-table floor over the RETAINED runs
    val floors = keep.flatMap(tablesOfRun(spark, fleetDir, _).values)
      .groupBy(_._1).map { case (logDir, pins) => logDir -> pins.map(_._2).min }
    floors.foreach { case (logDir, floor) =>
      val vs = SnapshotLog.versions(spark, logDir)
      val keepLast = vs.count(_ >= floor) max 1
      SnapshotLog.vacuum(spark, logDir, keepLast)
    }
  }
}
