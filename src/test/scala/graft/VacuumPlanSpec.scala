package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** DRY-RUN vacuum ([[SnapshotLog.vacuumPlan]]): the plan must be
  * READ-ONLY, and its path set must equal EXACTLY what a vacuum with
  * the same knobs then deletes — the lockstep law that keeps the
  * mirrored decision logic from drifting. */
class VacuumPlanSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("vacplan").toString + "/tbl"

  private def allFiles(dir: String): Set[String] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    if (!root.exists()) Set.empty
    // the local checksum FS shadows every file with a .<name>.crc —
    // bookkeeping deleted alongside its file, not a vacuum decision
    else walk(root).map(_.getAbsolutePath)
      .filterNot(p => new java.io.File(p).getName.startsWith(".") &&
        p.endsWith(".crc"))
      .toSet
  }

  test("plan is read-only and == exactly what vacuum then deletes " +
      "(manifests, data files, recorded change files)") {
    val dir = freshDir()
    // history with churn: replace, append, delete — with the feed on so
    // change files exist and become reclaimable too
    SnapshotLog.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    SnapshotLog.merge(spark, dir, Seq((3L, "c")).toDF("k", "v"),
      keys = Seq("k"))
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L)
    SnapshotLog.commit(spark, dir, Seq((9L, "z")).toDF("k", "v"))
    val vsBefore = SnapshotLog.versions(spark, dir)
    val before = allFiles(dir)
    val plan = SnapshotLog.vacuumPlan(spark, dir, keepLast = 1,
      orphanGraceMs = 0L)
      .as[(String, String, Long)].collect()
    // read-only: nothing moved, versions unchanged
    assert(allFiles(dir) === before, "vacuumPlan deleted something")
    assert(SnapshotLog.versions(spark, dir) === vsBefore)
    assert(plan.nonEmpty && plan.forall(_._3 >= 0))
    assert(plan.map(_._1).toSet.subsetOf(Set("version_manifest",
      "bloom_sidecar", "dv_sidecar", "data_file", "change_file")))
    // the lockstep law: vacuum with the SAME knobs deletes exactly the
    // planned paths (normalize scheme-qualified plan paths to local)
    def local(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val planned = plan.map(p => local(p._2)).toSet
    SnapshotLog.vacuum(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    val after = allFiles(dir)
    val removed = before -- after
    assert(removed === planned,
      s"plan != vacuum: planned-but-kept=${planned -- removed} " +
        s"removed-but-unplanned=${removed -- planned}")
    // the survivor still reads
    assert(SnapshotLog.read(spark, dir).count() === 1)
    // the TVF speaks the same plan (now empty: retention already ran)
    assert(spark.sql(
      s"SELECT * FROM snapshot_vacuum_plan('$dir', 1, 0)").count() === 0)
  }

  test("minAgeMs protects young versions in the plan exactly as in " +
      "vacuum") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.commit(spark, dir, Seq((2L, "b")).toDF("k", "v"))
    // everything is younger than an hour: nothing to drop despite
    // keepLast=1
    val plan = SnapshotLog.vacuumPlan(spark, dir, keepLast = 1,
      orphanGraceMs = 0L, minAgeMs = 3600000L)
    assert(plan.filter(col("kind") === "version_manifest").count() === 0,
      "minAgeMs must shield young manifests in the plan")
    val (dropped, _) = SnapshotLog.vacuum(spark, dir, keepLast = 1,
      orphanGraceMs = 0L, minAgeMs = 3600000L)
    assert(dropped === 0, "vacuum disagrees with its plan under minAgeMs")
  }
}
